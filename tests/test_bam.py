"""Built-in BGZF/BAM/CSI decoder against the reference GIAB fixtures."""
import pytest

from sniffles_tpu.io.bam import AlignmentFile


def test_header_parsing(hg002_bam):
    bam = AlignmentFile(hg002_bam, require_index=True)
    assert bam.references[0] == "chr1"
    assert bam.lengths[0] == 248956422
    assert len(bam.references) == 25


def test_index_statistics(hg008_bam):
    bam = AlignmentFile(hg008_bam, require_index=True)
    stats = {s.contig: s.mapped for s in bam.get_index_statistics() if s.mapped > 0}
    assert stats == {"chr1": 4, "chr18": 8, "chrX": 4}
    assert bam.mapped == 16


def test_fetch_records(hg008_bam):
    bam = AlignmentFile(hg008_bam, require_index=True)
    reads = list(bam.fetch("chr18", 0, bam.get_reference_length("chr18")))
    assert len(reads) == 8
    for r in reads:
        assert r.reference_name == "chr18"
        assert r.mapping_quality >= 0
        # derived geometry consistency
        ref_len = sum(ln for op, ln in r.cigartuples if op in (0, 2, 3, 7, 8))
        assert r.reference_length == ref_len
        assert r.reference_end == r.reference_start + ref_len
        qalen = sum(ln for op, ln in r.cigartuples if op in (0, 1, 7, 8))
        assert r.query_alignment_length == qalen


def test_fetch_region_windowing(hg008_bam):
    bam = AlignmentFile(hg008_bam, require_index=True)
    all_reads = list(bam.fetch("chr18", 0, bam.get_reference_length("chr18")))
    start = min(r.reference_start for r in all_reads)
    # window fully before the reads: nothing
    assert list(bam.fetch("chr18", 0, max(0, start - 1000))) == []
    # window containing the first read start
    sub = list(bam.fetch("chr18", start, start + 1))
    assert any(r.reference_start == start for r in sub)


def test_sequence_and_tags(hg002_bam):
    bam = AlignmentFile(hg002_bam, require_index=True)
    (read,) = list(bam.fetch("chr1", 0, bam.get_reference_length("chr1")))
    seq = read.query_sequence
    assert seq is not None and len(seq) == read.query_length
    assert set(seq) <= set("ACGTN")
    assert read.has_tag("SA") and read.has_tag("NM")
    sa = read.get_tag("SA")
    assert len(sa.split(";")) >= 2  # at least one supplementary + trailing empty


def test_cram_mode_rejects_bam(hg002_bam):
    # mode 'rc' dispatches to the CRAM decoder, which must reject BAM bytes
    with pytest.raises(ValueError):
        AlignmentFile(hg002_bam, mode="rc")
