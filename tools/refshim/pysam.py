"""pysam-compatible facade backed by sniffles_tpu's own I/O stack.

Purpose: run the REAL reference Sniffles2 (at /root/reference/src, which
needs pysam/htslib) inside this environment — where pysam is not
installed — by resolving `import pysam` to this module instead. Every
class/function here delegates to sniffles-tpu's from-scratch readers
(io/bam.py BGZF+BAI/CSI decoder, io/cram.py, io/fasta.py, io/tabix.py),
so a differential test can execute the reference pipeline end-to-end on
the same inputs and diff its VCF against ours byte-for-byte
(BASELINE.json acceptance: bit-identical VCF).

API surface covered = exactly what the reference uses (SURVEY.md §2.2):
  - AlignmentFile(path, mode, require_index=, reference_filename=)
    with .check_index/.mapped/.get_index_statistics/.get_reference_length/
    .fetch yielding AlignedSegment-compatible records
    (reference: sniffles:170-178,298-320, parallel.py:96-98, leadprov.py:488)
  - AlignedSegment attribute set used by leadprov.py/sv.py
  - FastaFile/faidx (reference: vcf.py:113-117, leadprov.py:420-443)
  - tabix_index (reference: sniffles:579)
  - CIGAR op constants CMATCH..CBACK (reference: leadprov.py:66-68,180)
  - VariantFile for bgzipped VCF input (reference: sniffles:196)

Use: prepend this directory to sys.path (before any site-packages)
in a process that also has /root/repo on the path.
"""
import os
import sys

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from sniffles_tpu.io import bam as _bam          # noqa: E402
from sniffles_tpu.io import fasta as _fasta      # noqa: E402
from sniffles_tpu.io import tabix as _tabix      # noqa: E402

# BAM CIGAR opcodes (SAMv1 spec §4.2; pysam exports them 0..9)
(CMATCH, CINS, CDEL, CREF_SKIP, CSOFT_CLIP,
 CHARD_CLIP, CPAD, CEQUAL, CDIFF, CBACK) = range(10)

AlignedSegment = _bam.BamRead


def _parse_region(region):
    """pysam region strings are 1-based inclusive ("chr1:100-200" means
    0-based [99, 200)); returns (contig, start0, end) with None spans
    for bare-contig or open-ended forms. Commas are thousands separators."""
    c, _, span = region.partition(":")
    if not span:
        return c, None, None
    s, _, e = span.replace(",", "").partition("-")
    return c, int(s) - 1, (int(e) if e else None)


def AlignmentFile(path, mode="rb", **kwargs):
    """Factory wrapper translating pysam's 1-based-inclusive region
    strings into the 0-based half-open coordinates the underlying
    reader uses."""
    handle = _bam.AlignmentFile(path, mode, **kwargs)
    inner_fetch = handle.fetch

    def fetch(contig=None, start=None, stop=None, end=None,
              until_eof=False, region=None):
        if region is not None:
            c, s, e = _parse_region(region)
            if s is None:
                return inner_fetch(c)
            return inner_fetch(c, s, e)
        return inner_fetch(contig, start, stop, end=end, until_eof=until_eof)

    handle.fetch = fetch
    return handle


class FastaFile(_fasta.FastaFile):
    def fetch(self, reference=None, start=None, end=None, region=None):
        if region is not None:
            reference, start, end = _parse_region(region)
        return super().fetch(reference, start, end)


def faidx(path: str) -> str:
    return _fasta.faidx(path)


def tabix_index(filename: str, preset: str = "vcf", force: bool = False,
                keep_original: bool = False) -> str:
    """pysam.tabix_index work-alike: bgzip-compress `filename` in place
    to `filename.gz` + write `.tbi`, return the compressed name."""
    out = filename + ".gz"
    if os.path.exists(out) and not force:
        raise IOError(f"{out} exists; use force=True")
    _tabix.tabix_compress_and_index(filename, out)
    if not keep_original:
        os.unlink(filename)
    return out


class VariantFile:
    """Minimal stand-in for pysam.VariantFile("x.vcf.gz", "rb") as used at
    reference sniffles:196: the handle is only ever line-iterated by
    vcf.VCF.read_svs_iter, so expose text-line iteration over BGZF."""

    def __init__(self, path: str, mode: str = "rb"):
        self.path = path
        self._text = _bam.BGZFReader.from_file(path).read_all_from(0).decode("utf-8")

    def __iter__(self):
        return iter(self._text.splitlines(keepends=True))

    def close(self):
        pass
