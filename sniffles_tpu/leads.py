"""
Lead (raw SV signature) extraction from BAM alignments.

Mirrors the reference extraction semantics (reference: leadprov.py):
CIGAR indels >= minsvlen_screen, long soft-clips as putative long INS,
clip-only single-break signatures, split-read signatures from SA tags,
and dedicated BND leads. Consumes records from the built-in BAM decoder
(io/bam.py) or the native C++ decoder.

The per-base coverage array and the binned leadtab produced here feed
both the exact host pipeline and (tensorized via signatures.py) the TPU
device pipeline.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional, Iterator

import numpy as np

from sniffles_tpu import util
from sniffles_tpu import svcall as sv
from sniffles_tpu.region import Region
from sniffles_tpu.svcall import SVCallBNDInfo
from sniffles_tpu.io.bam import (BamRead, CINS, CDEL, CSOFT_CLIP, CHARD_CLIP, CMATCH,
                                 CEQUAL, CDIFF, CREF_SKIP, CPAD)

log = logging.getLogger(__name__)


@dataclass(slots=True)
class Lead:
    """A raw SV signature from one read (reference: leadprov.py:34-141).

    Slots: leads are the most numerous objects in the pipeline (millions
    at WGS scale), so per-instance dicts dominate memory without them.
    `__setstate__` also accepts the reference's dict-form pickle state so
    Leads inside reference-written SNF blocks still load (compat.py maps
    sniffles.leadprov.Lead here)."""

    def __setstate__(self, state):
        from sniffles_tpu.compat import _apply_pickle_state
        _apply_pickle_state(self, state)
    read_id: int = None
    read_qname: str = None
    contig: str = None
    ref_start: int = None
    ref_end: int = None
    qry_start: int = None
    qry_end: int = None
    strand: str = None
    mapq: int = None
    nm: float = None
    source: str = None
    svtype: str = None
    svlen: Optional[int] = None
    seq: Optional[str] = None
    svtypes_starts_lens: list = None
    bnd_info: Optional[SVCallBNDInfo] = None
    hap: str = "0"
    phase_set: str = None
    is_sa: bool = False
    read_len: int = 0
    sa_same_strand: bool = False

    @classmethod
    def for_bnd(cls, read_id: int, read: BamRead) -> Optional['Lead']:
        """BND lead from the SA tag of a read (reference: leadprov.py:57-132).

        Unlike the reference code (which bails out with None when the SA
        strand equals the read strand, leadprov.py:83-84), this also
        extracts same-strand junctions — the reference's own truth tests
        (src/tests/test_bnd_leads.py, "red" cases and the HG002 case)
        require it. The caller (LeadProvider.iter_region) gates which of
        these reach the calling pipeline.
        """
        left = 0
        right = 0
        if read.cigartuples[0][0] in (CSOFT_CLIP, CHARD_CLIP):
            left = read.cigartuples[0][1]
        if read.cigartuples[-1][0] in (CSOFT_CLIP, CHARD_CLIP):
            right = read.cigartuples[-1][1]

        if left > right:
            ref_start = read.reference_start + 1
            is_first = False
        else:
            ref_start = read.reference_end
            is_first = True

        read_strand = "-" if read.is_reverse else "+"

        for sa in read.get_tag("SA").split(";"):
            if len(sa) > 0:
                refname, pos, strand, cigar, mapq, nm = sa.split(",")
                same_strand = (read_strand == strand)

                pos_org = pos
                pos = int(pos) - 1  # SA positions are 1-based
                try:
                    left, right, refspan, readspan = CIGAR_analyze(cigar)
                except Exception as e:
                    util.error(f"Malformed CIGAR '{cigar}' with pos {pos_org} of read "
                               f"'{read.query_name}' ({e}). Skipping.")
                    return None
                is_reverse = right > left
                if is_reverse:
                    mate_ref_start = pos + refspan
                else:
                    if is_first:
                        mate_ref_start = pos + 1
                    else:
                        if strand == read_strand:
                            mate_ref_start = pos + refspan
                        else:
                            mate_ref_start = pos + 2

                return cls(
                    read_id=read_id,
                    read_qname=read.query_name,
                    contig=read.reference_name,
                    ref_start=ref_start,
                    ref_end=ref_start,
                    qry_start=read.query_alignment_start,
                    qry_end=read.query_alignment_end,
                    strand="-" if read.is_reverse else "+",
                    mapq=read.mapping_quality,
                    nm=int(nm) if read.has_tag("NM") else None,
                    source="BND_SA",
                    svtype="BND",
                    svlen=0,
                    seq=None,
                    bnd_info=SVCallBNDInfo(
                        mate_contig=refname,
                        mate_ref_start=mate_ref_start,
                        is_first=is_first,
                        is_reverse=is_reverse,
                    ),
                    sa_same_strand=same_strand,
                )

        return None


def CIGAR_analyze(cigar: str) -> tuple[int, int, int, int]:
    """(clip_start, clip_end, refspan, readspan) from a CIGAR string
    (reference: leadprov.py:144-176)."""
    buf = ""
    readspan = 0
    refspan = 0
    clip_start = None
    clip = 0
    for c in cigar:
        if c.isnumeric():
            buf += c
        else:
            oplen = int(buf)
            h = False
            if c in "MIX=":
                readspan += oplen
                h = True
            if c in "MDX=N":
                refspan += oplen
                h = True
            if not h:
                if c in "SH":
                    if clip_start is None and readspan + refspan > 0:
                        clip_start = clip
                    clip += oplen
                else:
                    raise ValueError(f"Unknown CIGAR operation: '{c}'")
            buf = ""
    if clip_start is None:
        clip_start = clip
    return clip_start, clip - clip_start, refspan, readspan


# (add_read, add_ref, event, Δ coverage) per op (reference: leadprov.py:180-195)
OPLIST = [
    (1, 1, 0, 1),  # M
    (1, 0, 1, 0),  # I
    (0, 1, 1, 0),  # D
    (0, 1, 0, 0),  # N
    (1, 0, 1, 0),  # S
    (0, 0, 0, 0),  # H
    (0, 0, 0, 0),  # P
    (1, 1, 0, 1),  # =
    (1, 1, 0, 1),  # X
]


def get_cigar_indels(read: BamRead, minoplen: int = 10) -> tuple[int, int, int, int]:
    """Sum of ins/del bases, and of those above minoplen (reference: leadprov.py:198-224)."""
    ins_sum = 0
    del_sum = 0
    large_ins_sum = 0
    large_del_sum = 0
    for op, oplength in read.cigartuples:
        if op == CINS:
            ins_sum += oplength
            if oplength > minoplen:
                large_ins_sum += oplength
        elif op == CDEL:
            del_sum += oplength
            if oplength > minoplen:
                large_del_sum += oplength
    return ins_sum, del_sum, large_ins_sum, large_del_sum


def read_itersplits(read_id, read: BamRead, contig, config, read_nm, read_hap, read_ps) -> Iterator[Lead]:
    """Leads from a primary read's supplementary alignments (reference: leadprov.py:227-355)."""
    all_leads = []
    supps = [part.split(",") for part in read.get_tag("SA").split(";") if len(part) > 0]

    if len(supps) > config.max_splits_base + config.max_splits_kb * (read.query_length / 1000.0):
        return

    if read.is_reverse:
        qry_start = read.query_length - read.query_alignment_end
    else:
        qry_start = read.query_alignment_start

    curr_lead = Lead(read_id,
                     read.query_name,
                     contig,
                     read.reference_start,
                     read.reference_start + read.reference_length,
                     qry_start,
                     qry_start + read.query_alignment_length,
                     "-" if read.is_reverse else "+",
                     read.mapping_quality,
                     read_nm,
                     "SPLIT_PRIM",
                     "?",
                     hap=str(read_hap), phase_set=str(read_ps), is_sa=read.is_supplementary)
    all_leads.append(curr_lead)

    for refname, pos, strand, cigar, mapq, nm in supps:
        mapq = int(mapq)
        is_rev = (strand == "-")

        try:
            readstart_fwd, readstart_rev, refspan, readspan = CIGAR_analyze(cigar)
        except Exception as e:
            util.error(f"Malformed CIGAR '{cigar}' with pos {pos} of read "
                       f"'{read.query_name}' ({e}). Skipping.")
            return

        pos_zero = int(pos) - 1
        split_qry_start = readstart_rev if is_rev else readstart_fwd

        all_leads.append(Lead(read_id,
                              read.query_name,
                              refname,
                              pos_zero,
                              pos_zero + refspan,
                              split_qry_start,
                              split_qry_start + readspan,
                              strand,
                              mapq,
                              read_nm,
                              "SPLIT_SUP",
                              "?",
                              hap=str(read_hap), phase_set=str(read_ps), is_sa=read.is_supplementary))

    all_leads = sv.classify_splits(read, all_leads, config, contig)

    for lead_i, lead in enumerate(all_leads):
        for svtype, svstart, arg in lead.svtypes_starts_lens:
            min_mapq = min(lead.mapq, all_leads[max(0, lead_i - 1)].mapq)
            if not config.dev_keep_lowqual_splits and min_mapq < config.mapq:
                continue

            if svtype == "BND":
                bnd = Lead(read_id=lead.read_id,
                           read_qname=lead.read_qname,
                           contig=lead.contig,
                           ref_start=svstart,
                           ref_end=svstart,
                           qry_start=lead.qry_start,
                           qry_end=lead.qry_end,
                           strand=lead.strand,
                           mapq=lead.mapq,
                           nm=lead.nm,
                           source=lead.source,
                           svtype=svtype,
                           svlen=config.bnd_cluster_length,
                           seq=None,
                           hap=str(read_hap), phase_set=str(read_ps), is_sa=read.is_supplementary)
                bnd.bnd_info = arg
                yield bnd

            elif svtype != "NOSV":
                svlen = arg
                yield Lead(read_id=lead.read_id,
                           read_qname=lead.read_qname,
                           contig=lead.contig,
                           ref_start=svstart,
                           ref_end=svstart + svlen if svlen is not None and svtype != "INS" else svstart,
                           qry_start=lead.qry_start,
                           qry_end=lead.qry_end,
                           strand=lead.strand,
                           mapq=lead.mapq,
                           nm=lead.nm,
                           source=lead.source,
                           svtype=svtype,
                           svlen=svlen,
                           seq=lead.seq if svtype == "INS" else None,
                           hap=str(read_hap), phase_set=str(read_ps), is_sa=read.is_supplementary)


class LeadProvider:
    """Builds the binned leadtab + coverage array for a set of regions
    (reference: leadprov.py:358-670)."""
    coverage: np.ndarray

    def __init__(self, config, read_id_offset, contig: str):
        self.config = config

        self.leadtab: dict[str, dict[int, list[Lead]]] = {}
        self.leadcounts: dict[str, int] = {}
        self.leadhapcount: dict[str, dict[int, list[int]]] = {}

        for svtype in sv.ALL_TYPES:
            self.leadtab[svtype] = {}
            self.leadcounts[svtype] = 0
            self.leadhapcount[svtype] = {}
        self.leadhapcount["REF"] = {}

        self.covrtab_fwd = {}
        self.covrtab_rev = {}
        self.covrtab_min_bin = None

        self.read_id = read_id_offset
        self.read_count = 0

        self.contig = contig
        self.start = None
        self.end = None

        self.overflow = 0

    def record_hap_ref(self, hp_index, pos_leadtab, end_leadtab, step):
        """Per-read scalar form of the REF haplotype bin counts
        (reference: leadprov.py:387-398); the region scans batch this via
        fold_hap_spans, which is exactness-tested against this method."""
        leadtab_hapc = self.leadhapcount["REF"]
        for this_pos in range(pos_leadtab, end_leadtab, step):
            if this_pos in leadtab_hapc:
                leadtab_hapc[this_pos][hp_index] += 1
            else:
                counts = [0, 0, 0]
                counts[hp_index] = 1
                leadtab_hapc[this_pos] = counts

    def fold_hap_spans(self, spans: list, binsize: int) -> None:
        """Batched equivalent of per-read record_hap_ref calls: `spans`
        holds (hp, pos_leadtab, end_leadtab) per read; bins cover
        [pos_leadtab, end_leadtab) exclusive, accumulated per haplotype
        with difference arrays."""
        if not spans:
            return
        arr = np.asarray(spans, dtype=np.int64)
        hps = arr[:, 0]
        b0 = arr[:, 1] // binsize
        b1 = arr[:, 2] // binsize
        n_bins = int(b1.max()) + 1
        ref_hapc = self.leadhapcount["REF"]
        for hpv in np.unique(hps):
            sel = hps == hpv
            d = np.zeros(n_bins + 1, dtype=np.int64)
            np.add.at(d, b0[sel], 1)
            np.add.at(d, np.minimum(b1[sel], n_bins), -1)
            counts = np.cumsum(d[:n_bins])
            for b in np.nonzero(counts)[0]:
                key = int(b) * binsize
                row = ref_hapc.get(key)
                if row is None:
                    row = [0, 0, 0]
                    ref_hapc[key] = row
                row[int(hpv)] += int(counts[b])

    def record_lead(self, ld: Lead, pos_leadtab: int) -> None:
        leadtab_svtype = self.leadtab[ld.svtype]
        leadtab_hapc = self.leadhapcount[ld.svtype]
        hp_index = int(ld.hap)
        if pos_leadtab in leadtab_svtype:
            leadtab_svtype[pos_leadtab].append(ld)
            lead_count = len(leadtab_svtype[pos_leadtab])
            if lead_count > self.config.consensus_max_reads_bin:
                ld.seq = None
            leadtab_hapc[pos_leadtab][hp_index] += 1
        else:
            leadtab_svtype[pos_leadtab] = [ld]
            counts = [0, 0, 0]
            counts[hp_index] = 1
            leadtab_hapc[pos_leadtab] = counts
        self.leadcounts[ld.svtype] += 1

    def _mask_N_coverage(self, regions: list[Region] = None) -> None:
        """Zero coverage over N runs in the reference (reference: leadprov.py:420-443)."""
        if self.config.reference:
            try:
                from sniffles_tpu.io.fasta import FastaFile
                fasta = FastaFile(self.config.reference)
            except Exception as e:
                log.warning(f'Unable to mask N regions in coverage vector, reference could not '
                            f'be opened: {e}')
                return
            try:
                if regions is None:
                    mask = np.frombuffer(fasta.fetch(self.contig).encode('ascii'), dtype=np.uint8)
                else:
                    mask = np.zeros(len(self.coverage), dtype=np.uint8)
                    for region in regions:
                        region_mask = np.frombuffer(
                            fasta.fetch(region.contig, region.start, region.end).encode('ascii'),
                            dtype=np.uint8)
                        mask[region.start:region.end] = region_mask
                self.coverage[mask == 78] = 0
            except Exception as e:
                log.warning(f'Unable to mask N regions in coverage vector: {e}')

    def build_leadtab(self, regions: list[Region], bam) -> list[Lead]:
        assert self.start is None
        assert self.end is None

        externals: list[Lead] = []
        ld_binsize = self.config.cluster_binsize
        self.coverage = np.zeros(bam.get_reference_length(self.contig), dtype=np.uint16)

        for region in regions:
            if self.contig != region.contig:
                raise Exception(f"Region contig '{region.contig}' does not match LeadProvider "
                                f"contig '{self.contig}'")

            self.start = region.start if self.start is None else min(region.start, self.start)
            self.end = region.end if self.end is None else max(region.start, self.end)
            self.covrtab_min_bin = int(self.start / self.config.coverage_binsize) * self.config.coverage_binsize

            for ld in self.iter_region(bam, region):
                ld_contig, ld_ref_start = ld.contig, ld.ref_start

                if region.contig == ld_contig and region.start <= ld_ref_start < region.end:
                    pos_leadtab = int(ld_ref_start / ld_binsize) * ld_binsize
                    self.record_lead(ld, pos_leadtab)
                else:
                    externals.append(ld)

        self._mask_N_coverage(regions)

        return externals

    def iter_region(self, bam, region: Region) -> Iterator[Lead]:
        """Per-read scan of one region (reference: leadprov.py:474-581).

        Dispatches to the native C++ decoder (native/bamcore.cc) when
        built; the pure-Python path below is the exact fallback.
        """
        # Read tracing needs per-read visibility; use the Python path for it
        if (not getattr(self.config, "no_native", False)
                and not self.config.dev_trace_read and hasattr(bam, "scan_region")):
            from sniffles_tpu.io import native
            if native.available():
                yield from self._iter_region_native(bam, region)
                return
        yield from self._iter_region_python(bam, region)

    def _iter_region_python(self, bam, region: Region) -> Iterator[Lead]:
        config = self.config
        qc_nm = config.qc_nm_measure
        phase = config.phase
        advanced_tags = qc_nm or phase
        mapq_min = config.mapq
        alen_min = config.min_alignment_length
        exclude_flags = config.exclude_flags
        nm_sum = 0
        nm_count = 0
        ld_binsize = config.cluster_binsize

        trace_read = config.dev_trace_read
        coverage = self.coverage
        hap_spans: list[tuple[int, int, int]] = []
        for read in bam.fetch(region.contig, region.start, region.end):
            if trace_read and read.query_name in trace_read:
                print(f"[DEV_TRACE_READ] [0b/4] [LeadProvider.iter_region] [{region}] "
                      f"[{read.query_name}] has been fetched and is entering pre-filtering")
            alen = read.query_alignment_length
            if read.mapping_quality < mapq_min or read.is_secondary or alen < alen_min:
                continue

            if exclude_flags is not None:
                if read.flag & exclude_flags:
                    continue

            if read.reference_start < region.start or read.reference_start >= region.end:
                continue

            hp = read.get_tag("HP") if read.has_tag("HP") else 0
            ps = read.get_tag("PS") if read.has_tag("PS") else "NULL"

            self.read_id += 1
            self.read_count += 1
            coverage[read.reference_start:read.reference_end] += 1

            has_sa = read.has_tag("SA")
            use_clips = config.detect_large_ins and not read.is_supplementary and not has_sa

            nm = -1
            curr_read_id = self.read_id
            if advanced_tags:
                if read.has_tag("NM"):
                    nm_raw = read.get_tag("NM")
                    ins_sum, del_sum, *large_op = get_cigar_indels(read)
                    # Only indel events above threshold are removed from NM
                    nm = (nm_raw - sum(large_op)) / float(read.query_alignment_length + 1)
                    nm_sum += nm
                    nm_count += 1

            if trace_read and read.query_name in trace_read:
                print(f"[DEV_TRACE_READ] [0b/4] [LeadProvider.iter_region] [{region}] "
                      f"[{read.query_name}] passed pre-filtering (whole-read), begin to "
                      f"extract leads")

            for lead in self.read_iterindels(curr_read_id, read, region.contig, use_clips,
                                             read_nm=nm, read_hap=hp, read_ps=ps):
                if trace_read and read.query_name in trace_read:
                    print(f"[DEV_TRACE_READ] [1/4] [leadprov.read_iterindels] [{region}] "
                          f"[{read.query_name}] new lead: {lead}")
                yield lead

            if has_sa:
                # Same-strand junctions within one contig are colinear
                # splits (INS/DEL/DUP) handled by classify_splits; emitting
                # them as BNDs too would duplicate calls (reference keeps
                # them out by bailing in for_bnd, leadprov.py:83-84).
                # Inter-contig same-strand junctions are real translocation
                # breakends (test_bnd_leads.py "red" cases) and are kept.
                if lead := Lead.for_bnd(curr_read_id, read):
                    if (not lead.sa_same_strand
                            or lead.bnd_info.mate_contig != lead.contig):
                        yield lead

                if not read.is_supplementary:
                    yield from read_itersplits(curr_read_id, read, region.contig, config,
                                               read_nm=nm, read_hap=hp, read_ps=ps)

            # record haplotype counts over the read's span (folded in one
            # batch after the scan; per-bin dict updates per read were a
            # top-3 cost of this loop)
            ld_ref_start, ld_ref_end = read.reference_start, read.reference_end
            pos_leadtab = int(ld_ref_start / ld_binsize) * ld_binsize
            end_leadtab = int(ld_ref_end / ld_binsize) * ld_binsize
            if region.start <= ld_ref_start < region.end:
                hap_spans.append((hp, pos_leadtab, end_leadtab))

        self.fold_hap_spans(hap_spans, ld_binsize)
        log.debug(f'Processed {self.read_count} reads in region '
                  f'{region.contig}:{region.start}-{region.end}')

        # Per-task regional NM statistic (reference: leadprov.py:577-578 mutates config).
        config.average_regional_nm = nm_sum / float(max(1, nm_count))
        config.qc_nm_threshold = config.average_regional_nm

    def _iter_region_native(self, bam, region: Region) -> Iterator[Lead]:
        """Native-decoder scan with identical semantics to the Python path:
        per-read filtering, coverage, NM statistics, CIGAR indel/clip
        leads from pre-extracted events, and full Python split-read
        handling only for reads carrying an SA tag."""
        config = self.config
        qc_nm = config.qc_nm_measure
        phase = config.phase
        advanced_tags = qc_nm or phase
        mapq_min = config.mapq
        alen_min = config.min_alignment_length
        exclude_flags = config.exclude_flags if config.exclude_flags is not None else 0
        minsvlen = config.minsvlen_screen
        longinslen = config.long_ins_length / 2.0
        seq_cache_maxlen = config.dev_seq_cache_maxlen
        detect_large_ins = config.detect_large_ins
        ld_binsize = config.cluster_binsize
        nm_sum = 0.0
        nm_count = 0
        coverage = self.coverage
        hap_diff = None  # (3, n_bins+1) per-hp difference accumulator

        from sniffles_tpu.io import native
        from sniffles_tpu.io.bam import parse_record, FREVERSE, FSECONDARY, FSUPPLEMENTARY
        from sniffles_tpu.io.bam import CINS as OP_I, CDEL as OP_D, CSOFT_CLIP as OP_S

        for res, mask in bam.scan_region(region.contig, region.start, region.end,
                                         min_event_len=minsvlen):
            c = res.cols
            ev_rec = res.events["rec_index"]
            pos_arr = c["pos"]
            flag_arr = c["flag"]
            qalen_arr = c["qalen"]
            ref_len_arr = c["ref_len"]

            # Vectorized per-read filtering (reference: leadprov.py:494-503)
            passing = (mask & (c["mapq"] >= mapq_min)
                       & ((flag_arr & (FSECONDARY | exclude_flags)) == 0)
                       & (qalen_arr >= alen_min)
                       & (pos_arr >= region.start) & (pos_arr < region.end))
            idxs = np.nonzero(passing)[0]
            n_pass = len(idxs)
            if n_pass == 0:
                continue

            # read ids: sequential in record order
            read_ids = self.read_id + 1 + np.arange(n_pass, dtype=np.int64)
            self.read_id += n_pass
            self.read_count += n_pass

            # coverage: batched difference-array accumulation
            starts = pos_arr[idxs].astype(np.int64)
            ends = starts + ref_len_arr[idxs]
            lo_bp = int(starts.min())
            hi_bp = int(min(ends.max(), len(coverage)))
            cov_diff = np.zeros(hi_bp - lo_bp + 1, dtype=np.int32)
            np.add.at(cov_diff, np.clip(starts - lo_bp, 0, hi_bp - lo_bp), 1)
            np.add.at(cov_diff, np.clip(ends - lo_bp, 0, hi_bp - lo_bp), -1)
            cov_slice = coverage[lo_bp:hi_bp]
            if not native.prefix_add_u16(cov_diff, cov_slice):
                cov_slice += np.cumsum(cov_diff[:-1]).astype(np.uint16)

            # NM statistics, vectorized (reference: leadprov.py:517-529)
            nm_raw = c["nm"][idxs]
            nm_vals = np.where(
                nm_raw >= 0,
                (nm_raw - c["large_indel_sum"][idxs]) / (qalen_arr[idxs] + 1.0),
                -1.0)
            if advanced_tags:
                has_nm = nm_raw >= 0
                nm_sum += float(nm_vals[has_nm].sum())
                nm_count += int(has_nm.sum())

            # haplotype/REF-bin counts: accumulate per-region difference
            # arrays across batches, folded into the leadhapcount dict
            # ONCE after the scan (a per-batch dict fold was ~1.5M dict
            # ops on a 30x multi-contig run)
            hp_arr = np.clip(c["hp"][idxs], 0, 2)
            bin_start = (starts // ld_binsize).astype(np.int64)
            bin_end = (ends // ld_binsize).astype(np.int64)
            if hap_diff is None or hap_diff.shape[1] <= int(bin_end.max()) + 1:
                need = max(int(bin_end.max()) + 2,
                           len(coverage) // ld_binsize + 2)
                grown = np.zeros((3, need), dtype=np.int64)
                if hap_diff is not None:
                    grown[:, :hap_diff.shape[1]] = hap_diff
                hap_diff = grown
            np.add.at(hap_diff, (hp_arr, bin_start), 1)
            np.add.at(hap_diff, (hp_arr, bin_end), -1)

            # Only reads producing leads need Python-side work
            has_events = np.zeros(len(pos_arr), dtype=bool)
            has_events[ev_rec] = True
            has_sa_arr = c["sa_off"] >= 0
            interesting = idxs[(has_events | has_sa_arr)[idxs]]
            if len(interesting) == 0:
                continue
            read_id_of = dict(zip(idxs.tolist(), read_ids.tolist()))
            ev_lo_a = np.searchsorted(ev_rec, interesting, side="left")
            ev_hi_a = np.searchsorted(ev_rec, interesting, side="right")
            # box only the event range interesting reads consume (events
            # of reads failing the pass mask are skipped entirely)
            ev_base = int(ev_lo_a[0]) if len(ev_lo_a) else 0
            ev_top = int(ev_hi_a[-1]) if len(ev_hi_a) else 0
            ev_lo = (ev_lo_a - ev_base).tolist()
            ev_hi = (ev_hi_a - ev_base).tolist()

            # batch scalar extraction: one .tolist() per column beats
            # per-element numpy indexing (~8 boxed reads per record) in
            # this, the last remaining per-read Python loop
            flag_l = flag_arr[interesting].tolist()
            pos_l = pos_arr[interesting].tolist()
            hp_l = c["hp"][interesting].tolist()
            ps_l = c["ps"][interesting].tolist()
            nm_raw_l = c["nm"][interesting].tolist()
            lis_l = c["large_indel_sum"][interesting].tolist()
            qalen_l = qalen_arr[interesting].tolist()
            mapq_l = c["mapq"][interesting].tolist()
            sa_l = has_sa_arr[interesting].tolist()
            ev_op_l = res.events["op"][ev_base:ev_top].tolist()
            ev_oplen_l = res.events["oplen"][ev_base:ev_top].tolist()
            ev_pos_ref_l = res.events["pos_ref"][ev_base:ev_top].tolist()
            ev_pos_read_l = res.events["pos_read"][ev_base:ev_top].tolist()

            for k, i in enumerate(interesting.tolist()):
                flag = flag_l[k]
                ref_start = pos_l[k]
                hp = hp_l[k]
                ps_raw = ps_l[k]
                ps = ps_raw if ps_raw >= 0 else "NULL"
                has_sa = sa_l[k]
                is_supp = bool(flag & FSUPPLEMENTARY)
                use_clips = detect_large_ins and not is_supp and not has_sa
                curr_read_id = read_id_of[i]
                nm = -1
                if advanced_tags and nm_raw_l[k] >= 0:
                    nm = (nm_raw_l[k] - lis_l[k]) / float(qalen_l[k] + 1)
                qname = res.name(i)
                strand = "-" if (flag & FREVERSE) else "+"
                mapq = mapq_l[k]
                read_len = qalen_l[k]

                # CIGAR indel/clip leads from pre-extracted native events
                for e in range(ev_lo[k], ev_hi[k]):
                    op = ev_op_l[e]
                    oplength = ev_oplen_l[e]
                    pos_ref = ev_pos_ref_l[e]
                    pos_read = ev_pos_read_l[e]
                    if op == OP_I:
                        yield Lead(curr_read_id, qname, region.contig,
                                   pos_ref, pos_ref, pos_read, pos_read + oplength,
                                   strand, mapq, nm, "INLINE", "INS", oplength,
                                   seq=(res.seq_slice(i, pos_read, pos_read + oplength)
                                        if oplength <= seq_cache_maxlen else None),
                                   hap=str(hp), phase_set=str(ps), is_sa=is_supp,
                                   read_len=read_len)
                    elif op == OP_D:
                        yield Lead(curr_read_id, qname, region.contig,
                                   pos_ref + oplength, pos_ref, pos_read, pos_read,
                                   strand, mapq, nm, "INLINE", "DEL", -oplength,
                                   hap=str(hp), phase_set=str(ps), is_sa=is_supp,
                                   read_len=read_len)
                    elif op == OP_S:
                        # hard clips carry event=0 in the reference OPTAB and
                        # never produce leads (leadprov.py:180-195)
                        if use_clips and oplength >= longinslen:
                            yield Lead(curr_read_id, qname, region.contig,
                                       pos_ref, pos_ref, pos_read, pos_read + oplength,
                                       strand, mapq, nm, "INLINE", "INS", None,
                                       seq=None, hap=str(hp), phase_set=str(ps),
                                       is_sa=is_supp, read_len=read_len)
                        else:
                            yield Lead(curr_read_id, qname, region.contig,
                                       pos_ref, pos_ref, pos_read, pos_read + oplength,
                                       strand, mapq, nm, "INLINE",
                                       "SINGLE_LEFT" if pos_ref == ref_start else "SINGLE_RIGHT",
                                       0, seq=None, hap=str(hp), phase_set=str(ps),
                                       is_sa=is_supp, read_len=read_len)

                # Split reads: full Python record parse only for SA carriers
                if has_sa:
                    read = parse_record(res.record_bytes(i), bam.references)
                    if lead := Lead.for_bnd(curr_read_id, read):
                        if (not lead.sa_same_strand
                                or lead.bnd_info.mate_contig != lead.contig):
                            yield lead
                    if not is_supp:
                        yield from read_itersplits(curr_read_id, read, region.contig, config,
                                                   read_nm=nm, read_hap=hp, read_ps=ps)

        if hap_diff is not None:
            counts = np.cumsum(hap_diff[:, :-1], axis=1)
            ref_hapc = self.leadhapcount["REF"]
            nz = np.nonzero(counts.any(axis=0))[0]
            c0, c1, c2 = (counts[0, nz].tolist(), counts[1, nz].tolist(),
                          counts[2, nz].tolist())
            for j, b in enumerate(nz.tolist()):
                key = b * ld_binsize
                row = ref_hapc.get(key)
                if row is None:
                    ref_hapc[key] = [c0[j], c1[j], c2[j]]
                else:
                    row[0] += c0[j]
                    row[1] += c1[j]
                    row[2] += c2[j]

        config.average_regional_nm = nm_sum / float(max(1, nm_count))
        config.qc_nm_threshold = config.average_regional_nm

    def read_iterindels(self, read_id: int, read: BamRead, contig, use_clips,
                        read_nm, read_hap, read_ps) -> Iterator[Lead]:
        """CIGAR-indel / clip leads of one read (reference: leadprov.py:583-670)."""
        config = self.config
        minsvlen = config.minsvlen_screen
        longinslen = config.long_ins_length / 2.0
        seq_cache_maxlen = config.dev_seq_cache_maxlen
        qname = read.query_name
        mapq = read.mapping_quality
        strand = "-" if read.is_reverse else "+"

        pos_read = 0
        pos_ref = read.reference_start
        read_len = read.query_alignment_length

        for op, oplength in read.cigartuples:
            add_read, add_ref, event, dcov = OPLIST[op]
            if event and oplength >= minsvlen:
                if op == CINS:
                    yield Lead(read_id, qname, contig,
                               pos_ref, pos_ref,
                               pos_read, pos_read + oplength,
                               strand, mapq, read_nm,
                               "INLINE", "INS", oplength,
                               seq=(read.query_sequence[pos_read:pos_read + oplength]
                                    if oplength <= seq_cache_maxlen else None),
                               hap=str(read_hap), phase_set=str(read_ps),
                               is_sa=read.is_supplementary, read_len=read_len)
                elif op == CDEL:
                    yield Lead(read_id, qname, contig,
                               pos_ref + oplength, pos_ref,
                               pos_read, pos_read,
                               strand, mapq, read_nm,
                               "INLINE", "DEL", -oplength,
                               hap=str(read_hap), phase_set=str(read_ps),
                               is_sa=read.is_supplementary, read_len=read_len)
                elif use_clips and op == CSOFT_CLIP and oplength >= longinslen:
                    yield Lead(read_id, qname, contig,
                               pos_ref, pos_ref,
                               pos_read, pos_read + oplength,
                               strand, mapq, read_nm,
                               "INLINE", "INS", None,
                               seq=None,
                               hap=str(read_hap), phase_set=str(read_ps),
                               is_sa=read.is_supplementary, read_len=read_len)
                elif op in (CSOFT_CLIP, CHARD_CLIP):
                    yield Lead(read_id, qname, contig,
                               pos_ref, pos_ref,
                               pos_read, pos_read + oplength,
                               strand, mapq, read_nm,
                               "INLINE",
                               "SINGLE_LEFT" if pos_ref == read.reference_start else "SINGLE_RIGHT",
                               0,
                               seq=None,
                               hap=str(read_hap), phase_set=str(read_ps),
                               is_sa=read.is_supplementary, read_len=read_len)

            pos_read += add_read * oplength
            pos_ref += add_ref * oplength


from sniffles_tpu.compat import alias_module_for_pickle

alias_module_for_pickle("sniffles.leadprov", __name__, [Lead])
