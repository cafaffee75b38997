"""
Task types: CallTask (single-sample calling), GenotypeTask (force
calling), CombineTask (multi-sample SNF merge).

Mirrors reference task semantics (reference: parallel.py:42-572). Tasks
are the unit of genome-space sharding: one task per contig interval
(call/genotype) or per SNF-block shard (combine).
"""
from __future__ import annotations

import copy
import logging
import math
from dataclasses import dataclass
from typing import Optional, TYPE_CHECKING

from sniffles_tpu import cluster
from sniffles_tpu import leads as leadprov
from sniffles_tpu import postprocess as postprocessing
from sniffles_tpu import svcall as sv
from sniffles_tpu.io import snf
from sniffles_tpu.region import Region
from sniffles_tpu.pipeline.result import (Result, ErrorResult, CallResult, GenotypeResult,
                                          CombineResult)

if TYPE_CHECKING:
    from sniffles_tpu.config import SnifflesConfig

log = logging.getLogger(__name__)


@dataclass
class Task:
    """A unit of work sent to a worker; must be pickleable (reference: parallel.py:42-249)."""
    id: int
    sv_id: int
    contig: str
    start: int
    end: int
    config: 'SnifflesConfig'
    assigned_process_id: Optional[int] = None
    lead_provider: leadprov.LeadProvider = None
    bam: object = None
    tandem_repeats: list = None
    genotype_svs: list = None
    regions: list[Region] = None
    result: Result = None

    def __str__(self):
        return f'Task #{self.id}'

    @property
    def done(self) -> bool:
        return self.result is not None

    @property
    def success(self) -> bool:
        return self.done and not self.result.error

    def add_result(self, result: Result) -> None:
        self.result = result

    def execute(self, worker=None) -> Optional[Result]:
        raise NotImplementedError

    _prefetched: Optional[tuple] = None
    _nm_threshold: Optional[float] = None

    def _cache_filename(self) -> str:
        """Leadtab cache path (reference: leadprov.py:672-678)."""
        import os
        cache_dir = self.config.dev_cache_dir or os.path.join(self.config.tmp_dir,
                                                              "sniffles_tpu_cache")
        os.makedirs(cache_dir, exist_ok=True)
        base = os.path.basename(self.config.input)
        return os.path.join(cache_dir, f"{base}_{self.contig}_{self.start}_{self.end}.pickle")

    def build_leadtab(self):
        # a decode-ahead prefetch (runtime.SnifflesParentWorker) may have
        # already built the leadtab on a background thread
        if self.lead_provider is not None:
            return self._prefetched

        config = self.config

        if config.dev_cache:
            import pickle
            import os
            path = self._cache_filename()
            if os.path.exists(path):
                with open(path, "rb") as f:
                    state = pickle.load(f)
                self.lead_provider, self._nm_threshold, self._prefetched = state
                self.lead_provider.config = config  # nulled before pickling
                config.qc_nm_threshold = self._nm_threshold
                config.average_regional_nm = self._nm_threshold
                return self._prefetched

        from sniffles_tpu.io.bam import AlignmentFile
        self.bam = AlignmentFile(config.input, config.input_mode, require_index=True,
                                 reference_filename=config.reference)

        self.lead_provider = leadprov.LeadProvider(config, self.id * config.task_read_id_offset_mult,
                                                   self.contig)
        externals = self.lead_provider.build_leadtab(
            self.regions if self.regions else [Region(self.contig, self.start, self.end)], self.bam)
        # snapshot the per-task regional NM statistic: with decode-ahead the
        # next task's scan would overwrite the config-global before this
        # task's QC consumes it (reference: leadprov.py:577-578)
        self._nm_threshold = config.qc_nm_threshold
        self._prefetched = (externals, self.lead_provider.read_count)

        if config.dev_cache:
            import pickle
            lp_config = self.lead_provider.config
            self.lead_provider.config = None  # config is not picklable state
            try:
                with open(self._cache_filename(), "wb") as f:
                    pickle.dump((self.lead_provider, self._nm_threshold, self._prefetched), f)
            finally:
                self.lead_provider.config = lp_config

        return self._prefetched

    def call_candidates(self, keep_qc_fails, config) -> list[sv.SVCall]:
        """(reference: parallel.py:104-127)"""
        candidates = []
        use_device = getattr(config, "tpu_call", False) and config.threads == 0

        def iter_clusters():
            host_types = sv.ALL_TYPES
            if use_device:
                try:
                    from sniffles_tpu.parallel.device_call import device_clusters, _DEVICE_TYPES
                    clusters = list(device_clusters(self.lead_provider, config,
                                                    self.tandem_repeats))
                except Exception:
                    log.warning("device clustering unavailable; falling back to host path",
                                exc_info=True)
                else:
                    yield from clusters
                    host_types = [t for t in sv.ALL_TYPES if t not in _DEVICE_TYPES]
            for svtype in host_types:
                yield from cluster.resolve(svtype, self.lead_provider, config,
                                           self.tandem_repeats)

        for svcluster in iter_clusters():
            svcluster.get_sa_count()
            for svc in sv.call_from(svcluster, config, keep_qc_fails, self):
                if config.dev_trace_read:
                    traced = [ld.read_qname for ld in svcluster.leads
                              if ld.read_qname in config.dev_trace_read]
                    if traced:
                        print(f"[DEV_TRACE_READ] [3/4] [Task.call_candidates] Read "
                              f"{','.join(traced)} -> Cluster {svcluster.id} -> "
                              f"preliminary SVCall {svc.svtype} {svc.contig}:{svc.pos} "
                              f"svlen={svc.svlen} support={svc.support}")
                candidates.append(svc)

        self.coverage_average_total = postprocessing.coverage(candidates, self.lead_provider)
        return candidates

    def finalize_candidates(self, candidates: list['sv.SVCall'], keep_qc_fails, config):
        """(reference: parallel.py:129-201)"""
        passed = []
        for svc in candidates:
            svc.qc = svc.qc and postprocessing.qc_sv(svc, config)

            if not config.mosaic and svc.qc:
                svc.qc = svc.qc and postprocessing.qc_sv_support(svc, self.coverage_average_total, config)

            postprocessing.annotate_sv(svc, config)

            svc.qc = svc.qc and postprocessing.qc_sv_post_annotate(
                svc, config, self.coverage_average_total, nm_threshold=self._nm_threshold)

            if config.dev_trace_read and svc.postprocess is not None:
                traced = [ld.read_qname for ld in svc.postprocess.cluster.leads
                          if ld.read_qname in config.dev_trace_read]
                if traced:
                    print(f"[DEV_TRACE_READ] [4/4] [Task.finalize_candidates] Read "
                          f"{','.join(traced)} -> Cluster {svc.postprocess.cluster.id} -> "
                          f"finalized SVCall, QC={svc.qc}: {svc.svtype} {svc.contig}:"
                          f"{svc.pos} filter={svc.filter}")

            if config.dev_output_candidates:
                try:
                    # snapshot CSV lines while postprocess info is attached
                    svc.csv_line = svc._to_csv_line()
                    svc.csv_line_single = svc._to_csv_line(single_break=True)
                except Exception:
                    log.exception(f'Error generating CSV line for {svc}')

            # Phasing rescue for allelic-imbalance HETs (reference: parallel.py:178-184)
            phasing_rescue = (svc.svtype not in ["BND"] and abs(svc.svlen) <= config.dev_maxsvlen_extra
                              and svc.support >= int(config.dev_minreads_extra * 0.60))
            if self.config.phase and not svc.qc and phasing_rescue:
                try:
                    self.rescue_phasing(svc)
                except Exception:
                    log.warning(f'Error while rescue phasing for {svc}')

            # Local assembly rescue (reference: parallel.py:186-196)
            skip_filters = ["PASS", "GT"] if not config.dev_locasm_skip_mosaic else ["PASS", "GT", "MOSAIC_VAF"]
            apply_to_svtypes = ["INS", "DEL"]
            do_local_asm = (svc.filter not in skip_filters and svc.svtype in apply_to_svtypes and
                            config.dev_locasm_do and not svc.qc and abs(svc.svlen) <= config.dev_maxsvlen_extra
                            and (svc.support >= config.dev_minreads_extra or
                                 len(svc.rnames) > config.dev_minreads_extra))
            if do_local_asm:
                from sniffles_tpu.local_asm import LocalAsm
                loc_asm = LocalAsm(svc)
                loc_asm.assembly(self.config)

            svc.finalize()
            passed.append(svc)
        return passed

    def rescue_phasing(self, svc: sv.SVCall, min_rnames_in_phase: float = 0.75,
                       min_reads_cover: int = 3) -> bool:
        """(reference: parallel.py:203-249)"""
        if "call_sample" != self.config.mode:
            return False
        import numpy as np
        nm_vals = [this_lead.nm for this_lead in svc.postprocess.cluster.leads]
        n_leads = len(nm_vals)
        sv_nm = np.nanmean(nm_vals)
        if sv_nm > self.config.genotype_error or n_leads <= min_reads_cover:
            return False
        if "PHASE" in svc.info:
            hp, _, hp_reads, _, hp_filter, _ = svc.info["PHASE"].split(",")
            if "PASS" != hp_filter:
                return False
            hp = int(hp)
        else:
            return False

        _, sv1, sv2, _, hap1, hap2 = svc.postprocess.cluster.hap_counts
        if hp == 1:
            all_reads_phase, sv_reads_phase = hap1, sv1
        elif hp == 2:
            all_reads_phase, sv_reads_phase = hap2, sv2
        else:
            return False

        if 0 == all_reads_phase:
            return False

        if float(sv_reads_phase) / float(all_reads_phase) >= min_rnames_in_phase:
            if "MOSAIC_VAF" == svc.filter:
                svc.filter = "PASS"
                gt = svc.genotypes[0]
                a, b, gq, dr, dv, p = gt
                svc.genotypes[0] = (a, 1, gq, dr, dv, p)
                svc.qc = True
                return True
            return False
        return False


class CallTask(Task):
    """Single-sample SV calling for one contig interval (reference: parallel.py:252-297)."""

    def execute(self, worker=None) -> CallResult:
        config = self.config

        if config.snf is not None or config.no_qc:
            qc = False
        else:
            qc = True

        _, read_count = self.build_leadtab()
        svcandidates = self.call_candidates(qc, config)
        svcalls = self.finalize_candidates(svcandidates, not qc, config)
        if not config.no_qc:
            svcalls = [s for s in svcalls if s.qc]

        if config.sort:
            svcalls = sorted(svcalls, key=lambda svc: svc.pos)

        result = CallResult(self, svcalls, read_count)

        if config.dev_output_candidates:
            result.store_candidates(svcandidates)

        if config.snf is not None:
            snf_filename = f"{config.snf}.tmp_{self.id}.snf"

            with open(snf_filename, "wb") as handle:
                snf_out = snf.SNFile(config, handle)
                for cand in svcandidates:
                    snf_out.store(cand)
                snf_out.annotate_block_coverages(self.lead_provider)
                snf_out.write_and_index()
            result.snf_filename = snf_filename
            result.snf_index = snf_out.get_index()
            result.snf_total_length = snf_out.get_total_length()
            result.snf_candidate_count = len(svcandidates)
            result.has_snf = True

        result.coverage_average_total = self.coverage_average_total

        return result


class GenotypeTask(Task):
    """Force calling against a known-SV VCF (reference: parallel.py:300-369)."""

    def execute(self, worker=None) -> Optional[GenotypeResult]:
        config = self.config

        qc = False
        _, read_count = self.build_leadtab()
        svcandidates = self.call_candidates(qc, config=config)
        self.finalize_candidates(svcandidates, not qc, config=config)

        binsize = 5000
        binedge = int(binsize / 10)
        genotype_svs_svtypes_bins = {svtype: {} for svtype in sv.TYPES}
        for genotype_sv in self.genotype_svs:
            genotype_sv.genotype_match_sv = None
            genotype_sv.genotype_match_dist = math.inf

            if genotype_sv.svtype not in genotype_svs_svtypes_bins:
                log.warning(f'Unsupported SVTYPE: {genotype_sv.svtype}')
                continue

            bins = [int(genotype_sv.pos / binsize) * binsize]
            if genotype_sv.pos % binsize < binedge:
                bins.append((int(genotype_sv.pos / binsize) - 1) * binsize)
            if genotype_sv.pos % binsize > binsize - binedge:
                bins.append((int(genotype_sv.pos / binsize) + 1) * binsize)

            for bin in bins:
                genotype_svs_svtypes_bins[genotype_sv.svtype].setdefault(bin, []).append(genotype_sv)

        for cand in svcandidates:
            if cand.svtype.startswith('SINGLE'):
                continue
            bin = int(cand.pos / binsize) * binsize
            if bin not in genotype_svs_svtypes_bins[cand.svtype]:
                continue
            if cand.svtype == "BND":
                for genotype_sv in genotype_svs_svtypes_bins[cand.svtype][bin]:
                    dist = abs(genotype_sv.pos - cand.pos)
                    if dist < genotype_sv.genotype_match_dist and dist <= config.cluster_merge_bnd:
                        if cand.bnd_info.mate_contig == genotype_sv.bnd_info.mate_contig:
                            genotype_sv.genotype_match_sv = cand
                            genotype_sv.genotype_match_dist = dist
            else:
                for genotype_sv in genotype_svs_svtypes_bins[cand.svtype][bin]:
                    dist = abs(genotype_sv.pos - cand.pos) + abs(abs(genotype_sv.svlen) - abs(cand.svlen))
                    minlen = float(min(abs(genotype_sv.svlen), abs(cand.svlen)))
                    if (minlen > 0 and dist < genotype_sv.genotype_match_dist
                            and dist <= config.combine_match * math.sqrt(minlen)
                            and dist <= config.combine_match_max):
                        genotype_sv.genotype_match_sv = cand
                        genotype_sv.genotype_match_dist = dist

        postprocessing.coverage(self.genotype_svs, self.lead_provider)

        # Determine genotypes for unmatched input SVs (reference: parallel.py:356-366)
        for svc in self.genotype_svs:
            coverage_list = [svc.coverage_start, svc.coverage_center, svc.coverage_end]
            coverage_list = [c for c in coverage_list if c is not None]
            if len(coverage_list) == 0:
                return
            coverage = round(sum(coverage_list) / len(coverage_list))
            svc.genotypes = {}
            if coverage > 0:
                svc.genotypes[0] = (0, 0, 0, coverage, 0, (None, None))
            else:
                svc.genotypes[0] = config.genotype_none

        return GenotypeResult(self, self.genotype_svs, read_count)


class CombineTask(Task):
    """Merge multiple SNF files into a multi-sample VCF (reference: parallel.py:372-572)."""
    TARGET_WORK_PER_TASK = 10000

    result_class = CombineResult
    block_indices: list[int] = None
    # Scatter-seam handoff (see scatter()/clone()): non-first shards
    # reprocess the previous shard's last TWO blocks (a group's members
    # span at most two adjacent blocks since combine_match_max << block
    # size) to rebuild its frontier; closes inside the overlap are
    # suppressed (the previous shard emitted them identically), as are
    # "ghost" groups confined to the overlap's older block. Non-last
    # shards hand off tail groups touching their last block instead of
    # flushing them.
    overlap_nblocks: int = 0
    suppress_tail: bool = False

    def __init__(self, *args, **kwargs):
        self.result_class = kwargs.pop('result_class', None) or self.result_class
        super().__init__(*args, **kwargs)
        self.generate_blocks()

    def generate_blocks(self):
        if self.regions:
            block_indices = set()
            for r in self.regions:
                start = r.start // self.config.snf_block_size * self.config.snf_block_size
                block_indices |= set(range(start, r.end + self.config.snf_block_size,
                                           self.config.snf_block_size))
            self.block_indices = list(sorted(block_indices))
        else:
            self.block_indices = list(range(self.start, self.end + self.config.snf_block_size,
                                            self.config.snf_block_size))

    def __str__(self):
        if len(self.block_indices) > 0:
            return (f'Task {self.id} Contig {self.contig} [{self.start} ({self.block_indices[0]}) '
                    f'.. {self.end} ({self.block_indices[-1]})]')
        return f'Task {self.id} [no blocks available]'

    def clone(self, first_block: int, block_count: int, new_id: int = None) -> 'CombineTask':
        obj = copy.copy(self)
        if new_id is not None:
            obj.id = new_id
        # This realizes the handoff the reference only describes in a
        # comment (parallel.py:425-429).
        obj.overlap_nblocks = min(2, first_block)
        obj.block_indices = self.block_indices[first_block - obj.overlap_nblocks:
                                               first_block + block_count]
        obj.suppress_tail = (first_block + block_count) < len(self.block_indices)
        obj.start = obj.block_indices[0]
        obj.end = obj.block_indices[-1] + obj.config.snf_block_size
        return obj

    def scatter(self) -> list['CombineTask']:
        """Scatter on block level (reference: parallel.py:422-442)."""
        total_blocks = len(self.block_indices) * len(self.config.sample_ids_vcf)
        if total_blocks <= self.TARGET_WORK_PER_TASK or self.config.threads <= 1:
            return [self]

        # >= 2 blocks per shard: the overlap-block handoff is exactly-once
        # when a group's members cannot span a whole shard (production
        # sizing gives >= 100 blocks/shard; the floor guards degenerate
        # configurations)
        blocks_per_task = max(2, total_blocks // self.TARGET_WORK_PER_TASK)

        return [
            self.clone(fb, blocks_per_task, new_id=self.id + i + 1)
            for i, fb in enumerate(range(0, len(self.block_indices), blocks_per_task))
        ]

    def execute(self, worker=None):
        samples_headers_snf = {}
        for snf_info in self.config.snf_input_info:
            snf_in = snf.SNFile(self.config, open(snf_info["filename"], "rb"),
                                filename=snf_info["filename"])
            snf_in.read_header()
            samples_headers_snf[snf_info["internal_id"]] = snf_in

            if self.config.combine_close_handles:
                snf_in.close()

        if self.config.combine_population:
            from sniffles_tpu.io.snfp import PopulationSNF
            # tasks share the config in inline (--threads 0) mode; only the
            # first task replaces the filename with the opened handle
            if isinstance(self.config.combine_population, str):
                self.config.combine_population = PopulationSNF.open(self.config.combine_population)

        result = self.result_class(self, [], 0)

        bin_min_size = self.config.combine_min_size
        bin_max_candidates = max(25, int(len(self.config.snf_input_info) * 0.5))
        overlap_abs = self.config.combine_overlap_abs
        support_threshold = self.config.combine_support_threshold

        sample_internal_ids = set(samples_headers_snf.keys())

        candidates_processed = 0
        groups_keep = {svtype: list() for svtype in sv.TYPES}
        calls = []

        for cur, block_index in enumerate(self.block_indices):
            samples_blocks = {}
            if calls:
                result.store_calls(calls)
                calls = []

            for sample_internal_id, sample_snf in samples_headers_snf.items():
                blocks = sample_snf.read_blocks(self.contig, block_index)
                samples_blocks[sample_internal_id] = blocks

            for svtype in sv.TYPES:
                bins = {}
                for sample_internal_id, sample_snf in samples_headers_snf.items():
                    blocks = samples_blocks[sample_internal_id]
                    reqc = sample_snf.reqc

                    if blocks is None:
                        continue
                    for block in blocks:
                        for cand in block[svtype]:
                            if cand.support < support_threshold:
                                continue

                            if reqc:
                                postprocessing.genotype_sv(cand, self.config)

                            cand.sample_internal_id = sample_internal_id

                            bin = int(cand.pos / bin_min_size) * bin_min_size
                            bins.setdefault(bin, []).append(cand)
                        candidates_processed += len(block[svtype])

                if len(bins) == 0:
                    continue

                size = 0
                svcands = []
                keep = groups_keep[svtype]
                sorted_bins = sorted(bins)
                last_bin = sorted_bins[-1]
                for curr_bin in sorted_bins:
                    svcands.extend(bins[curr_bin])
                    size += bin_min_size

                    if ((not self.config.combine_exhaustive and len(svcands) >= bin_max_candidates)
                            or curr_bin == last_bin):
                        if len(svcands) == 0:
                            size = 0
                            continue

                        # memoizes host edit distances across group probes
                        # within this batch (align_call fills it). An eager
                        # device all-pairs prefilter was tried here and
                        # removed: the greedy probes only a few pairs per
                        # batch (with length-bound shortcuts), so computing
                        # every pair ahead of time loses even before device
                        # dispatch latency; the mesh-sharded combine step
                        # (parallel/mesh.py) keeps its own batched DP where
                        # whole blocks are resident on device.
                        ed_cache = {} if (svtype == "INS"
                                          and self.config.combine_pctseq) else None
                        use_device_combine = (getattr(self.config, "tpu_combine", False)
                                              and self.config.threads == 0
                                              and svtype != "BND" and len(svcands) >= 4)
                        if use_device_combine:
                            try:
                                from sniffles_tpu.parallel.device_combine import device_block_groups
                                svgroups = device_block_groups(svtype, svcands, keep,
                                                               self.config, ed_cache)
                            except Exception:
                                log.warning("device combine grouping unavailable; host greedy",
                                            exc_info=True)
                                svgroups = cluster.resolve_block_groups(svtype, svcands, keep,
                                                                        self.config, ed_cache)
                        else:
                            svgroups = cluster.resolve_block_groups(svtype, svcands, keep,
                                                                    self.config, ed_cache)
                        groups_call = []
                        keep = []
                        for group in svgroups:
                            coverage_bin = (int(group.pos_mean / self.config.coverage_binsize_combine)
                                            * self.config.coverage_binsize_combine)
                            for non_included_sample in sample_internal_ids - group.included_samples:
                                if (samples_blocks[non_included_sample] is not None
                                        and coverage_bin in samples_blocks[non_included_sample][0]["_COVERAGE"]):
                                    coverage = samples_blocks[non_included_sample][0]["_COVERAGE"][coverage_bin]
                                else:
                                    coverage = 0
                                if non_included_sample in group.coverages_nonincluded:
                                    group.coverages_nonincluded[non_included_sample] = max(
                                        coverage, group.coverages_nonincluded[non_included_sample])
                                else:
                                    group.coverages_nonincluded[non_included_sample] = coverage

                            if abs(group.pos_mean - curr_bin) < max(size * 0.5, overlap_abs):
                                keep.append(group)
                            else:
                                groups_call.append(group)

                        if cur < self.overlap_nblocks:
                            # closes inside the overlap were emitted by the
                            # previous shard (same candidates, same greedy)
                            pass
                        else:
                            if self.overlap_nblocks:
                                # ghosts: groups confined to the overlap's
                                # older block belonged to the previous shard
                                ghost_limit = self.block_indices[self.overlap_nblocks - 1]
                                groups_call = [g for g in groups_call
                                               if any(c.pos >= ghost_limit for c in g.candidates)]
                            calls.extend(sv.call_groups(groups_call, self.config, self))

                        size = 0
                        svcands = []

                groups_keep[svtype] = keep

        # Tail flush. Ghost groups (confined to the overlap's older block)
        # belong to the previous shard; groups touching this shard's last
        # block are handed to the next shard when one exists (it rebuilds
        # them fully from its two-block overlap).
        ghost_limit = (self.block_indices[self.overlap_nblocks - 1]
                       if self.overlap_nblocks else None)
        last_block = self.block_indices[-1]
        for svtype in groups_keep:
            groups = groups_keep[svtype]
            if ghost_limit is not None:
                groups = [g for g in groups
                          if any(c.pos >= ghost_limit for c in g.candidates)]
            if self.suppress_tail:
                groups = [g for g in groups
                          if not any(c.pos >= last_block for c in g.candidates)]
            calls.extend(sv.call_groups(groups, self.config, self))

        if calls:
            result.store_calls(calls)

        result.finalize()
        return result


class ShutdownTask:
    id = None

    def __str__(self):
        return 'Shutdown Request'

    def execute(self, *args, **kwargs):
        from sniffles_tpu.pipeline.runtime import SnifflesWorker
        raise SnifflesWorker.Shutdown
