"""
Postprocessing: coverage annotation, QC cascade, support filters,
consensus triggering, genotype dispatch and phasing.

Exact host-side port of the reference behavior (reference:
postprocessing.py:25-654) — the filter string of the first failing
check is part of the output contract. The device pipeline evaluates
the same cascade as a vectorized mask pipeline (ops/qc_batch.py),
validated against this module.
"""
from __future__ import annotations

import logging

from sniffles_tpu import util
from sniffles_tpu import consensus
from sniffles_tpu.config import SnifflesConfig
from sniffles_tpu.svcall import SVCall

log = logging.getLogger('sniffles_tpu.postprocess')
ACCEPTED_SVTYPES = ["INS", "DEL", "DUP", "INV", "BND"]


def annotate_sv(svcall: SVCall, config):
    """(reference: postprocessing.py:25-66)"""
    if config.phase:
        phase = phase_sv(svcall, config)
    else:
        phase = (None, None)

    genotype_sv(svcall, config, phase)

    if svcall.svtype == "INS" and not config.symbolic:
        merged_leads = [lead for lead in svcall.postprocess.cluster.leads if lead.seq is not None]

        if len(merged_leads):
            best_lead = merged_leads[0]
            best_index = 0
            best_diff = abs(len(best_lead.seq) - svcall.svlen) + abs(best_lead.ref_start - svcall.pos) * 1.5
            for i, ld in enumerate(merged_leads):
                if i == 0:
                    continue
                curr_diff = abs(len(ld.seq) - svcall.svlen) + abs(ld.ref_start - svcall.pos) * 1.5
                if curr_diff < best_diff:
                    best_lead = ld
                    best_index = i
                    best_diff = curr_diff

            merged_leads.pop(best_index)

            if len(merged_leads) >= config.consensus_min_reads and not config.no_consensus:
                kmer_len = config.consensus_kmer_len
                skip = config.consensus_kmer_skip_base + int(
                    len(best_lead.seq) * config.consensus_kmer_skip_seqlen_mult)
                skip_repetitive = skip

                svcall.alt = consensus.novel_from_reads(best_lead, merged_leads, klen=kmer_len,
                                                        skip=skip, skip_repetitive=skip_repetitive)
            else:
                svcall.alt = best_lead.seq


def coverage(calls: list[SVCall], lead_provider) -> float:
    """Annotate coverage at 5 anchor points per call; returns contig-average
    coverage (reference: postprocessing.py:69-130)."""
    cv = lead_provider.coverage
    config = SnifflesConfig.GLOBAL

    for svcall in calls:
        start = svcall.pos
        end = start
        if svcall.svtype == "INS":
            end = start + 1
        elif svcall.svtype == "BND":
            if svcall.bnd_info.is_first:
                start -= 1
        else:
            end = svcall.pos + abs(svcall.svlen)

        if svcall.svtype in ("INS", "BND"):
            try:
                svcall.coverage_start = int(cv[start - config.coverage_binsize])
            except IndexError:
                pass
            try:
                svcall.coverage_center = int(cv[start])
            except IndexError:
                pass
            try:
                svcall.coverage_end = int(cv[end + config.coverage_binsize])
            except IndexError:
                pass
        else:
            try:
                svcall.coverage_start = int(cv[start])
            except IndexError:
                pass
            try:
                svcall.coverage_center = int(cv[int((start + end) / 2)])
            except IndexError:
                pass
            try:
                svcall.coverage_end = int(cv[end - config.coverage_binsize])
            except IndexError:
                pass

        try:
            svcall.coverage_upstream = int(cv[start - config.coverage_binsize * config.coverage_updown_bins])
        except IndexError:
            pass
        try:
            svcall.coverage_downstream = int(cv[end + config.coverage_binsize * config.coverage_updown_bins])
        except IndexError:
            pass

    return lead_provider.coverage.mean()


def qc_sv_support(svcall, coverage_global, config) -> bool:
    """(reference: postprocessing.py:133-159)"""
    dev_sv_filter: list = []
    if config.dev_filter:
        if isinstance(svcall.filter, str):
            if ";" in svcall.filter:
                dev_sv_filter = svcall.filter.split(";")
            else:
                dev_sv_filter = [svcall.filter]

    if config.minsupport == "auto":
        if not qc_support_auto(svcall, coverage_global, config):
            if config.dev_filter:
                dev_sv_filter.append("SUPPORT_MIN")
            else:
                svcall.filter = "SUPPORT_MIN"
                return False
    else:
        if not qc_support_const(svcall, config):
            if config.dev_filter:
                dev_sv_filter.append("SUPPORT_MIN")
            else:
                svcall.filter = "SUPPORT_MIN"
                return False

    if config.dev_filter:
        svcall.filter = ";".join(dev_sv_filter)
    return True


def rescale_support(svcall, config) -> int:
    """Long-INS support rescaling (reference: postprocessing.py:162-171)."""
    if svcall.svtype != "INS" or svcall.svlen < config.long_ins_length:
        return svcall.support
    base = svcall.support
    scale_factor = config.long_ins_rescale_mult * (float(svcall.svlen) / config.long_ins_length)
    return round(base * (config.long_ins_rescale_base + scale_factor))


def qc_support_auto(svcall, coverage_global, config):
    """(reference: postprocessing.py:174-192)"""
    support = rescale_support(svcall, config)

    coverage_list = [c for c in [svcall.coverage_upstream, svcall.coverage_downstream] if c != 0]
    if len(coverage_list) == 0:
        coverage_list = [c for c in [svcall.coverage_start, svcall.coverage_center,
                                     svcall.coverage_end] if c != 0]
    if len(coverage_list) == 0:
        coverage_regional = coverage_global
    else:
        coverage_regional = round(sum(coverage_list) / len(coverage_list))
        if coverage_regional == 0:
            coverage_regional = coverage_global
    coverage_global_weight = (1.0 - config.minsupport_auto_regional_coverage_weight)
    coverage_ = (coverage_regional * config.minsupport_auto_regional_coverage_weight +
                 coverage_global * coverage_global_weight)
    min_support = round(config.minsupport_auto_base + config.minsupport_auto_mult * coverage_)
    return support >= min_support


def qc_support_const(svcall, config):
    return svcall.support >= config.minsupport


def qc_sv(svcall: SVCall, config) -> bool:
    """Main QC cascade (reference: postprocessing.py:200-441)."""
    dev_sv_filter: list = []
    if config.dev_filter:
        if isinstance(svcall.filter, str):
            if ";" in svcall.filter:
                dev_sv_filter = svcall.filter.split(";")
            else:
                dev_sv_filter = [svcall.filter]

    if config.qc_stdev:
        stdev_pos = svcall.get_info("STDEV_POS")
        if stdev_pos > config.qc_stdev_abs_max:
            if config.dev_filter:
                dev_sv_filter.append("STDEV_POS")
            else:
                svcall.filter = "STDEV_POS"
                return False
        if svcall.svtype not in ("BND", "SINGLE_LEFT", "SINGLE_RIGHT") and stdev_pos / abs(svcall.svlen) > 2.0:
            if config.dev_filter:
                dev_sv_filter.append("STDEV_POS")
            else:
                svcall.filter = "STDEV_POS"
        if svcall.svtype not in ("BND", "SINGLE_LEFT", "SINGLE_RIGHT") and stdev_pos / abs(svcall.svlen) > 2.0:
            svcall.filter = f'{svcall.filter};STDEV_POS' if config.dev_filter else "STDEV_POS"
            if not config.dev_filter:
                return False

        stdev_len = svcall.get_info("STDEV_LEN")
        if stdev_len is not None and stdev_len != 0:
            if svcall.svtype != "BND" and stdev_len / abs(svcall.svlen) > 1.0:
                if config.dev_filter:
                    dev_sv_filter.append("STDEV_LEN")
                else:
                    svcall.filter = "STDEV_LEN"
                    return False
            if stdev_len > config.qc_stdev_abs_max:
                if config.dev_filter:
                    dev_sv_filter.append("STDEV_LEN")
                else:
                    svcall.filter = "STDEV_LEN"
                    return False

    if svcall.is_single_break and not config.dev_output_candidates:
        if config.dev_filter:
            dev_sv_filter.append("SINGLE_BREAK")
        else:
            svcall.filter = "SINGLE_BREAK"
            return False

    support_overwrite_svlen = 10  # supporting reads above which SVLEN_MIN is waived
    if abs(svcall.svlen) < config.minsvlen and svcall.svtype != 'BND':
        if svcall.support < support_overwrite_svlen or config.minsvlen_hard_cap:
            if config.dev_filter:
                dev_sv_filter.append("SVLEN_MIN")
            else:
                svcall.filter = "SVLEN_MIN"
                return False

    if svcall.svtype == "BND":
        if config.qc_bnd_filter_strand and len(set(lead.strand for lead in svcall.postprocess.cluster.leads)) < 2:
            if config.dev_filter:
                dev_sv_filter.append("STRAND_BND")
            else:
                svcall.filter = "STRAND_BND"
                return False

    upstream_downstream_max_coverage_diff = 0.7
    upstream_downstream_diff = 0.5
    if (svcall.svtype == "DEL" and config.long_del_length != -1 and abs(svcall.svlen) >= config.long_del_length and
            not config.mosaic and abs(svcall.svlen) <= config.dev_longer_del):
        scaled_long_del_coverage = config.long_del_coverage / 2.0
        if svcall.coverage_center > (svcall.coverage_upstream + svcall.coverage_downstream) * scaled_long_del_coverage:
            if svcall.coverage_upstream > svcall.coverage_center > svcall.coverage_downstream:
                if svcall.coverage_downstream / svcall.coverage_upstream < upstream_downstream_max_coverage_diff:
                    if config.dev_filter:
                        dev_sv_filter.append("COV_CHANGE_DEL")
                    else:
                        svcall.filter = "COV_CHANGE_DEL"
                        return False
            elif svcall.coverage_upstream < svcall.coverage_center < svcall.coverage_downstream:
                if svcall.coverage_upstream / svcall.coverage_downstream < upstream_downstream_max_coverage_diff:
                    if config.dev_filter:
                        dev_sv_filter.append("COV_CHANGE_DEL")
                    else:
                        svcall.filter = "COV_CHANGE_DEL"
                        return False
        if svcall.coverage_upstream > svcall.coverage_downstream:
            if (upstream_downstream_diff > svcall.coverage_downstream / svcall.coverage_upstream or
                    svcall.coverage_center > svcall.coverage_downstream):
                if config.dev_filter:
                    dev_sv_filter.append("COV_CHANGE_DEL")
                else:
                    svcall.filter = "COV_CHANGE_DEL"
                    return False
        elif svcall.coverage_upstream < svcall.coverage_downstream:
            if (upstream_downstream_diff > svcall.coverage_upstream / svcall.coverage_downstream or
                    svcall.coverage_upstream < svcall.coverage_center):
                if config.dev_filter:
                    dev_sv_filter.append("COV_CHANGE_DEL")
                else:
                    svcall.filter = "COV_CHANGE_DEL"
                    return False
    elif (svcall.svtype == "DUP" and config.long_dup_length != -1 and abs(svcall.svlen) >= config.long_dup_length and
          not config.mosaic) and abs(svcall.svlen) <= config.dev_longer_dup:
        scaled_long_dup_coverage = config.long_dup_coverage / 2.0
        if svcall.coverage_center < (svcall.coverage_upstream + svcall.coverage_downstream) * scaled_long_dup_coverage:
            if svcall.coverage_upstream > svcall.coverage_center > svcall.coverage_downstream:
                if svcall.coverage_downstream / svcall.coverage_upstream < upstream_downstream_max_coverage_diff:
                    if config.dev_filter:
                        dev_sv_filter.append("COV_CHANGE_DUP")
                    else:
                        svcall.filter = "COV_CHANGE_DUP"
                        return False
            elif svcall.coverage_upstream < svcall.coverage_center < svcall.coverage_downstream:
                if svcall.coverage_upstream / svcall.coverage_downstream < upstream_downstream_max_coverage_diff:
                    if config.dev_filter:
                        dev_sv_filter.append("COV_CHANGE_DUP")
                    else:
                        svcall.filter = "COV_CHANGE_DUP"
                        return False
            if svcall.coverage_upstream > svcall.coverage_downstream:
                if (upstream_downstream_diff > svcall.coverage_downstream / svcall.coverage_upstream or
                        svcall.coverage_center < svcall.coverage_downstream):
                    if config.dev_filter:
                        dev_sv_filter.append("COV_CHANGE_DUP")
                    else:
                        svcall.filter = "COV_CHANGE_DUP"
                        return False
            elif svcall.coverage_upstream < svcall.coverage_downstream:
                if (upstream_downstream_diff > svcall.coverage_upstream / svcall.coverage_downstream or
                        svcall.coverage_upstream > svcall.coverage_center):
                    if config.dev_filter:
                        dev_sv_filter.append("COV_CHANGE_DUP")
                    else:
                        svcall.filter = "COV_CHANGE_DUP"
                        return False
    elif svcall.svtype == "INS" and (svcall.coverage_upstream < config.qc_coverage or
                                     svcall.coverage_downstream < config.qc_coverage):
        if config.dev_filter:
            dev_sv_filter.append("COV_CHANGE_INS")
        else:
            svcall.filter = "COV_CHANGE_INS"
            return False

    # INLINE/SA filter
    if svcall.svtype in ["INS", "DEL"]:
        min_reads = 5
        sa_inline, sap_inline = svcall.postprocess.cluster.sa_counts
        sa_split = svcall.info.get("SUPPORT_SA")
        no_split_sa = sa_split == 0 or sa_split is None
        if sap_inline > config.dev_inline_sa_support_max and sa_inline > min_reads and no_split_sa:
            if config.dev_filter:
                dev_sv_filter.append("INLINE_SA")
            else:
                svcall.filter = "INLINE_SA"
                return False

    qc, val = svcall.qc_coverage_samples()
    svcall.set_info('COVERAGE_VAR', val)
    if not qc:
        if config.dev_filter:
            dev_sv_filter.append("COV_VAR")
        else:
            svcall.filter = "COV_VAR"
            return False

    qc_coverage_max_change_frac = config.qc_coverage_max_change_frac
    if qc_coverage_max_change_frac != -1.0:
        u = float(svcall.coverage_upstream) if svcall.coverage_upstream != 0 else 1.0
        s = float(svcall.coverage_start) if svcall.coverage_start != 0 else 1.0
        c = float(svcall.coverage_center) if svcall.coverage_center != 0 else 1.0
        e = float(svcall.coverage_end) if svcall.coverage_end != 0 else 1.0
        d = float(svcall.coverage_downstream) if svcall.coverage_downstream != 0 else 1.0

        if abs(u - s) / max(u, s) > qc_coverage_max_change_frac:
            if config.dev_filter:
                dev_sv_filter.append("COV_CHANGE_FRAC_US")
            else:
                svcall.filter = "COV_CHANGE_FRAC_US"
                return False
        if abs(s - c) / max(s, c) > qc_coverage_max_change_frac:
            if config.dev_filter:
                dev_sv_filter.append("COV_CHANGE_FRAC_SC")
            else:
                svcall.filter = "COV_CHANGE_FRAC_SC"
                return False
        if abs(c - e) / max(c, e) > qc_coverage_max_change_frac:
            if config.dev_filter:
                dev_sv_filter.append("COV_CHANGE_FRAC_CE")
            else:
                svcall.filter = "COV_CHANGE_FRAC_CE"
                return False
        if abs(e - d) / max(e, d) > qc_coverage_max_change_frac:
            if config.dev_filter:
                dev_sv_filter.append("COV_CHANGE_FRAC_ED")
            else:
                svcall.filter = "COV_CHANGE_FRAC_ED"
                return False

    if config.dev_filter:
        svcall.filter = ";".join(dev_sv_filter)
    return True


def qc_sv_post_annotate(svcall: SVCall, config, coverage_average_total: float,
                        nm_threshold: float | None = None) -> bool:
    """Post-annotation QC including mosaic arms (reference: postprocessing.py:444-600).

    nm_threshold overrides config.qc_nm_threshold (the per-task regional NM
    statistic; passed explicitly so decode-ahead prefetch of the next task
    cannot perturb this task's QC)."""
    dev_sv_filter: list = []
    if config.dev_filter:
        if isinstance(svcall.filter, str):
            if ";" in svcall.filter:
                dev_sv_filter = svcall.filter.split(";")
            else:
                dev_sv_filter = [svcall.filter]

    af = svcall.get_info("VAF")
    af = af if af is not None else 0
    sv_is_mosaic = af <= config.mosaic_af_max

    if ((svcall.coverage_center < config.qc_coverage and
            (len(svcall.genotypes) == 0 or (svcall.genotypes[0][0] != "." and
                                            svcall.genotypes[0][0] + svcall.genotypes[0][1] < 2))) and
            ("DEL" != svcall.svtype and abs(svcall.svlen) > config.long_del_length)):
        if config.dev_filter:
            dev_sv_filter.append("COV_MIN_GT")
        else:
            svcall.filter = "COV_MIN_GT"
            return False

    if config.mosaic and not sv_is_mosaic:
        if not qc_sv_support(svcall, coverage_average_total, config):
            if not config.dev_filter:
                return False

    nm_base = nm_threshold if nm_threshold is not None else config.qc_nm_threshold
    qc_nm = config.qc_nm
    qc_nm_threshold = nm_base * config.qc_nm_mult
    if config.mosaic and sv_is_mosaic:
        qc_nm = config.mosaic_qc_nm
        qc_nm_threshold = nm_base * config.qc_nm_mult
    if qc_nm and svcall.nm > qc_nm_threshold and (len(svcall.genotypes) == 0 or svcall.genotypes[0][1] == 0):
        if config.dev_filter:
            dev_sv_filter.append("ALN_NM")
        else:
            svcall.filter = "ALN_NM"
            return False

    if not config.mosaic and sv_is_mosaic:
        skip_this_dup = "DUP" == svcall.svtype and af >= config.dev_min_dup_vaf
        if not skip_this_dup:
            if config.dev_filter:
                dev_sv_filter.append("MOSAIC_VAF")
            else:
                svcall.filter = "MOSAIC_VAF"
                return False

    if config.mosaic and sv_is_mosaic:
        stdev_pos = svcall.info.get("STDEV_POS")
        stdev_len = svcall.info.get("STDEV_LEN")
        svlen = svcall.info.get("SVLEN", 1)
        min_mosaic_support = config.mosaic_min_reads
        max_stdev_to_svlen_ratio = 0.1
        max_stdev_pos_difference = 5
        if stdev_pos is not None and stdev_len is not None and svcall.svtype in ACCEPTED_SVTYPES:
            filter_low_supp = ((not svcall.precise or stdev_len / abs(svcall.svlen) > max_stdev_to_svlen_ratio or
                                stdev_pos > max_stdev_pos_difference) and abs(svlen) <= config.max_svlen_mosaic)
            min_mosaic_support = config.mosaic_min_reads if (svcall.svtype in ["BND", "INV"] or filter_low_supp) \
                else config.mosaic_min_reads - 1
        if svcall.support < min_mosaic_support:
            if config.dev_filter:
                dev_sv_filter.append("SUPPORT_MIN")
            else:
                svcall.filter = "SUPPORT_MIN"
                return False
        if "BND" != svcall.svtype:
            if abs(svcall.svlen) > config.max_svlen_mosaic:
                if config.dev_filter:
                    dev_sv_filter.append("SVLEN_MAX_MOSAIC")
                else:
                    svcall.filter = "SVLEN_MAX_MOSAIC"
                    return False

    if svcall.svtype != "BND":
        if not (config.mosaic and sv_is_mosaic) and config.qc_strand:
            is_long_ins = (svcall.svtype == "INS" and svcall.svlen >= config.long_ins_length)
            if not is_long_ins and len(set(lead.strand for lead in svcall.postprocess.cluster.leads)) < 2:
                if config.dev_filter:
                    dev_sv_filter.append("STRAND")
                else:
                    svcall.filter = "STRAND"
                    return False
        elif (config.mosaic and sv_is_mosaic) and config.mosaic_qc_strand:
            is_long_ins = (svcall.svtype == "INS" and svcall.svlen >= config.long_ins_length)
            if (not is_long_ins and len(set(lead.strand for lead in svcall.postprocess.cluster.leads)) < 2
                    and svcall.support >= config.mosaic_use_strand_thresholds):
                if config.dev_filter:
                    dev_sv_filter.append("STRAND_MOSAIC")
                else:
                    svcall.filter = "STRAND_MOSAIC"
                    return False

    if config.mosaic and sv_is_mosaic:
        if (svcall.svtype == "INV" or svcall.svtype == "DUP") and svcall.svlen < config.mosaic_qc_invdup_min_length:
            if config.dev_filter:
                dev_sv_filter.append("SVLEN_MIN_MOSAIC")
            else:
                svcall.filter = "SVLEN_MIN_MOSAIC"
                return False

    if svcall.coverage_center < config.qc_coverage and svcall.svtype not in ["DEL", "INS"]:
        if (svcall.svtype == "INV" and svcall.svlen) > config.long_inv_length and not (config.mosaic and sv_is_mosaic):
            pass
        else:
            if config.dev_filter:
                dev_sv_filter.append("COV_MIN")
            else:
                svcall.filter = "COV_MIN"
                return False

    if config.mosaic:
        if sv_is_mosaic and (af < config.mosaic_af_min or af > config.mosaic_af_max):
            if config.dev_filter:
                dev_sv_filter.append("MOSAIC_VAF")
            else:
                svcall.filter = "MOSAIC_VAF"
                return False
        elif not sv_is_mosaic and not config.mosaic_include_germline:
            if config.dev_filter:
                dev_sv_filter.append("NOT_MOSAIC_VAF")
            else:
                svcall.filter = "NOT_MOSAIC_VAF"
                return False
        if sv_is_mosaic and svcall.svtype not in {"BND", "SINGLE_LEFT", "SINGLE_RIGHT"}:
            read_close_edge_count = 0
            for sv_start_read, read_len in [(ld.qry_start, ld.read_len)
                                            for ld in svcall.postprocess.cluster.leads]:
                if (sv_start_read <= config.dev_min_close_edge_dist
                        or abs(read_len - sv_start_read) <= config.dev_min_close_edge_dist):
                    read_close_edge_count += 1
            if float(read_close_edge_count) / svcall.support >= config.dev_min_read_close_edge_prop:
                if config.dev_filter:
                    dev_sv_filter.append("MOSAIC_SV_CLOSE_EDGE")
                else:
                    svcall.filter = "MOSAIC_SV_CLOSE_EDGE"
                    return False

    if config.dev_filter:
        if len(dev_sv_filter) > 1:
            if "PASS" == dev_sv_filter[0]:
                svcall.filter = ";".join(dev_sv_filter[1:])
            else:
                svcall.filter = ";".join(dev_sv_filter)
        elif dev_sv_filter:
            svcall.filter = dev_sv_filter[0]
    return True


def genotype_sv(svcall: SVCall, config, phase: tuple | None = None):
    """Dispatch to the per-type genotyper (reference: postprocessing.py:607-623)."""
    from sniffles_tpu.genotype import GENOTYPER_BY_TYPE, Genotyper

    GENOTYPER_BY_TYPE.get(svcall.svtype, Genotyper)(svcall, config, phase).calculate()

    # hom-alt should skip hp_filter
    try:
        a, b, gq, dr, dv, phase = svcall.genotypes[0]
        if a == b and a == 1 and (phase_info := svcall.get_info("PHASE")):
            hp, ps, hp_supp, ps_supp, hp_filt, ps_filt = phase_info.split(",")
            if "0" != hp:
                hp_filt = "PASS"
                phase = (hp, ps)
                svcall.genotypes[0] = (a, b, gq, dr, dv, phase)
                svcall.set_info("PHASE", f"{hp},{ps},{hp_supp},{ps_supp},{hp_filt},{ps_filt}")
    except KeyError:
        pass


def phase_sv(svcall, config):
    """Derive HP/PS phase from supporting reads (reference: postprocessing.py:626-654)."""
    reads_phases = {lead.read_id: (lead.hap, lead.phase_set)
                    for lead in svcall.postprocess.cluster.leads}
    hp_list = util.most_common(hp for hp, ps in reads_phases.values())
    ps_list = util.most_common(ps for hp, ps in reads_phases.values())

    hp_support, hp = hp_list[0]
    ps_support, ps = ps_list[0]
    if hp is None:
        hp = "NULL"
    if ps is None:
        ps = "NULL"

    other_hp_support = sum(other_supp for other_supp, other_hp in hp_list
                           if other_hp != hp and other_hp != "NULL")
    other_ps_support = sum(other_supp for other_supp, other_ps in ps_list
                           if other_ps != ps and other_ps != "NULL")

    hp_filter = "FAIL"
    if (float(other_hp_support) / (hp_support + other_hp_support) < config.phase_conflict_threshold
            and hp != "NULL" and hp_support > 0):
        hp_filter = "PASS"

    ps_filter = "FAIL"
    if (float(other_ps_support) / (ps_support + other_ps_support) < config.phase_conflict_threshold
            and ps != "NULL" and ps_support > 0):
        ps_filter = "PASS"

    svcall.set_info("PHASE", f"{hp},{ps},{hp_support},{ps_support},{hp_filter},{ps_filter}")
    hp_return = hp if hp in config.phase_identifiers and hp_filter == "PASS" else None
    ps_return = ps if "PASS" == ps_filter else None
    return hp_return, ps_return
