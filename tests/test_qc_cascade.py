"""
QC cascade fidelity: each filter arm of qc_sv / qc_sv_post_annotate
fires with the right filter string, in reference order
(reference: postprocessing.py:200-600 — the first failing check's name
is part of the output contract).
"""
from dataclasses import dataclass, field

import pytest

from sniffles_tpu import postprocess as pp
from sniffles_tpu.config import SnifflesConfig
from sniffles_tpu.svcall import SVCall, SVCallPostprocessingInfo
from sniffles_tpu.cluster import Cluster
from sniffles_tpu.leads import Lead


@pytest.fixture()
def config():
    return SnifflesConfig("--input", "x.bam", "--vcf", "y.vcf")


def make_call(config, svtype="DEL", pos=100_000, svlen=-200, support=20,
              stdev_pos=2.0, stdev_len=2.0, cov=(30, 30, 30, 30, 30),
              strands=("+", "-"), nm=-1, n_leads=None):
    leads = []
    n_leads = n_leads or support
    for i in range(n_leads):
        leads.append(Lead(read_id=i, read_qname=f"r{i}", contig="chr1", ref_start=pos,
                          ref_end=pos, qry_start=2000, qry_end=2000,
                          strand=strands[i % len(strands)], mapq=60, nm=0.01,
                          source="INLINE", svtype=svtype, svlen=svlen, read_len=10_000))
    cluster = Cluster(id="t", svtype=svtype, contig="chr1", start=pos, end=pos + 100,
                      seed=pos, leads=leads, repeat=False,
                      leads_long=[] if svtype == "INS" else None,
                      hap_counts=(0, 0, 0, 0, 0, 0))
    cluster.get_sa_count()
    call = SVCall(contig="chr1", pos=pos, id="t1", ref="N", alt=f"<{svtype}>", qual=50,
                  filter="PASS", info={"STDEV_POS": stdev_pos, "STDEV_LEN": stdev_len},
                  svtype=svtype, svlen=svlen, end=pos + abs(svlen), genotypes={},
                  precise=True, support=support, rnames=[l.read_qname for l in leads],
                  qc=True, nm=nm, postprocess=SVCallPostprocessingInfo(cluster=cluster),
                  fwd=sum(1 for l in leads if l.strand == "+"),
                  rev=sum(1 for l in leads if l.strand == "-"),
                  coverage_upstream=cov[0], coverage_start=cov[1], coverage_center=cov[2],
                  coverage_end=cov[3], coverage_downstream=cov[4])
    if svtype == "DEL":
        call.set_info("SUPPORT_SA", 0)
    return call


# --- qc_sv arms ---

def test_pass(config):
    call = make_call(config)
    assert pp.qc_sv(call, config)
    assert call.filter == "PASS"


def test_stdev_pos_abs(config):
    call = make_call(config, stdev_pos=600.0)
    assert not pp.qc_sv(call, config)
    assert call.filter == "STDEV_POS"


def test_stdev_pos_relative(config):
    call = make_call(config, svlen=-60, stdev_pos=150.0)
    assert not pp.qc_sv(call, config)
    assert call.filter == "STDEV_POS"


def test_stdev_len_relative(config):
    call = make_call(config, svlen=-60, stdev_len=80.0)
    assert not pp.qc_sv(call, config)
    assert call.filter == "STDEV_LEN"


def test_svlen_min(config):
    call = make_call(config, svlen=-30, support=5)
    assert not pp.qc_sv(call, config)
    assert call.filter == "SVLEN_MIN"


def test_svlen_min_waived_by_support(config):
    # soft minsvlen (~50): >=10 supporting reads waive the filter
    call = make_call(config, svlen=-48, support=15)
    assert pp.qc_sv(call, config)


def test_strand_bnd(config):
    call = make_call(config, svtype="BND", svlen=0, strands=("+",))
    call.info.pop("STDEV_LEN")
    call.info["STDEV_POS"] = 1.0
    assert not pp.qc_sv(call, config)
    assert call.filter == "STRAND_BND"


def test_cov_change_del_long(config):
    # no central drop AND downstream lower than center -> filtered
    call = make_call(config, svlen=-60_000, cov=(30, 30, 28, 28, 20))
    assert not pp.qc_sv(call, config)
    assert call.filter == "COV_CHANGE_DEL"


def test_cov_change_del_flat_coverage_passes(config):
    # symmetric flat coverage takes none of the filter arms
    call = make_call(config, svlen=-60_000, cov=(30, 30, 28, 30, 30))
    assert pp.qc_sv(call, config)


def test_cov_change_del_passes_with_drop(config):
    call = make_call(config, svlen=-60_000, cov=(30, 15, 2, 15, 30))
    assert pp.qc_sv(call, config)


def test_cov_change_ins_zero_flanks(config):
    call = make_call(config, svtype="INS", svlen=200, cov=(0, 30, 30, 30, 0))
    assert not pp.qc_sv(call, config)
    assert call.filter == "COV_CHANGE_INS"


def test_inline_sa(config):
    call = make_call(config, support=10)
    for ld in call.postprocess.cluster.leads:
        ld.is_sa = True
    call.postprocess.cluster.get_sa_count()
    call.set_info("SUPPORT_SA", 0)
    assert not pp.qc_sv(call, config)
    assert call.filter == "INLINE_SA"


# --- support filter ---

def test_support_min_const(config):
    call = make_call(config, support=2)
    assert not pp.qc_sv_support(call, 30.0, config)
    assert call.filter == "SUPPORT_MIN"


def test_support_auto(config):
    config.minsupport = "auto"
    # auto threshold = round(1.5 + 0.1 * blended coverage) = round(4.5) = 4
    # at 30x (banker's rounding)
    call = make_call(config, support=3)
    assert not pp.qc_sv_support(call, 30.0, config)
    call = make_call(config, support=4)
    assert pp.qc_sv_support(call, 30.0, config)


# --- qc_sv_post_annotate arms ---

def _genotyped(config, call, a=1, b=1):
    call.genotypes[0] = (a, b, 60, 0, call.support, (None, None))
    call.set_info("VAF", call.support / 30.0)
    return call


def test_post_pass(config):
    call = _genotyped(config, make_call(config, support=28))
    assert pp.qc_sv_post_annotate(call, config, 30.0)


def test_mosaic_vaf_germline(config):
    call = _genotyped(config, make_call(config, support=4), a=0, b=1)
    call.set_info("VAF", 4 / 30.0)  # below mosaic_af_max 0.218
    assert not pp.qc_sv_post_annotate(call, config, 30.0)
    assert call.filter == "MOSAIC_VAF"


def test_aln_nm(config):
    config.qc_nm = True
    config.qc_nm_threshold = 0.01
    call = _genotyped(config, make_call(config, support=28, nm=0.5), a=0, b=0)
    call.set_info("VAF", 28 / 30.0)
    assert not pp.qc_sv_post_annotate(call, config, 30.0)
    assert call.filter == "ALN_NM"


def test_strand_filter(config):
    config.qc_strand = True
    call = _genotyped(config, make_call(config, support=25, strands=("+",)))
    call.set_info("VAF", 25 / 30.0)
    assert not pp.qc_sv_post_annotate(call, config, 30.0)
    assert call.filter == "STRAND"


def test_cov_min_inv(config):
    call = _genotyped(config, make_call(config, svtype="INV", svlen=500, support=28,
                                        cov=(30, 30, 0, 30, 30)))
    call.set_info("VAF", 28 / 30.0)
    assert not pp.qc_sv_post_annotate(call, config, 30.0)
    assert call.filter == "COV_MIN"


def test_mosaic_mode_window(config):
    config.mosaic = True
    call = _genotyped(config, make_call(config, support=1), a=0, b=1)
    call.set_info("VAF", 1 / 30.0)  # below mosaic_af_min 0.05
    assert not pp.qc_sv_post_annotate(call, config, 30.0)
    assert call.filter in ("SUPPORT_MIN", "MOSAIC_VAF")


def test_mosaic_svlen_max(config):
    config.mosaic = True
    call = _genotyped(config, make_call(config, svlen=-80_000, support=4), a=0, b=1)
    call.set_info("VAF", 0.15)
    assert not pp.qc_sv_post_annotate(call, config, 30.0)
    assert call.filter == "SVLEN_MAX_MOSAIC"


def test_not_mosaic_vaf(config):
    config.mosaic = True
    call = _genotyped(config, make_call(config, support=28))
    call.set_info("VAF", 0.9)
    assert not pp.qc_sv_post_annotate(call, config, 30.0)
    assert call.filter == "NOT_MOSAIC_VAF"


def test_mosaic_include_germline_keeps_germline(config):
    config.mosaic = True
    config.mosaic_include_germline = True
    call = _genotyped(config, make_call(config, support=28))
    call.set_info("VAF", 0.9)
    assert pp.qc_sv_post_annotate(call, config, 30.0)


def test_mosaic_close_edge(config):
    config.mosaic = True
    call = _genotyped(config, make_call(config, support=5), a=0, b=1)
    call.set_info("VAF", 0.15)
    for ld in call.postprocess.cluster.leads:
        ld.qry_start = 10  # SV right at the read edge
    assert not pp.qc_sv_post_annotate(call, config, 30.0)
    assert call.filter == "MOSAIC_SV_CLOSE_EDGE"


def test_dev_filter_collects_all(config):
    config.dev_filter = True
    call = make_call(config, svlen=-30, support=5, stdev_pos=600.0)
    pp.qc_sv(call, config)
    parts = call.filter.split(";")
    assert "STDEV_POS" in parts and "SVLEN_MIN" in parts
