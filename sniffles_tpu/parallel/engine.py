"""
The fused device pipeline step: signatures -> clusters -> call
statistics -> coverage annotation -> genotypes -> QC, as one jitted
function. This is the flagship compute path of sniffles-tpu (the
device-side replacement for the reference's per-object
cluster.resolve + sv.call_from + postprocessing chain).

Everything is static-shaped: a batch of N signature slots produces N
candidate slots, with per-cluster results stored at cluster indices
[0, n_clusters).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sniffles_tpu.ops.clustering import cluster_signatures, call_statistics
from sniffles_tpu.ops.coverage import annotate_coverage
from sniffles_tpu.ops.genotype_batch import genotype_batch
from sniffles_tpu.ops.qc_batch import qc_batch


def default_params(config=None) -> dict:
    """Scalar parameter dict for the device pipeline, from a SnifflesConfig
    or reference defaults (reference: config.py:449-618)."""
    def g(name, dflt):
        return getattr(config, name, dflt) if config is not None else dflt

    minsupport = g("minsupport", "3")
    is_auto = minsupport == "auto"
    return {
        # clustering
        "cluster_r": float(g("cluster_r", 2.5)),
        "cluster_repeat_h": float(g("cluster_repeat_h", 1.5)),
        "cluster_repeat_h_max": float(g("cluster_repeat_h_max", 1000)),
        "cluster_merge_bnd": int(g("cluster_merge_bnd", 1000)),
        "cluster_merge_len": float(g("cluster_merge_len", 0.22)),
        "minsvlen": int(g("minsvlen", 50)),
        "minsvlen_screen": int(g("minsvlen_screen", 45)),
        "minsvlen_hard_cap": int(bool(g("minsvlen_hard_cap", True))),
        # genotyping
        "genotype_error": float(g("genotype_error", 0.05)),
        "ploidy": float(g("genotype_ploidy", 2)),
        "normalization_target": 250.0,
        "genotype_min_z_score": float(g("genotype_min_z_score", 5)),
        "long_ins_length": float(g("long_ins_length", 2500)),
        "rescale_base": float(g("long_ins_rescale_base", 1.66)),
        "rescale_mult": float(g("long_ins_rescale_mult", 0.33)),
        "detect_large_ins": int(bool(g("detect_large_ins", True))),
        # QC
        "qc_stdev": int(bool(g("qc_stdev", True))),
        "qc_stdev_abs_max": float(g("qc_stdev_abs_max", 500)),
        "qc_strand": int(bool(g("qc_strand", False))),
        "qc_bnd_filter_strand": int(bool(g("qc_bnd_filter_strand", True))),
        "qc_coverage": float(g("qc_coverage", 1)),
        "long_del_length": float(g("long_del_length", 50000)),
        "long_del_coverage": float(g("long_del_coverage", 0.66)),
        "long_dup_length": float(g("long_dup_length", 50000)),
        "long_dup_coverage": float(g("long_dup_coverage", 1.33)),
        "long_inv_length": float(g("long_inv_length", 10000)),
        "dev_longer_del": float(g("dev_longer_del", 200000)),
        "dev_longer_dup": float(g("dev_longer_dup", 200000)),
        "qc_nm": int(bool(g("qc_nm", False))),
        "qc_nm_threshold": float(g("qc_nm_threshold", 0.0)),
        "qc_nm_mult": float(g("qc_nm_mult", 1.66)),
        "dev_min_dup_vaf": float(g("dev_min_dup_vaf", 1 / 6.0)),
        "minsupport_is_auto": int(is_auto),
        "minsupport_const": float(minsupport if not is_auto else 0),
        "minsupport_auto_base": float(g("minsupport_auto_base", 1.5)),
        "minsupport_auto_mult": float(g("minsupport_auto_mult", 0.1)),
        "minsupport_auto_regional_coverage_weight": float(
            g("minsupport_auto_regional_coverage_weight", 0.75)),
        "coverage_global": 30.0,  # overwritten per shard at runtime
        # mosaic
        "mosaic": int(bool(g("mosaic", False))),
        "mosaic_af_min": float(g("mosaic_af_min", 0.05)),
        "mosaic_af_max": float(g("mosaic_af_max", 0.218)),
        "mosaic_min_reads": float(g("mosaic_min_reads", 3)),
        "mosaic_use_strand_thresholds": float(g("mosaic_use_strand_thresholds", 10)),
        "mosaic_qc_strand": int(bool(g("mosaic_qc_strand", True))),
        "mosaic_qc_invdup_min_length": float(g("mosaic_qc_invdup_min_length", 500)),
        "max_svlen_mosaic": float(g("max_svlen_mosaic", 50000)),
        "mosaic_include_germline": int(bool(g("mosaic_include_germline", False))),
    }


@partial(jax.jit, static_argnames=("binsize", "resplit_binsize"))
def call_pipeline_step(sig: dict, coverage: jnp.ndarray, params: dict,
                       region_offset=0, binsize: int = 100,
                       resplit_binsize: int = 20) -> dict:
    """
    One fused calling step over a signature batch.

    sig: signature arrays (SignatureBatch.as_dict, device-resident)
    coverage: int32 coverage array for the shard's genome window
    params: default_params() dict (traced scalars; one compile serves
            all parameter settings)

    Returns candidate arrays [N] (valid for cluster ids < n_clusters):
    svtype, pos, end, svlen, support, qual, stdev_pos, stdev_len,
    gt_(a,b), gq, dr, dv, af, filter_code, qc, precise.
    """
    clustered = cluster_signatures(
        sig,
        cluster_r=params["cluster_r"],
        cluster_repeat_h=params["cluster_repeat_h"],
        cluster_repeat_h_max=params["cluster_repeat_h_max"],
        cluster_merge_bnd=params["cluster_merge_bnd"],
        cluster_merge_len=params["cluster_merge_len"],
        minsvlen=params["minsvlen"],
        binsize=binsize,
        resplit_binsize=resplit_binsize,
        # fused fast path: the parallel relaxation (documented
        # deviation); the production call path uses the exact sweep
        exact_sweep=False,
    )

    stats = call_statistics(clustered)
    n = stats["svtype"].shape[0]
    cluster_valid = jnp.arange(n) < stats["n_clusters"]

    # split-read support per cluster (reference: sv.py:580-581 counts
    # source != INLINE leads into SUPPORT_SA for the DEL genotyper)
    from sniffles_tpu.ops.segments import seg_sum
    sa = clustered.get("sa")
    support_sa = (seg_sum(jnp.where(clustered["valid"] & sa, 1, 0),
                          clustered["cluster_id"], n)
                  if sa is not None else jnp.zeros_like(stats["support"]))

    # length screen (reference: sv.py:511-515)
    is_sv = (stats["svtype"] >= 0) & (stats["svtype"] <= 3)
    length_ok = ~is_sv | (jnp.abs(stats["svlen"]) >= params["minsvlen_screen"])
    cluster_valid = cluster_valid & length_ok & (stats["lead_count"] > 0)

    cov = annotate_coverage(coverage, stats["svtype"], stats["pos"], stats["svlen"],
                            bnd_is_first=jnp.zeros_like(stats["svtype"], dtype=bool),
                            region_offset=region_offset, binsize=binsize)
    stats.update(cov)

    gt = genotype_batch(stats["svtype"], stats["svlen"], stats["support"],
                        cov["coverage_upstream"], cov["coverage_start"],
                        cov["coverage_center"], cov["coverage_end"],
                        cov["coverage_downstream"],
                        support_sa=support_sa,
                        params=params)

    qc = qc_batch(stats, gt, params)

    precise = (stats["stdev_pos"] + stats["stdev_len"]) < 25.0

    out = dict(stats)
    out.update(gt)
    out.update(qc)
    out["precise"] = precise
    out["cluster_valid"] = cluster_valid
    return out
