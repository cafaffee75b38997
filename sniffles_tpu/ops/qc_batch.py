"""
Vectorized QC cascade (device formulation of postprocessing.py:133-600).

The filter string of the FIRST failing check is part of the output
contract; filters are evaluated in reference order and the first
failing code is selected per candidate with a priority chain.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from sniffles_tpu.ops.clustering import (SVTYPE_INS, SVTYPE_DEL, SVTYPE_DUP, SVTYPE_INV,
                                         SVTYPE_BND, SVTYPE_SINGLE_LEFT, SVTYPE_SINGLE_RIGHT)
from sniffles_tpu.ops.genotype_batch import rescale_support_batch

# Filter codes, 0 = PASS. Order here is just an enumeration; application
# order is the cascade below.
FILTERS = ["PASS", "STDEV_POS", "STDEV_LEN", "SINGLE_BREAK", "SVLEN_MIN", "STRAND_BND",
           "COV_CHANGE_DEL", "COV_CHANGE_DUP", "COV_CHANGE_INS", "SUPPORT_MIN",
           "COV_MIN_GT", "ALN_NM", "MOSAIC_VAF", "SVLEN_MAX_MOSAIC", "STRAND",
           "STRAND_MOSAIC", "SVLEN_MIN_MOSAIC", "COV_MIN", "NOT_MOSAIC_VAF", "GT",
           "GT_FAILED"]
FILTER_CODES = {name: i for i, name in enumerate(FILTERS)}


def _first_fail(*checks):
    """checks: list of (fail_mask, code). Returns the first failing code, 0 otherwise."""
    code = jnp.zeros_like(checks[0][0], dtype=jnp.int32)
    for fail, c in reversed(checks):
        code = jnp.where(fail, jnp.int32(c), code)
    # reversed+where gives the FIRST entry priority
    return code


@jax.jit
def qc_batch(stats: dict, gt: dict, params: dict) -> dict:
    """
    Main QC + post-annotate QC cascade over candidate batches.

    `stats`: output of call_statistics (+ coverage_* arrays added).
    `gt`: output of genotype_batch.
    `params`: scalar thresholds mirroring SnifflesConfig.
    Returns filter codes [N] (0=PASS) and the qc mask.
    """
    svtype = stats["svtype"]
    svlen = stats["svlen"]
    abs_svlen = jnp.abs(svlen)
    support = stats["support"]
    stdev_pos = stats["stdev_pos"]
    stdev_len = stats["stdev_len"]
    cov_u = stats["coverage_upstream"].astype(jnp.float32)
    cov_s = stats["coverage_start"].astype(jnp.float32)
    cov_c = stats["coverage_center"].astype(jnp.float32)
    cov_e = stats["coverage_end"].astype(jnp.float32)
    cov_d = stats["coverage_downstream"].astype(jnp.float32)

    is_bnd = svtype == SVTYPE_BND
    is_single = (svtype == SVTYPE_SINGLE_LEFT) | (svtype == SVTYPE_SINGLE_RIGHT)
    not_bnd_single = ~is_bnd & ~is_single
    safe_len = jnp.maximum(abs_svlen.astype(jnp.float32), 1.0)

    # --- qc_sv (reference: postprocessing.py:200-441) ---
    f_stdev_pos = (stdev_pos > params["qc_stdev_abs_max"]) | \
                  (not_bnd_single & (stdev_pos / safe_len > 2.0))
    f_stdev_len = (stdev_len != 0) & (
        (~is_bnd & (stdev_len / safe_len > 1.0)) | (stdev_len > params["qc_stdev_abs_max"]))
    f_stdev_pos = f_stdev_pos & (params["qc_stdev"] > 0)
    f_stdev_len = f_stdev_len & (params["qc_stdev"] > 0)

    f_single = is_single

    f_svlen_min = (abs_svlen < params["minsvlen"]) & ~is_bnd & (
        (support < 10) | (params["minsvlen_hard_cap"] > 0))

    f_strand_bnd = is_bnd & (params["qc_bnd_filter_strand"] > 0) & (stats["n_strands"] < 2)

    # long DEL / DUP central coverage checks
    updown_max_diff = 0.7
    updown_diff = 0.5
    long_del = (svtype == SVTYPE_DEL) & (abs_svlen >= params["long_del_length"]) & \
               (params["mosaic"] == 0) & (abs_svlen <= params["dev_longer_del"])
    del_c1 = cov_c > (cov_u + cov_d) * (params["long_del_coverage"] / 2.0)
    slope_dn = (cov_u > cov_c) & (cov_c > cov_d)
    slope_up = (cov_u < cov_c) & (cov_c < cov_d)
    del_slope_fail = (slope_dn & (cov_d / jnp.maximum(cov_u, 1e-6) < updown_max_diff)) | \
                     (slope_up & (cov_u / jnp.maximum(cov_d, 1e-6) < updown_max_diff))
    del_ud_fail = jnp.where(
        cov_u > cov_d,
        (updown_diff > cov_d / jnp.maximum(cov_u, 1e-6)) | (cov_c > cov_d),
        jnp.where(cov_u < cov_d,
                  (updown_diff > cov_u / jnp.maximum(cov_d, 1e-6)) | (cov_u < cov_c),
                  False))
    f_cov_del = long_del & ((del_c1 & del_slope_fail) | del_ud_fail)

    long_dup = (svtype == SVTYPE_DUP) & (abs_svlen >= params["long_dup_length"]) & \
               (params["mosaic"] == 0) & (abs_svlen <= params["dev_longer_dup"])
    dup_c1 = cov_c < (cov_u + cov_d) * (params["long_dup_coverage"] / 2.0)
    dup_ud_fail = jnp.where(
        cov_u > cov_d,
        (updown_diff > cov_d / jnp.maximum(cov_u, 1e-6)) | (cov_c < cov_d),
        jnp.where(cov_u < cov_d,
                  (updown_diff > cov_u / jnp.maximum(cov_d, 1e-6)) | (cov_u > cov_c),
                  False))
    f_cov_dup = long_dup & dup_c1 & (del_slope_fail | dup_ud_fail)

    f_cov_ins = (svtype == SVTYPE_INS) & (
        (cov_u < params["qc_coverage"]) | (cov_d < params["qc_coverage"]))

    # --- support filter (reference: postprocessing.py:133-197) ---
    supp_rescaled = rescale_support_batch(svtype, svlen, support, params["long_ins_length"],
                                          params["rescale_base"], params["rescale_mult"])
    cov_reg_ud, ud_zero = jnp.sum(jnp.stack([cov_u, cov_d]) * (jnp.stack([cov_u, cov_d]) != 0),
                                  axis=0), (cov_u == 0) & (cov_d == 0)
    n_ud = (cov_u != 0).astype(jnp.float32) + (cov_d != 0).astype(jnp.float32)
    cov_regional = jnp.where(n_ud > 0, jnp.round(cov_reg_ud / jnp.maximum(n_ud, 1)), 0)
    sce = jnp.stack([cov_s, cov_c, cov_e])
    n_sce = jnp.sum((sce != 0).astype(jnp.float32), axis=0)
    cov_sce = jnp.where(n_sce > 0, jnp.round(jnp.sum(sce * (sce != 0), axis=0) / jnp.maximum(n_sce, 1)), 0)
    cov_regional = jnp.where(n_ud > 0, cov_regional, cov_sce)
    cov_regional = jnp.where(cov_regional == 0, params["coverage_global"], cov_regional)
    w = params["minsupport_auto_regional_coverage_weight"]
    cov_blend = cov_regional * w + params["coverage_global"] * (1.0 - w)
    min_support_auto = jnp.round(params["minsupport_auto_base"]
                                 + params["minsupport_auto_mult"] * cov_blend)
    min_support = jnp.where(params["minsupport_is_auto"] > 0, min_support_auto,
                            params["minsupport_const"])
    f_support = jnp.where(params["minsupport_is_auto"] > 0,
                          supp_rescaled < min_support,
                          support.astype(jnp.float32) < min_support)
    f_support = f_support & (params["mosaic"] == 0)

    # --- qc_sv_post_annotate (reference: postprocessing.py:444-600) ---
    af = gt["af"]
    sv_is_mosaic = af <= params["mosaic_af_max"]
    gt_sum = gt["gt_a"] + gt["gt_b"]

    f_cov_min_gt = (cov_c < params["qc_coverage"]) & (gt_sum < 2) & \
                   (~(svtype == SVTYPE_DEL)) & (abs_svlen > params["long_del_length"])

    f_nm = (params["qc_nm"] > 0) & (stats["nm"] > params["qc_nm_threshold"] * params["qc_nm_mult"]) & \
           (gt["gt_b"] == 0)

    skip_dup = (svtype == SVTYPE_DUP) & (af >= params["dev_min_dup_vaf"])
    f_mosaic_vaf_germ = (params["mosaic"] == 0) & sv_is_mosaic & ~skip_dup

    mosaic_on = params["mosaic"] > 0
    f_mosaic_support = mosaic_on & sv_is_mosaic & (support < params["mosaic_min_reads"])
    f_mosaic_len = mosaic_on & sv_is_mosaic & ~is_bnd & (abs_svlen > params["max_svlen_mosaic"])

    is_long_ins = (svtype == SVTYPE_INS) & (svlen >= params["long_ins_length"])
    f_strand = (params["qc_strand"] > 0) & ~(mosaic_on & sv_is_mosaic) & ~is_bnd & \
               ~is_long_ins & (stats["n_strands"] < 2)
    f_strand_mosaic = mosaic_on & sv_is_mosaic & (params["mosaic_qc_strand"] > 0) & ~is_bnd & \
                      ~is_long_ins & (stats["n_strands"] < 2) & \
                      (support >= params["mosaic_use_strand_thresholds"])

    f_mosaic_invdup = mosaic_on & sv_is_mosaic & \
                      ((svtype == SVTYPE_INV) | (svtype == SVTYPE_DUP)) & \
                      (svlen < params["mosaic_qc_invdup_min_length"])

    long_inv_exempt = (svtype == SVTYPE_INV) & (svlen > params["long_inv_length"]) & \
                      ~(mosaic_on & sv_is_mosaic)
    f_cov_min = (cov_c < params["qc_coverage"]) & \
                ~((svtype == SVTYPE_DEL) | (svtype == SVTYPE_INS)) & ~long_inv_exempt

    f_mosaic_window = mosaic_on & sv_is_mosaic & \
                      ((af < params["mosaic_af_min"]) | (af > params["mosaic_af_max"]))
    f_not_mosaic = mosaic_on & ~sv_is_mosaic & (params["mosaic_include_germline"] == 0)

    f_gt = (gt["zscore"] < params["genotype_min_z_score"]) & (params["mosaic"] == 0) & \
           ~(is_long_ins & (params["detect_large_ins"] > 0)) & ~skip_dup

    code = _first_fail(
        (f_stdev_pos, FILTER_CODES["STDEV_POS"]),
        (f_stdev_len, FILTER_CODES["STDEV_LEN"]),
        (f_single, FILTER_CODES["SINGLE_BREAK"]),
        (f_svlen_min, FILTER_CODES["SVLEN_MIN"]),
        (f_strand_bnd, FILTER_CODES["STRAND_BND"]),
        (f_cov_del, FILTER_CODES["COV_CHANGE_DEL"]),
        (f_cov_dup, FILTER_CODES["COV_CHANGE_DUP"]),
        (f_cov_ins, FILTER_CODES["COV_CHANGE_INS"]),
        (f_support, FILTER_CODES["SUPPORT_MIN"]),
        (gt["gt_failed"], FILTER_CODES["GT_FAILED"]),
        (f_gt, FILTER_CODES["GT"]),
        (f_cov_min_gt, FILTER_CODES["COV_MIN_GT"]),
        (f_nm, FILTER_CODES["ALN_NM"]),
        (f_mosaic_vaf_germ, FILTER_CODES["MOSAIC_VAF"]),
        (f_mosaic_support, FILTER_CODES["SUPPORT_MIN"]),
        (f_mosaic_len, FILTER_CODES["SVLEN_MAX_MOSAIC"]),
        (f_strand, FILTER_CODES["STRAND"]),
        (f_strand_mosaic, FILTER_CODES["STRAND_MOSAIC"]),
        (f_mosaic_invdup, FILTER_CODES["SVLEN_MIN_MOSAIC"]),
        (f_cov_min, FILTER_CODES["COV_MIN"]),
        (f_mosaic_window, FILTER_CODES["MOSAIC_VAF"]),
        (f_not_mosaic, FILTER_CODES["NOT_MOSAIC_VAF"]),
    )

    return {"filter_code": code, "qc": code == 0}
