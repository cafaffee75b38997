"""
Vectorized binomial genotyping over candidate batches (device
formulation of genotyping.py:62-241).

Per-type coverage composition, long-INS support rescaling, likelihoods
computed in log10 space with the reference's float-underflow semantics
reproduced (likelihoods below DBL_MIN behave as exactly 0 in the
likelihood-ratio formulas, reference: genotyping.py:36-43).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sniffles_tpu.ops.clustering import (SVTYPE_INS, SVTYPE_DEL, SVTYPE_DUP, SVTYPE_INV)

LOG10_UNDERFLOW = -323.3  # double underflow threshold in log10


def _mean_nonzero(*vals):
    """round(mean of non-zero entries); (0, all_zero_flag) when none."""
    stacked = jnp.stack(vals, axis=0).astype(jnp.float32)
    nz = (stacked != 0).astype(jnp.float32)
    cnt = jnp.sum(nz, axis=0)
    s = jnp.sum(stacked * nz, axis=0)
    mean = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), 0.0)
    return jnp.round(mean), cnt == 0


def rescale_support_batch(svtype, svlen, support, long_ins_length: float,
                          rescale_base: float, rescale_mult: float):
    """(reference: postprocessing.py:162-171)"""
    is_long_ins = (svtype == SVTYPE_INS) & (svlen >= long_ins_length)
    scale = rescale_base + rescale_mult * (svlen.astype(jnp.float32) / long_ins_length)
    rescaled = jnp.round(support.astype(jnp.float32) * scale)
    return jnp.where(is_long_ins, rescaled, support.astype(jnp.float32))


@partial(jax.jit, static_argnames=())
def genotype_batch(svtype: jnp.ndarray,
                   svlen: jnp.ndarray,
                   support: jnp.ndarray,
                   coverage_upstream: jnp.ndarray,
                   coverage_start: jnp.ndarray,
                   coverage_center: jnp.ndarray,
                   coverage_end: jnp.ndarray,
                   coverage_downstream: jnp.ndarray,
                   support_sa: jnp.ndarray,
                   params: dict) -> dict:
    """
    Returns gt_a, gt_b (alleles), gq, zscore, dr, dv, af, gt_failed per
    candidate. `params`: genotype_error, ploidy, long_ins_length,
    rescale_base, rescale_mult, normalization_target.
    """
    err = params["genotype_error"]
    het_p = 1.0 / params["ploidy"]
    norm_target = params["normalization_target"]

    # Per-type support (reference: genotyping.py:186-191 InsertionGenotyper)
    supp = rescale_support_batch(svtype, svlen, support, params["long_ins_length"],
                                 params["rescale_base"], params["rescale_mult"])

    # Per-type coverage (reference: genotyping.py:96-116, 186-233)
    cov_default, fail_default = _mean_nonzero(coverage_start, coverage_center, coverage_end)
    cov_ins, fail_ins = _mean_nonzero(coverage_center)
    cov_dup_base, fail_dup = _mean_nonzero(coverage_start, coverage_end)
    cov_dup = cov_dup_base + jnp.round(0.75 * supp)
    cov_inv_base, fail_inv = _mean_nonzero(coverage_upstream, coverage_downstream)
    cov_inv = cov_inv_base + jnp.round(0.5 * supp)
    cov_del_sa, fail_del_sa = _mean_nonzero(coverage_start + support_sa,
                                            coverage_center + support_sa,
                                            coverage_end + support_sa)
    has_sa = support_sa > 0
    cov_del = jnp.where(has_sa, cov_del_sa, cov_default)
    fail_del = jnp.where(has_sa, fail_del_sa, fail_default)

    coverage = jnp.where(svtype == SVTYPE_INS, cov_ins,
                jnp.where(svtype == SVTYPE_DUP, cov_dup,
                jnp.where(svtype == SVTYPE_INV, cov_inv,
                jnp.where(svtype == SVTYPE_DEL, cov_del, cov_default))))
    gt_failed = jnp.where(svtype == SVTYPE_INS, fail_ins,
                 jnp.where(svtype == SVTYPE_DUP, fail_dup,
                 jnp.where(svtype == SVTYPE_INV, fail_inv,
                 jnp.where(svtype == SVTYPE_DEL, fail_del, fail_default))))

    coverage = jnp.maximum(coverage, supp)  # support > coverage -> coverage = support
    af = supp / jnp.maximum(coverage, 1.0)

    # normalization to 250 (reference: genotyping.py:149-157)
    max_lead = jnp.maximum(supp, coverage)
    norm = jnp.where(max_lead > norm_target, norm_target / jnp.maximum(max_lead, 1.0), 1.0)
    k = jnp.round(supp * norm)
    n = jnp.round(coverage * norm)

    # log10 likelihoods for (0,0), (0,1), (1,1)
    def log10_binom(p):
        return k * jnp.log10(p) + (n - k) * jnp.log10(1.0 - p)

    lq = jnp.stack([log10_binom(jnp.float32(err)),
                    log10_binom(jnp.float32(het_p)),
                    log10_binom(jnp.float32(1.0 - err))], axis=0)  # [3, N]

    order = jnp.argsort(-lq, axis=0)  # best first (ties keep genotype order, as reference sort is stable)
    lq_sorted = jnp.take_along_axis(lq, order, axis=0)
    l1 = lq_sorted[0]
    l2 = lq_sorted[1]
    lz = lq[0]  # hom-ref likelihood

    # Reference underflow semantics: a likelihood below DBL_MIN is exactly
    # 0.0 and likelihood_ratio returns 0 -> quality 0.
    q2_zero = l2 < LOG10_UNDERFLOW
    qz_zero = lz < LOG10_UNDERFLOW
    gq = jnp.where(q2_zero, 0.0, jnp.minimum(60.0, jnp.trunc(-10.0 * (l2 - l1))))
    z = jnp.where(qz_zero, 0.0, jnp.minimum(60.0, jnp.trunc(-10.0 * (lz - l1))))

    best = order[0]  # 0 -> (0,0), 1 -> (0,1), 2 -> (1,1)
    gt_a = jnp.where(best == 2, 1, 0)
    gt_b = jnp.where(best >= 1, 1, 0)

    # DUP VAF override: a DUP with af above the expected single-copy gain
    # reported hom-ref becomes 0/1 (reference: genotyping.py:172-181)
    update_dup = (svtype == SVTYPE_DUP) & (af >= params.get("dev_min_dup_vaf", 1 / 6.0))
    gt_b = jnp.where(update_dup & (best == 0), 1, gt_b)

    dv = supp.astype(jnp.int32)
    dr = (coverage - supp).astype(jnp.int32)

    return {"gt_a": gt_a, "gt_b": gt_b, "gq": gq.astype(jnp.int32),
            "zscore": z.astype(jnp.int32), "dr": dr, "dv": dv, "af": af,
            "gt_failed": gt_failed, "coverage": coverage}
