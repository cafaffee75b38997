"""
Device coverage: segment-sum accumulation of read intervals into a
per-base (or binned) coverage array, replacing the host numpy
`coverage[start:end] += 1` loop (reference: leadprov.py:451,510), and
5-point coverage annotation per candidate (reference:
postprocessing.py:69-130).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sniffles_tpu.ops.clustering import SVTYPE_INS, SVTYPE_BND, SVTYPE_DEL


@partial(jax.jit, static_argnames=("length",))
def coverage_from_intervals(starts: jnp.ndarray, ends: jnp.ndarray, valid: jnp.ndarray,
                            length: int) -> jnp.ndarray:
    """
    Coverage over [0, length) from read intervals via the difference-array
    trick: +1 at start, -1 at end, prefix sum. O(reads + length).
    """
    starts = jnp.clip(jnp.where(valid, starts, 0), 0, length)
    ends = jnp.clip(jnp.where(valid, ends, 0), 0, length)
    diff = jnp.zeros((length + 1,), dtype=jnp.int32)
    diff = diff.at[starts].add(jnp.where(valid, 1, 0))
    diff = diff.at[ends].add(jnp.where(valid, -1, 0))
    return jnp.cumsum(diff[:length])


@partial(jax.jit, static_argnames=("binsize", "updown_bins"))
def annotate_coverage(coverage: jnp.ndarray,
                      svtype: jnp.ndarray,
                      pos: jnp.ndarray,
                      svlen: jnp.ndarray,
                      bnd_is_first: jnp.ndarray,
                      region_offset: int | jnp.ndarray = 0,
                      binsize: int = 100,
                      updown_bins: int = 5) -> dict:
    """
    5-point coverage per candidate (upstream/start/center/end/downstream),
    mirroring the index arithmetic of postprocessing.coverage; indexes
    outside the array yield 0 (reference logs and leaves the default 0).
    """
    length = coverage.shape[0]

    start = pos - region_offset
    start = jnp.where((svtype == SVTYPE_BND) & bnd_is_first, start - 1, start)
    end = jnp.where(svtype == SVTYPE_INS, start + 1,
                    jnp.where(svtype == SVTYPE_BND, start, start + jnp.abs(svlen)))

    def sample(idx):
        ok = (idx >= 0) & (idx < length)
        return jnp.where(ok, jnp.take(coverage, jnp.clip(idx, 0, length - 1)), 0)

    ins_or_bnd = (svtype == SVTYPE_INS) | (svtype == SVTYPE_BND)
    cov_start = jnp.where(ins_or_bnd, sample(start - binsize), sample(start))
    cov_center = jnp.where(ins_or_bnd, sample(start), sample((start + end) // 2))
    cov_end = jnp.where(ins_or_bnd, sample(end + binsize), sample(end - binsize))
    cov_up = sample(start - binsize * updown_bins)
    cov_down = sample(end + binsize * updown_bins)

    return {"coverage_upstream": cov_up, "coverage_start": cov_start,
            "coverage_center": cov_center, "coverage_end": cov_end,
            "coverage_downstream": cov_down}
