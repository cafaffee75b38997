"""
Segment primitives for the device clustering pipeline.

The TPU formulation of clustering (SURVEY §7.1): sort signatures by
(svtype, pos), mark segment boundaries, and reduce per-segment
statistics with static-shaped segment ops. All functions here are
jit-compatible, operate on [N] arrays with a static upper bound of N
segments, and produce results aligned to element slots (values
meaningful at segment heads).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_ids_from_boundaries(boundary: jnp.ndarray) -> jnp.ndarray:
    """boundary[i]=True marks the start of a new segment; returns int32 ids."""
    return jnp.cumsum(boundary.astype(jnp.int32)) - 1


def seg_sum(x: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(x, seg_ids, num_segments=num_segments)


def seg_max(x: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_max(x, seg_ids, num_segments=num_segments)


def seg_min(x: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_min(x, seg_ids, num_segments=num_segments)


def seg_count(seg_ids: jnp.ndarray, valid: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return seg_sum(valid.astype(jnp.int32), seg_ids, num_segments)


def rank_in_segment(seg_ids: jnp.ndarray) -> jnp.ndarray:
    """0-based rank of each element within its segment (requires seg_ids
    sorted ascending)."""
    n = seg_ids.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.array([True]), seg_ids[1:] != seg_ids[:-1]])
    start_idx = jnp.where(is_start, idx, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, start_idx)
    return idx - seg_start


def seg_mean(x: jnp.ndarray, seg_ids: jnp.ndarray, valid: jnp.ndarray,
             num_segments: int) -> jnp.ndarray:
    cnt = seg_count(seg_ids, valid, num_segments)
    s = seg_sum(jnp.where(valid, x, 0).astype(jnp.float32), seg_ids, num_segments)
    return s / jnp.maximum(cnt, 1).astype(jnp.float32)


def seg_stdev(x: jnp.ndarray, seg_ids: jnp.ndarray, valid: jnp.ndarray,
              num_segments: int) -> jnp.ndarray:
    """Sample standard deviation per segment (ddof=1; 0 for <2 elements),
    matching util.stdev semantics (reference: util.py:25-27).

    Values are centered on the segment minimum before the moment
    computation: genome coordinates (~1e8-1e9) squared overflow the f32
    mantissa and would destroy the variance otherwise.
    """
    shift = jax.ops.segment_min(jnp.where(valid, x, 2 ** 31 - 1).astype(jnp.int32),
                                seg_ids, num_segments=num_segments)
    xc = (x.astype(jnp.int64) - jnp.take(shift, seg_ids)).astype(jnp.float32)
    cnt = seg_count(seg_ids, valid, num_segments).astype(jnp.float32)
    xf = jnp.where(valid, xc, 0.0)
    s1 = seg_sum(xf, seg_ids, num_segments)
    s2 = seg_sum(xf * xf, seg_ids, num_segments)
    mean = s1 / jnp.maximum(cnt, 1)
    var = (s2 - cnt * mean * mean) / jnp.maximum(cnt - 1, 1)
    var = jnp.maximum(var, 0.0)
    return jnp.where(cnt >= 2, jnp.sqrt(var), 0.0)


def run_starts(seg_ids: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """True where a run of equal (seg_id, value) starts (input sorted by
    (seg_id, value))."""
    first = jnp.ones((1,), dtype=bool)
    rest = (seg_ids[1:] != seg_ids[:-1]) | (values[1:] != values[:-1])
    return jnp.concatenate([first, rest])


def unique_count_per_segment(seg_ids_sorted: jnp.ndarray, values_sorted: jnp.ndarray,
                             valid_sorted: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Number of distinct values per segment (inputs sorted by (seg, value));
    used for support = unique read names (reference: sv.py:520)."""
    starts = run_starts(seg_ids_sorted, values_sorted) & valid_sorted
    return seg_sum(starts.astype(jnp.int32), seg_ids_sorted, num_segments)
