"""
Batched robust statistics over segments (device formulation of
util.center / util.trim / util.stdev, reference: util.py:25-103).

All functions take arrays sorted by (segment, value) plus the segment
ids, and return per-segment results in [num_segments]-shaped arrays.
Exactness against the scalar host implementations is covered by
tests/test_device_stats.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from sniffles_tpu.ops.segments import (seg_sum, seg_max, seg_count, seg_stdev, run_starts)


def segment_start_index(seg_ids: jnp.ndarray) -> jnp.ndarray:
    """Index of the first element of each element's segment (seg_ids sorted)."""
    n = seg_ids.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.array([True]), seg_ids[1:] != seg_ids[:-1]])
    start_idx = jnp.where(is_start, idx, 0)
    return jax.lax.associative_scan(jnp.maximum, start_idx)


def seg_prefix_count(flags: jnp.ndarray, seg_ids: jnp.ndarray) -> jnp.ndarray:
    """Per-element inclusive count of True flags so far within the segment."""
    excl = jnp.cumsum(flags.astype(jnp.int32))
    start = segment_start_index(seg_ids)
    base = jnp.take(excl, start) - jnp.take(flags.astype(jnp.int32), start)
    return excl - base


def seg_median_modes(values_sorted: jnp.ndarray, seg_ids: jnp.ndarray,
                     valid: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """
    Per-segment `util.median_modes`: restrict to distinct values whose
    count is within 2 of the max count, take the upper median of those
    values (reference: util.py:43-58). Inputs sorted by (segment, value);
    invalid elements must sort last in their segment.
    """
    starts = run_starts(seg_ids, values_sorted) & valid
    run_id = jnp.cumsum(starts.astype(jnp.int32)) - 1
    run_id = jnp.clip(run_id, 0, values_sorted.shape[0] - 1)
    run_len = seg_sum(valid.astype(jnp.int32), run_id, values_sorted.shape[0])
    count_here = jnp.take(run_len, run_id)

    start_counts = jnp.where(starts, count_here, 0)
    max_count = seg_max(start_counts, seg_ids, num_segments)
    max_here = jnp.take(max_count, seg_ids)

    kept = starts & (max_here - count_here < 3)
    kept_rank = seg_prefix_count(kept, seg_ids) - 1  # rank among kept distinct values
    n_kept = seg_sum(kept.astype(jnp.int32), seg_ids, num_segments)
    target = jnp.take(n_kept, seg_ids) // 2

    selected = kept & (kept_rank == target)
    return seg_sum(jnp.where(selected, values_sorted, 0), seg_ids, num_segments)


def seg_trimmed_stdev(values_sorted: jnp.ndarray, seg_ids: jnp.ndarray,
                      valid: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """
    Per-segment `util.stdev(util.trim(values))` (reference: util.py:82-88,
    sv.py:530-532): drop 25% from each end (int truncation), sample stdev
    of the rest.
    """
    rank = seg_prefix_count(valid, seg_ids) - 1
    cnt = seg_count(seg_ids, valid, num_segments)
    cnt_here = jnp.take(cnt, seg_ids)
    trim_n = (cnt_here * 25) // 100
    in_window = valid & (rank >= trim_n) & (rank < cnt_here - trim_n)
    keep = jnp.where(trim_n > 0, in_window, valid)
    return seg_stdev(values_sorted, seg_ids, keep, num_segments)


def seg_most_common_top(values_sorted: jnp.ndarray, seg_ids: jnp.ndarray,
                        valid: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """
    Per-segment `util.most_common_top`: the smallest value among those
    tied for the highest count (reference: util.py:91-103).
    """
    starts = run_starts(seg_ids, values_sorted) & valid
    run_id = jnp.cumsum(starts.astype(jnp.int32)) - 1
    run_id = jnp.clip(run_id, 0, values_sorted.shape[0] - 1)
    run_len = seg_sum(valid.astype(jnp.int32), run_id, values_sorted.shape[0])
    count_here = jnp.take(run_len, run_id)

    max_count = seg_max(jnp.where(starts, count_here, 0), seg_ids, num_segments)
    is_top = starts & (count_here == jnp.take(max_count, seg_ids))
    big = jnp.int32(2 ** 31 - 1)
    cand = jnp.where(is_top, values_sorted, big)
    return jax.ops.segment_min(cand, seg_ids, num_segments=num_segments)
