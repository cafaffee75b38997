"""
Device grouping of multi-sample combine candidates.

The reference groups per-sample candidates greedily in support order
(reference: cluster.py:356-390): a candidate joins the best existing
group within dist <= combine_match * sqrt(minlen) (capped at
combine_match_max). For well-separated variants the greedy result
equals a clustering by (svtype, pos, svlen) proximity, which is the
device formulation here: sort candidates by (svtype, pos), segment
where the combine-match criterion fails between neighbors, and refine
by svlen. Used by the sharded multi-sample path; the host greedy
routine remains the exact small-N fallback.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sniffles_tpu.ops.segments import segment_ids_from_boundaries, seg_sum, seg_max, seg_count
from sniffles_tpu.ops.stats import seg_median_modes


@partial(jax.jit, static_argnames=("safe_cut_only",))
def group_candidates(cand: dict, combine_match: float, combine_match_max: float,
                     safe_cut_only: bool = False) -> dict:
    """
    cand: dict of [N] arrays — pos (i32), svlen (i32), svtype (i32),
    sample_id (i32), support (i32), qc (bool), valid (bool)
    (+ optional provenance columns like orig_idx, which ride along
    through the sort).

    Returns sorted arrays + group_id per candidate and per-group stats
    (pos median, svlen median, per-group candidate/sample counts).

    safe_cut_only=True segments ONLY at position gaps strictly larger
    than combine_match_max: the host greedy's candidate-to-group match
    requires pos distance + len distance <= combine_match_max, and a
    group's evolving pos_mean stays inside the convex hull of its
    members' positions, so no greedy trajectory can ever merge across
    such a cut. The resulting segments are a provably greedy-impermeable
    partition — the byte-exact mesh combine path runs the exact host
    greedy independently per segment (parallel/device_combine.py).
    """
    n = cand["pos"].shape[0]
    valid = cand["valid"]
    INT32_MAX = jnp.int32(2 ** 31 - 1)

    order = jnp.lexsort((jnp.where(valid, cand["pos"], INT32_MAX),
                         jnp.where(valid, cand["svtype"], INT32_MAX)))
    s = {k: jnp.take(v, order) for k, v in cand.items()}
    valid = s["valid"]

    pos = s["pos"].astype(jnp.float32)
    svlen = jnp.abs(s["svlen"]).astype(jnp.float32)

    prev_pos = jnp.concatenate([pos[:1], pos[:-1]])
    prev_len = jnp.concatenate([svlen[:1], svlen[:-1]])
    prev_type = jnp.concatenate([s["svtype"][:1] - 1, s["svtype"][:-1]])

    if safe_cut_only:
        boundary = (s["svtype"] != prev_type) | ((pos - prev_pos) > combine_match_max)
    else:
        dist = jnp.abs(pos - prev_pos) + jnp.abs(svlen - prev_len)
        minlen = jnp.maximum(jnp.minimum(svlen, prev_len), 1.0)
        thresh = jnp.minimum(combine_match * jnp.sqrt(minlen), combine_match_max)
        boundary = (s["svtype"] != prev_type) | (dist > thresh) | (minlen <= 0)
    boundary = boundary.at[0].set(True)

    gid = segment_ids_from_boundaries(boundary)
    n_groups = jnp.max(jnp.where(valid, gid, -1)) + 1

    # per-group stats
    order2 = jnp.lexsort((jnp.where(valid, s["pos"], INT32_MAX),
                          jnp.where(valid, gid, INT32_MAX)))
    pos_sorted = jnp.take(s["pos"], order2)
    gid_p = jnp.take(gid, order2)
    valid_p = jnp.take(valid, order2)
    pos_median = seg_median_modes(pos_sorted, gid_p, valid_p, n)

    order3 = jnp.lexsort((jnp.where(valid, s["svlen"], INT32_MAX),
                          jnp.where(valid, gid, INT32_MAX)))
    len_sorted = jnp.take(s["svlen"], order3)
    gid_l = jnp.take(gid, order3)
    valid_l = jnp.take(valid, order3)
    len_median = seg_median_modes(len_sorted, gid_l, valid_l, n)

    count = seg_count(gid, valid, n)
    pass_count = seg_sum(jnp.where(valid & s["qc"], 1, 0), gid, n)
    support_mean = seg_sum(jnp.where(valid, s["support"], 0).astype(jnp.float32), gid, n) \
        / jnp.maximum(count, 1).astype(jnp.float32)

    # distinct samples per group: sort by (gid, sample) and count runs
    order4 = jnp.lexsort((jnp.where(valid, s["sample_id"], INT32_MAX),
                          jnp.where(valid, gid, INT32_MAX)))
    sid_sorted = jnp.take(s["sample_id"], order4)
    gid_s = jnp.take(gid, order4)
    valid_s = jnp.take(valid, order4)
    run_start = jnp.concatenate([jnp.ones((1,), dtype=bool),
                                 (gid_s[1:] != gid_s[:-1]) | (sid_sorted[1:] != sid_sorted[:-1])])
    sample_count = seg_sum(jnp.where(run_start & valid_s, 1, 0), gid_s, n)

    out = dict(s)
    out.update({
        "group_id": gid,
        "n_groups": n_groups,
        "group_pos": pos_median.astype(jnp.int32),
        "group_svlen": len_median.astype(jnp.int32),
        "group_count": count,
        "group_pass_count": pass_count,
        "group_sample_count": sample_count,
        "group_support_mean": support_mean,
    })
    return out
