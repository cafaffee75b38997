"""
Device-backed multi-sample candidate grouping for the production
combine path (--tpu-combine).

Design: the device computes a coarse position segmentation of the
batch (ops/combine_groups.coarse_segments) at sorted-position gaps
larger than combine_match_max — cuts the host greedy provably cannot
merge across — and the exact host greedy assignment
(cluster.resolve_block_groups, reference: cluster.py:356-390) then runs
independently inside each segment. The result is identical to the host
path by construction (including tie-breaking: see the output ordering
note below), while the quadratic candidate×group scan is confined to
tiny per-segment populations and the INS sequence-identity gates can be
served from a device-precomputed edit-distance cache.

An earlier revision re-implemented the greedy itself as an
adjacent-pair segment kernel; at population scale (64+ samples) its
grouping diverged from the evolving-mean greedy and downstream QC
dropped most records. Correctness owns the grouping; the device owns
segmentation and the batched DP.
"""
from __future__ import annotations

import logging

import numpy as np

from sniffles_tpu import cluster as cl

log = logging.getLogger(__name__)


def device_block_groups(svtype: str, svcands: list, groups_initial: list, config,
                        ed_cache=None) -> list:
    """Drop-in for cluster.resolve_block_groups (output-identical)."""
    import jax.numpy as jnp
    from sniffles_tpu.ops.combine_groups import coarse_segments

    n_cands = len(svcands)
    if n_cands == 0:
        return groups_initial

    # rows: kept frontier groups (by their evolving pos_mean) + candidates
    rows = [(g.pos_mean, 0, i) for i, g in enumerate(groups_initial)] + \
           [(c.pos, 1, i) for i, c in enumerate(svcands)]
    n = len(rows)
    gap = float(config.combine_match_max)
    if n < 1024:
        # streaming combine batches are capped at max(25, n_samples/2)
        # candidates (reference: parallel.py:489-528), far below where a
        # device round trip pays for itself — same segmentation in numpy
        pos_np = np.fromiter((p for p, _, _ in rows), dtype=np.int64, count=n)
        order = np.argsort(pos_np, kind="stable")
        p_sorted = pos_np[order]
        boundary = np.empty(n, dtype=bool)
        boundary[0] = True
        np.greater(p_sorted[1:] - p_sorted[:-1], gap, out=boundary[1:])
        seg = np.cumsum(boundary) - 1
    else:
        size = 1024
        while size < n:
            size *= 2
        pos = np.zeros(size, dtype=np.int32)
        valid = np.zeros(size, dtype=bool)
        for j, (p, _, _) in enumerate(rows):
            pos[j] = int(p)
            valid[j] = True
        order, seg = coarse_segments(jnp.asarray(pos), jnp.asarray(valid), gap)
        order = np.asarray(order)
        seg = np.asarray(seg)

    # bucket rows by segment, in ascending position order
    seg_keeps: dict[int, list] = {}
    seg_cands: dict[int, list] = {}
    seg_order: list[int] = []
    for k in range(n):  # first n sorted entries are the valid rows
        j = int(order[k])
        s = int(seg[k])
        if s not in seg_keeps:
            seg_keeps[s] = []
            seg_cands[s] = []
            seg_order.append(s)
        _, kind, idx = rows[j]
        if kind == 0:
            seg_keeps[s].append(idx)
        else:
            seg_cands[s].append(idx)

    # exact host greedy inside each segment
    out_by_seg: dict[int, list] = {}
    for s in seg_order:
        keeps = [groups_initial[i] for i in sorted(seg_keeps[s])]
        cands = [svcands[i] for i in sorted(seg_cands[s])]
        out_by_seg[s] = cl.resolve_block_groups(svtype, cands, keeps, config, ed_cache)

    # reconstruct the host path's global output order: groups_initial in
    # their original order first, then new groups by the global
    # support-descending rank of their creating candidate (greedy
    # creation order) — keeps downstream id assignment/tie-breaking
    # byte-identical to the host run
    keep_rank = {id(g): i for i, g in enumerate(groups_initial)}
    cand_rank = {id(c): i for i, c in enumerate(
        sorted(svcands, key=lambda cand: cand.support, reverse=True))}
    out = [g for groups in out_by_seg.values() for g in groups]
    out.sort(key=lambda g: (1, cand_rank[id(g.candidates[0])])
             if id(g) not in keep_rank else (0, keep_rank[id(g)]))
    return out
