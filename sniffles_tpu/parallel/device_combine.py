"""
Device-backed multi-sample candidate grouping for the production
combine path (--tpu-combine).

Design: batches are coarsely segmented at sorted-position gaps larger
than combine_match_max — cuts the host greedy provably cannot merge
across — and the exact host greedy assignment
(cluster.resolve_block_groups, reference: cluster.py:356-390) then runs
independently inside each segment. The result is identical to the host
path by construction (including tie-breaking: see the output ordering
note below), while the quadratic candidate×group scan is confined to
tiny per-segment populations. Streaming batches are small (capped at
max(25, n_samples/2)), so the segmentation itself is host-vectorized;
device offload of combine grouping lives in the mesh-sharded step
(ops/combine_groups.group_candidates).

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
    n_cands = len(svcands)
    if n_cands == 0:
        return groups_initial

    # rows: kept frontier groups (by their evolving pos_mean) + candidates.
    # Streaming combine batches are capped at max(25, n_samples/2)
    # candidates (reference: parallel.py:489-528), far below where a
    # device round trip would pay for itself, so the segmentation is
    # host-vectorized; device offload of combine lives in the
    # mesh-sharded step (ops/combine_groups.group_candidates).
    rows = [(g.pos_mean, 0, i) for i, g in enumerate(groups_initial)] + \
           [(c.pos, 1, i) for i, c in enumerate(svcands)]
    n = len(rows)
    gap = float(config.combine_match_max)
    pos_np = np.fromiter((p for p, _, _ in rows), dtype=np.int64, count=n)
    order = np.argsort(pos_np, kind="stable")
    p_sorted = pos_np[order]
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    np.greater(p_sorted[1:] - p_sorted[:-1], gap, out=boundary[1:])
    seg = np.cumsum(boundary) - 1

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

    return _greedy_by_segment(svtype, svcands, groups_initial, config, ed_cache,
                              seg_keeps, seg_cands, seg_order)


def _greedy_by_segment(svtype, svcands, groups_initial, config, ed_cache,
                       seg_keeps, seg_cands, seg_order):
    """Run the exact host greedy independently inside each segment of a
    greedy-impermeable partition, then reconstruct the host path's global
    output order: groups_initial in their original order first, then new
    groups by the global support-descending rank of their creating
    candidate (greedy creation order) — keeps downstream id assignment
    and tie-breaking byte-identical to the host run."""
    out_by_seg: dict[int, list] = {}
    for s in seg_order:
        keeps = [groups_initial[i] for i in sorted(seg_keeps[s])]
        cands = [svcands[i] for i in sorted(seg_cands[s])]
        out_by_seg[s] = cl.resolve_block_groups(svtype, cands, keeps, config, ed_cache)

    keep_rank = {id(g): i for i, g in enumerate(groups_initial)}
    cand_rank = {id(c): i for i, c in enumerate(
        sorted(svcands, key=lambda cand: cand.support, reverse=True))}
    out = [g for groups in out_by_seg.values() for g in groups]
    out.sort(key=lambda g: (1, cand_rank[id(g.candidates[0])])
             if id(g) not in keep_rank else (0, keep_rank[id(g)]))
    return out


# --------------------------------------------------------------------------
# Mesh-sharded combine (production --tpu-mesh path for combine mode)

# halo ladder for the combine mesh step: W must exceed every safe
# segment's span; doubled (same executable — W is runtime) on overflow
COMBINE_MESH_HALO_BP = 5000
COMBINE_MESH_RETRIES = 3

_combine_mesh_cache: dict = {}


def run_mesh_combine(payload: dict, meta: dict):
    """Execute the sharded safe-cut segmentation (in the process owning
    the JAX client). Returns a (2, N) int32 array [orig_idx; segment]
    covering every valid candidate exactly once, or raises on halo
    overflow exhaustion (the caller falls back to the host path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sniffles_tpu.parallel import mesh as meshmod

    n_dev = int(payload["n_dev"])
    if len(jax.devices()) < n_dev:
        raise RuntimeError(
            f"--tpu-mesh {n_dev} requested but only {len(jax.devices())} "
            f"device(s) visible; host fallback")
    key = (n_dev, tuple(sorted(meta.items())))
    step = _combine_mesh_cache.get(key)
    if step is None:
        mesh = meshmod.make_genome_mesh(n_dev)
        step = meshmod.build_sharded_combine_step(
            mesh, combine_match=float(meta["combine_match"]),
            combine_match_max=float(meta["combine_match_max"]),
            safe_cut_only=True, binsize=int(meta.get("binsize", 100)))
        _combine_mesh_cache[key] = step
    cand = {k: jnp.asarray(v) for k, v in payload["cand"].items()}
    offsets = jnp.asarray(payload["offsets"])
    window_len = jnp.asarray(payload["window_len"])
    window = int(payload["window_len"][0])

    # adaptive initial halo: combine flushes can span only tens of kb,
    # so the call-path default would exceed the shard window outright;
    # W just needs to exceed every safe segment's span (overflow-checked)
    w = min(COMBINE_MESH_HALO_BP, max(window // 2, 1))
    for _ in range(COMBINE_MESH_RETRIES):
        if 2 * w > window:
            break  # one-hop ppermute bound (see run_mesh_assign)
        out = step(cand, offsets, window_len,
                   jnp.full((n_dev,), w, dtype=jnp.int32))
        # one batched device_get: separate per-array fetches each pay a
        # full tunnel round trip (~25ms measured)
        import jax
        out = jax.device_get(out)
        if not bool(np.asarray(out["halo_overflow"]).any()):
            n_ext = np.asarray(out["pos"]).shape[0] // n_dev
            rows_list = []
            gid = np.asarray(out["group_id"]).reshape(n_dev, -1)
            gvalid = np.asarray(out["group_valid"]).reshape(n_dev, -1)
            ovalid = np.asarray(out["valid"]).reshape(n_dev, -1)
            oidx = np.asarray(out["orig_idx"]).reshape(n_dev, -1)
            seg_base = 0
            for s in range(n_dev):
                owned = ovalid[s] & np.take(gvalid[s], np.clip(gid[s], 0, n_ext - 1))
                # segment ids globalized per shard (gid is shard-local)
                rows_list.append(np.stack([oidx[s][owned],
                                           gid[s][owned] + seg_base]))
                seg_base += int(gid[s].max(initial=0)) + 1
            return np.concatenate(rows_list, axis=1).astype(np.int32)
        w *= 2
    raise RuntimeError(f"combine mesh halo overflow at W={w}bp (shard window "
                       f"{window}bp); host fallback")


def mesh_block_groups(svtype: str, svcands: list, groups_initial: list, config,
                      ed_cache=None, device=None):
    """Byte-exact combine grouping through the device mesh: the sharded
    safe-cut segmentation (cuts only at greedy-impermeable gaps,
    ops/combine_groups safe_cut_only + halo exchange + exactly-once
    ownership) partitions this flush's candidates AND frontier groups
    over the genome axis; the exact host greedy then runs independently
    per gathered segment (_greedy_by_segment reconstructs the host's
    global order). Returns None when the mesh cannot run (the caller
    falls back to the host/segmented path); reference analogue: the
    combine hot loop, parallel.py:444-566."""
    n_dev = int(getattr(config, "tpu_mesh", 0) or 0)
    if n_dev < 2:
        return None
    # rows: frontier groups (by evolving pos_mean) first, candidates after
    rows_pos = [int(g.pos_mean) for g in groups_initial] + [c.pos for c in svcands]
    rows_len = ([int(abs(g.len_mean)) for g in groups_initial]
                + [abs(c.svlen) if c.svlen else 0 for c in svcands])
    n_keep = len(groups_initial)
    n_rows = len(rows_pos)
    if n_rows == 0:
        return list(groups_initial)
    cand = {
        "pos": np.asarray(rows_pos, dtype=np.int32),
        "svlen": np.asarray(rows_len, dtype=np.int32),
        "svtype": np.zeros(n_rows, dtype=np.int32),  # one svtype per call
        "sample_id": np.zeros(n_rows, dtype=np.int32),
        "support": np.zeros(n_rows, dtype=np.int32),
        "qc": np.ones(n_rows, dtype=bool),
        "valid": np.ones(n_rows, dtype=bool),
        "orig_idx": np.arange(n_rows, dtype=np.int32),
    }
    order = np.argsort(cand["pos"], kind="stable")
    cand = {k: v[order] for k, v in cand.items()}

    # shard windows must be wide enough that a halo of at least the
    # match cap fits (a safe segment spans >= one match radius); tiny
    # flushes go to the host segmentation, which is faster there anyway
    span = int(cand["pos"][-1]) - int(cand["pos"][0]) + 1
    window = -(-max(span, n_dev) // n_dev)
    if window < 2 * (float(config.combine_match_max) + 2):
        return None

    from sniffles_tpu.parallel.combine_tensors import shard_candidate_tensors
    sharded, offsets, window_len = shard_candidate_tensors(cand, n_dev)
    payload = {"cand": sharded, "offsets": offsets, "window_len": window_len,
               "n_dev": n_dev}
    # +1: frontier rows carry int-truncated pos_means; widening the cut
    # threshold by a base pair only coarsens the partition (cuts remain
    # greedy-impermeable) while covering the sub-bp truncation error
    meta = {"combine_match": float(config.combine_match),
            "combine_match_max": float(config.combine_match_max) + 1.0,
            # truncation-edge sentinel zone scales with the configured
            # screening bin (mesh.py build_sharded_combine_step)
            "binsize": int(config.cluster_binsize)}
    rows = (device.request("combine_mesh", payload, meta)
            if device is not None else run_mesh_combine(payload, meta))
    oidx, seg = rows[0], rows[1]
    if len(oidx) != n_rows or len(set(oidx.tolist())) != n_rows:
        # exactly-once ownership violated (shouldn't happen) — fall back
        log.warning("mesh combine ownership mismatch; host fallback")
        return None

    seg_keeps: dict[int, list] = {}
    seg_cands: dict[int, list] = {}
    seg_order: list[int] = []
    # ascending original position order within/across segments
    by_pos = sorted(zip(oidx.tolist(), seg.tolist()))
    for j, s in by_pos:
        if s not in seg_keeps:
            seg_keeps[s] = []
            seg_cands[s] = []
            seg_order.append(s)
        if j < n_keep:
            seg_keeps[s].append(j)
        else:
            seg_cands[s].append(j - n_keep)
    log.debug(f"mesh combine segmentation: {len(seg_order)} segments over "
              f"{n_dev} shards ({svtype}, {len(svcands)} candidates, "
              f"{n_keep} frontier groups)")
    return _greedy_by_segment(svtype, svcands, groups_initial, config, ed_cache,
                              seg_keeps, seg_cands, seg_order)
