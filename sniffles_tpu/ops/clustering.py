"""
Device clustering: sort-and-segment formulation of the reference's
adaptive cluster sweep (reference: cluster.py:219-353; design:
SURVEY §7.1).

Signatures arrive as a struct-of-arrays batch (signatures.py). The
pipeline is fully static-shaped and jit-compatible:

  1. sort by (svtype, pos) — invalid slots sort last
  2. seed one segment per cluster_binsize bin
  3. iterative parallel merge relaxation: adjacent segments merge when
     the inter-segment gap is within the stdev-scaled distance
     criterion (cluster_r), the tandem-repeat length criterion
     (cluster_repeat_h), or the BND merge distance — the reference's
     sequential backtracking sweep computes a chain fixed point; the
     relaxation is iterated to ITS fixed point (boundary vector stops
     changing; capped at MERGE_ITERS_MAX rounds). Merging only grows
     segment stdevs, so every merge the sweep performs the relaxation
     also performs (m1 only gets easier). The sweep's
     `i = max(0, i-2) + 1` backtracking can never return to i=0, so
     the boundary after a svtype's first seed cluster is decided once,
     pristine — the relaxation reproduces that head-boundary freeze
     exactly (see test_merge_chain_matches_host_sweep; caught by diff
     fuzzing on BND chains, seed 516)
  4. resplit by |svlen| histogram bins (cluster.py:125-161), single
     chain pass
  5. per-cluster robust statistics (ops/stats.py) and support counting
     by unique read id

Known deviations from the host-exact path (both validated in
tests/test_device_cluster.py): per-read inner merge of fragmented
INS/DEL (merge_inner) is handled host-side before tensorization, and
compute_metrics sampling (max_n=100) uses all elements.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from sniffles_tpu.ops.segments import (segment_ids_from_boundaries, seg_sum, seg_max, seg_min,
                                       seg_count, seg_mean, seg_stdev,
                                       unique_count_per_segment)
from sniffles_tpu.ops.stats import seg_median_modes, seg_trimmed_stdev

MERGE_ITERS_MAX = 32

# svtype codes (order matches svcall.ALL_TYPES)
SVTYPE_INS, SVTYPE_DEL, SVTYPE_DUP, SVTYPE_INV, SVTYPE_BND = 0, 1, 2, 3, 4
SVTYPE_SINGLE_LEFT, SVTYPE_SINGLE_RIGHT = 5, 6
SVTYPE_NAMES = ["INS", "DEL", "DUP", "INV", "BND", "SINGLE_LEFT", "SINGLE_RIGHT"]
SVTYPE_CODES = {name: i for i, name in enumerate(SVTYPE_NAMES)}


def _apply_order(arrays: dict, order: jnp.ndarray) -> dict:
    return {k: jnp.take(v, order) for k, v in arrays.items()}


def _cluster_body(sig: dict,
                       cluster_r: float,
                       cluster_repeat_h: float,
                       cluster_repeat_h_max: float,
                       cluster_merge_bnd: int,
                       cluster_merge_len: float,
                       minsvlen: int,
                       binsize: int = 100,
                       resplit_binsize: int = 20,
                       do_resplit: bool = True,
                       head_freeze=True) -> dict:
    """
    Cluster a signature batch. `sig` is a dict of equal-length arrays:
    pos (i32), svlen (i32), svtype (i32), read_id (i32), strand (i32,
    +1/-1), mapq (i32), nm (f32), repeat (bool), valid (bool).

    Returns the sorted signature arrays plus `cluster_id` per element
    and `n_clusters`.
    """
    n = sig["pos"].shape[0]
    valid = sig["valid"]

    # --- 1. sort by (svtype, pos); invalid last ---
    INT32_MAX = jnp.int32(2 ** 31 - 1)
    sort_type = jnp.where(valid, sig["svtype"], INT32_MAX)
    sort_pos = jnp.where(valid, sig["pos"], INT32_MAX)
    order = jnp.lexsort((sort_pos, sort_type))
    s = _apply_order(sig, order)
    valid = s["valid"]

    pos = s["pos"]
    svtype = s["svtype"]
    bin_ = pos // binsize

    # --- 2. seed boundaries: svtype or bin change ---
    first = jnp.ones((1,), dtype=bool)
    change = (svtype[1:] != svtype[:-1]) | (bin_[1:] != bin_[:-1]) | (~valid[1:] & valid[:-1])
    boundary = jnp.concatenate([first, change])

    # --- 3. iterative merge relaxation ---
    def merge_step(boundary, frozen):
        seg = segment_ids_from_boundaries(boundary)
        # segment extent in bin coordinates (reference cluster start/end:
        # seed bin start .. last bin end + binsize)
        start_bp = seg_min(jnp.where(valid, bin_ * binsize, 2 ** 31 - 1), seg, n)
        end_bp = seg_max(jnp.where(valid, bin_ * binsize + binsize, -1), seg, n)
        sd_start = seg_stdev(pos, seg, valid, n)
        mean_svlen = seg_mean(s["svlen"], seg, valid, n)
        has_repeat = seg_max(jnp.where(valid, s["repeat"].astype(jnp.int32), 0), seg, n) > 0

        # evaluate merge between segment (k-1) and k at each boundary elem
        seg_here = seg
        seg_prev = seg_here - 1
        seg_prev_c = jnp.clip(seg_prev, 0, n - 1)
        inner = jnp.take(start_bp, seg_here) - jnp.take(end_bp, seg_prev_c)
        outer = jnp.take(end_bp, seg_here) - jnp.take(start_bp, seg_prev_c)
        sd_pair = jnp.minimum(jnp.take(sd_start, seg_here), jnp.take(sd_start, seg_prev_c))
        m1 = inner.astype(jnp.float32) <= sd_pair * cluster_r
        rep_pair = jnp.take(has_repeat, seg_here) | jnp.take(has_repeat, seg_prev_c)
        h_lim = jnp.minimum(jnp.float32(cluster_repeat_h_max),
                            (jnp.abs(jnp.take(mean_svlen, seg_here))
                             + jnp.abs(jnp.take(mean_svlen, seg_prev_c))) * cluster_repeat_h)
        m2 = rep_pair & (outer.astype(jnp.float32) <= h_lim)
        m3 = (svtype == SVTYPE_BND) & (inner <= cluster_merge_bnd)
        same_type_prev = jnp.concatenate([jnp.zeros((1,), dtype=bool),
                                          svtype[1:] == svtype[:-1]])
        can_merge = boundary & same_type_prev & valid & (m1 | m2 | m3) & ~frozen
        # the very first element always starts a segment
        keep_first = jnp.concatenate([jnp.ones((1,), dtype=bool), jnp.zeros((n - 1,), dtype=bool)])
        return jnp.where(can_merge & ~keep_first, False, boundary)

    # --- reference head-boundary freeze (sweep quirk) ---
    # The host sweep's backtracking is `i = max(0, i-2) + 1`, so i can
    # never return to 0: the boundary after a svtype's FIRST seed
    # cluster is examined exactly once, with pristine single-bin
    # metrics, and the head cluster is frozen at c0 alone (pristine
    # criteria fail) or c0+c1 (pass) — it can never absorb a third
    # seed. The relaxation computes the full closure, which merges
    # more (caught by diff fuzzing on BND chains, seed 516: the flat
    # 1000bp BND criterion makes head chains common). Reproduce the
    # sweep exactly: evaluate the pristine decision per svtype, then
    # pin the matching boundary so no relaxation round can clear it.
    same_type_prev0 = jnp.concatenate([jnp.zeros((1,), dtype=bool),
                                       svtype[1:] == svtype[:-1]])
    # pristine (round-1) merge decisions on the seed segmentation:
    # merge_step with nothing frozen, diffed against the seeds
    no_freeze = jnp.zeros((n,), dtype=bool)
    round1 = merge_step(boundary, no_freeze)
    round1_can = boundary & ~round1          # boundary cleared in round 1
    seg0 = segment_ids_from_boundaries(boundary)
    t_clip = jnp.where(valid, jnp.clip(svtype, 0, 6), 7)
    INT32_MAX_F = jnp.int32(2 ** 31 - 1)
    fseg = jax.ops.segment_min(jnp.where(valid, seg0, INT32_MAX_F), t_clip,
                               num_segments=8)
    fseg_here = jnp.take(fseg, t_clip)
    start1 = boundary & valid & same_type_prev0 & (seg0 == fseg_here + 1)
    start2 = boundary & valid & same_type_prev0 & (seg0 == fseg_here + 2)
    d_by_type = jax.ops.segment_max(
        jnp.where(start1 & round1_can, 1, 0), t_clip, num_segments=8) > 0
    d_here = jnp.take(d_by_type, t_clip)
    # head_freeze: scalar bool (apply to every svtype, the single-device
    # case) or an (8,) per-svtype vector indexed by t_clip — the mesh
    # path freezes a svtype only on the shard whose batch contains that
    # svtype's task-globally first element (parallel/mesh.py).
    if isinstance(head_freeze, (bool, int)):
        freeze_sel = jnp.bool_(head_freeze)
    else:
        hf = jnp.asarray(head_freeze)
        freeze_sel = hf if hf.ndim == 0 else jnp.take(hf, t_clip)
    frozen = ((start1 & ~d_here) | (start2 & d_here)) & freeze_sel

    # Iterate to the relaxation fixed point. Each round only clears
    # boundaries (merges), so "changed" is simply a count decrease and
    # the loop terminates in <= n rounds; MERGE_ITERS_MAX bounds the
    # compiled trip count for adversarial chains.
    def merge_cond(state):
        it, n_bounds, prev_n = state[0], state[1], state[2]
        return (it < MERGE_ITERS_MAX) & (n_bounds != prev_n)

    def merge_body(state):
        it, n_bounds, _, boundary = state
        new = merge_step(boundary, frozen)
        return (it + 1, jnp.sum(new), n_bounds, new)

    init = (jnp.int32(0), jnp.sum(boundary), jnp.int32(-1), boundary)
    *_, boundary = jax.lax.while_loop(merge_cond, merge_body, init)

    # --- 4. resplit by |svlen| histogram inside each segment ---
    # (the production --tpu-call step skips this: the reference applies
    # merge_inner BEFORE resplit, and merge_inner is host-side — the
    # host resplits the materialized clusters in reference order)
    if not do_resplit:
        seg = segment_ids_from_boundaries(boundary)
        n_clusters = jnp.max(jnp.where(s["valid"], seg, -1)) + 1
        out = dict(s)
        out["cluster_id"] = seg
        out["n_clusters"] = n_clusters
        return out

    seg = segment_ids_from_boundaries(boundary)
    svbin = (jnp.abs(s["svlen"]) // resplit_binsize) * resplit_binsize
    INT32_MAX2 = jnp.int32(2 ** 31 - 1)
    order2 = jnp.lexsort((jnp.where(valid, svbin, INT32_MAX2),
                          jnp.where(valid, seg, INT32_MAX2)))
    s = _apply_order(s, order2)
    seg = jnp.take(seg, order2)
    svbin = jnp.take(svbin, order2)
    valid = s["valid"]

    prev_bin = jnp.concatenate([svbin[:1], svbin[:-1]])
    prev_seg = jnp.concatenate([seg[:1] - 1, seg[:-1]])
    gap = jnp.abs(svbin - prev_bin).astype(jnp.float32)
    thr = jnp.maximum(jnp.float32(minsvlen),
                      jnp.minimum(svbin, prev_bin).astype(jnp.float32) * cluster_merge_len)
    no_resplit = (s["svtype"] == SVTYPE_BND)  # BND uses its own resplit (host side)
    split_boundary = (seg != prev_seg) | ((gap > thr) & ~no_resplit)
    split_boundary = split_boundary.at[0].set(True)

    cluster_id = segment_ids_from_boundaries(split_boundary)
    # invalid (padding) slots sort last; don't count their tail segment
    n_clusters = jnp.max(jnp.where(valid, cluster_id, -1)) + 1

    out = dict(s)
    out["cluster_id"] = cluster_id
    out["n_clusters"] = n_clusters
    return out


cluster_signatures = partial(jax.jit, static_argnames=("binsize", "resplit_binsize",
                                                       "do_resplit"))(_cluster_body)


@partial(jax.jit, static_argnames=("cluster_r", "cluster_repeat_h",
                                   "cluster_repeat_h_max", "cluster_merge_bnd",
                                   "cluster_merge_len", "minsvlen",
                                   "binsize", "resplit_binsize"))
def cluster_assign_packed(packed: jnp.ndarray, *,
                          cluster_r: float,
                          cluster_repeat_h: float,
                          cluster_repeat_h_max: float,
                          cluster_merge_bnd: int,
                          cluster_merge_len: float,
                          minsvlen: int,
                          binsize: int = 100,
                          resplit_binsize: int = 20) -> jnp.ndarray:
    """Lean cluster-assignment entry for the production --tpu-call path:
    ONE H2D transfer in, ONE D2H transfer out. This matters because the
    per-transfer latency host<->device dwarfs the kernel time at
    per-task batch sizes (measured ~30 ms per small transfer over a
    tunneled chip vs <1 ms of compute).

    `packed` is a (6, N) int32 matrix with rows pos, svlen, svtype,
    read_id, repeat, valid. All scalar params are static, so dispatch
    ships no scalar buffers. Returns a (3, N) int32 matrix with rows
    cluster_id, read_id (sort-permuted), valid.
    """
    zeros = jnp.zeros_like(packed[0])
    sig = {
        "pos": packed[0],
        "svlen": packed[1],
        "svtype": packed[2],
        "read_id": packed[3],
        "strand": jnp.ones_like(packed[0]),
        "mapq": zeros,
        "nm": zeros.astype(jnp.float32),
        "repeat": packed[4] > 0,
        "valid": packed[5] > 0,
    }
    out = _cluster_body(sig, cluster_r=cluster_r, cluster_repeat_h=cluster_repeat_h,
                        cluster_repeat_h_max=cluster_repeat_h_max,
                        cluster_merge_bnd=cluster_merge_bnd,
                        cluster_merge_len=cluster_merge_len, minsvlen=minsvlen,
                        binsize=binsize, resplit_binsize=resplit_binsize)
    return jnp.stack([out["cluster_id"].astype(jnp.int32),
                      out["read_id"].astype(jnp.int32),
                      out["valid"].astype(jnp.int32)])


@partial(jax.jit, static_argnames=("cluster_r", "cluster_repeat_h",
                                   "cluster_repeat_h_max", "cluster_merge_bnd",
                                   "cluster_merge_len", "minsvlen",
                                   "binsize", "resplit_binsize"))
def call_task_packed(packed: jnp.ndarray, *,
                     cluster_r: float,
                     cluster_repeat_h: float,
                     cluster_repeat_h_max: float,
                     cluster_merge_bnd: int,
                     cluster_merge_len: float,
                     minsvlen: int,
                     binsize: int = 100,
                     resplit_binsize: int = 20) -> jnp.ndarray:
    """Production --tpu-call step: cluster assignment PLUS the exact
    per-cluster calling statistics of call_statistics (reference:
    sv.py:497-598), one H2D and one D2H transfer.

    `packed` is a (10, N) int32 matrix with rows pos, svlen, svtype,
    orig_idx, repeat, valid, strand(+1/-1), mapq, read_id (a hash of
    the read name — support counts unique reads, sv.py:520), is_sa
    (lead source != INLINE — split-read evidence, sv.py:580-581).

    Returns ONE flat int32 array shaped for minimal D2H transfer (the
    per-dispatch cost over a tunneled chip is ~22ms fixed + ~1.9ms per
    100KB moved, and per-cluster statistics stored at N element slots
    were ~75% of the bytes for ~2% real content; a single buffer pays
    the fixed latency once). split_call_task_output unpacks it into:

      elements: (3, N) int32, per element (sort-permuted):
        cluster_id, orig_idx, valid
      stats: (10, SLOTS) int32 with SLOTS = max(1024, N//8), per
        cluster (indexed by cluster id): raw_pos_center, svlen_center,
        support, lead_count, fwd, rev, sum_mapq, single_fragment
        (1 when support == lead_count, i.e. no read contributes more
        than one lead, so the host merge_inner pass is a no-op and
        these statistics are host-exact as-is), support_sa (count of
        split-read leads — the DEL genotyper's SUPPORT_SA); row 9
        carries n_clusters in slot 0. A task with more than SLOTS
        stage-1 clusters reports n_clusters > SLOTS and the caller
        falls back to the exact host sweep (capacity, not correctness).
    """
    zeros = jnp.zeros_like(packed[0])
    sig = {
        "pos": packed[0],
        "svlen": packed[1],
        "svtype": packed[2],
        "read_id": packed[8],
        "strand": packed[6],
        "mapq": packed[7],
        "nm": zeros.astype(jnp.float32),
        "repeat": packed[4] > 0,
        "valid": packed[5] > 0,
        # extra columns: _apply_order permutes every key, so the original
        # lead index / sa flag simply ride along through both sorts
        "orig_idx": packed[3],
        "sa": packed[9],
    }
    clustered = _cluster_body(sig, cluster_r=cluster_r, cluster_repeat_h=cluster_repeat_h,
                              cluster_repeat_h_max=cluster_repeat_h_max,
                              cluster_merge_bnd=cluster_merge_bnd,
                              cluster_merge_len=cluster_merge_len, minsvlen=minsvlen,
                              binsize=binsize, resplit_binsize=resplit_binsize,
                              # reference order is merge_inner THEN resplit
                              # (cluster.py:330-339); merge_inner is host-side,
                              # so the host also resplits (device_call.py)
                              do_resplit=False)
    stats = call_statistics(clustered)

    n = clustered["pos"].shape[0]
    cid = clustered["cluster_id"]
    valid = clustered["valid"]
    sum_mapq = seg_sum(jnp.where(valid, clustered["mapq"], 0), cid, n)
    single_frag = (stats["support"] == stats["lead_count"]).astype(jnp.int32)
    support_sa = seg_sum(jnp.where(valid & (clustered["sa"] > 0), 1, 0), cid, n)

    elements = jnp.stack([
        clustered["cluster_id"].astype(jnp.int32),
        clustered["orig_idx"].astype(jnp.int32),
        clustered["valid"].astype(jnp.int32),
    ])
    slots = max(1024, n // 8)
    full = jnp.stack([
        stats["raw_pos_center"],
        stats["svlen"],
        stats["support"].astype(jnp.int32),
        stats["lead_count"].astype(jnp.int32),
        stats["fwd"].astype(jnp.int32),
        stats["rev"].astype(jnp.int32),
        sum_mapq.astype(jnp.int32),
        single_frag,
        support_sa.astype(jnp.int32),
        jnp.zeros((n,), jnp.int32).at[0].set(stats["n_clusters"].astype(jnp.int32)),
    ])
    # ONE flat buffer: every D2H transfer pays ~22ms of tunnel latency,
    # so two result arrays would double the fixed cost per dispatch
    return jnp.concatenate([elements.reshape(-1), full[:, :slots].reshape(-1)])


def split_call_task_output(flat: np.ndarray, n: int):
    """Split the flat call_task_packed result back into (elements (3, N),
    stats (10, SLOTS))."""
    elements = flat[:3 * n].reshape(3, n)
    stats = flat[3 * n:].reshape(10, -1)
    return elements, stats


@lru_cache(maxsize=32)
def batched_call_task(meta_items: tuple):
    """jitted vmap of call_task_packed over stacked task batches
    (k, 10, N) -> (k, 12, N): the device service drains same-shape
    requests from its queue and dispatches them as ONE kernel call, so
    k tasks pay one round-trip latency instead of k (the per-dispatch
    latency over a tunneled chip dwarfs kernel time at task-sized
    batches). `meta_items` is the sorted tuple of the static kernel
    params (one compile per distinct config, as for the single-task
    kernel)."""
    meta = dict(meta_items)

    def one(packed):
        return call_task_packed(packed, **meta)

    return jax.jit(jax.vmap(one))


@jax.jit
def call_statistics(clustered: dict) -> dict:
    """
    Per-cluster calling statistics (reference: sv.py:497-598 call_from):
    svlen/pos centers via median_modes, trimmed stdevs, support as
    unique read count, mean mapq, strand counts, mean NM, PRECISE flag
    inputs. Results are [N]-shaped, indexed by cluster id.
    """
    n = clustered["pos"].shape[0]
    cid = clustered["cluster_id"]
    valid = clustered["valid"]

    # sort by (cluster, value); invalid slots last
    INT32_MAX = jnp.int32(2 ** 31 - 1)

    def sorted_by(value):
        order = jnp.lexsort((jnp.where(valid, value, INT32_MAX),
                             jnp.where(valid, cid, INT32_MAX)))
        return jnp.take(value, order), jnp.take(cid, order), jnp.take(valid, order)

    svlen_s, cid_l, valid_l = sorted_by(clustered["svlen"])
    pos_s, cid_p, valid_p = sorted_by(clustered["pos"])
    read_s, cid_r, valid_r = sorted_by(clustered["read_id"])

    svlen_center = seg_median_modes(svlen_s, cid_l, valid_l, n)
    pos_center = seg_median_modes(pos_s, cid_p, valid_p, n)
    stdev_len = seg_trimmed_stdev(svlen_s, cid_l, valid_l, n)
    stdev_pos = seg_trimmed_stdev(pos_s, cid_p, valid_p, n)
    support = unique_count_per_segment(cid_r, read_s, valid_r, n)

    count = seg_count(cid, valid, n)
    qual = jnp.floor(seg_mean(clustered["mapq"], cid, valid, n)).astype(jnp.int32)
    fwd = seg_sum(jnp.where(valid & (clustered["strand"] > 0), 1, 0), cid, n)
    rev = count - fwd
    nm_mean = seg_mean(clustered["nm"], cid, valid, n)
    n_strands = jnp.where((fwd > 0) & (rev > 0), 2, jnp.where(count > 0, 1, 0))

    # cluster svtype (uniform within a cluster; max is a cheap head-select)
    svtype = seg_max(jnp.where(valid, clustered["svtype"], -1), cid, n)

    # element-position extent per cluster (drives shard-ownership rules in
    # the mesh halo exchange, parallel/mesh.py)
    INT32_MIN = jnp.int32(-(2 ** 31))
    pos_min = seg_min(jnp.where(valid, clustered["pos"], INT32_MAX), cid, n)
    pos_max = seg_max(jnp.where(valid, clustered["pos"], INT32_MIN), cid, n)

    # bounds (reference: sv.py:484-494 calculate_bounds)
    is_ins = svtype == SVTYPE_INS
    is_del = svtype == SVTYPE_DEL
    svstart = jnp.where(is_del, pos_center + svlen_center, pos_center)
    svend = jnp.where(is_ins | is_del, pos_center, pos_center + jnp.abs(svlen_center))

    return {
        "n_clusters": clustered["n_clusters"],
        "svtype": svtype.astype(jnp.int32),
        "svlen": svlen_center.astype(jnp.int32),
        "pos": svstart.astype(jnp.int32),
        "end": svend.astype(jnp.int32),
        "raw_pos_center": pos_center.astype(jnp.int32),
        "pos_min": pos_min.astype(jnp.int32),
        "pos_max": pos_max.astype(jnp.int32),
        "stdev_pos": stdev_pos,
        "stdev_len": stdev_len,
        "support": support,
        "lead_count": count,
        "qual": qual,
        "fwd": fwd,
        "rev": rev,
        "nm": nm_mean,
        "n_strands": n_strands,
    }
