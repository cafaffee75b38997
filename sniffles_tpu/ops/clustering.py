"""
Device clustering: sort-and-segment formulation of the reference's
adaptive cluster sweep (reference: cluster.py:219-353; design:
SURVEY §7.1).

Signatures arrive as a struct-of-arrays batch (signatures.py). The
pipeline is fully static-shaped and jit-compatible:

  1. sort by (svtype, seed bin, insertion order) — the host's exact
     per-cluster lead order; invalid slots sort last
  2. seed one segment per cluster_binsize bin
  3. the merge sweep. Two device implementations:
       * EXACT (production, default): _exact_merge_sweep — a
         lax.while_loop that IS the host's sequential backtracking
         sweep (cluster.py:277-308), linked-list cluster state, the
         `i = max(0, i-2) + 1` pointer semantics (including the head
         quirk: the boundary after a svtype's first cluster is
         evaluated exactly once), and compute_metrics recomputed per
         merge with the reference's stride-subsample quirks. A
         parallel fixed-point relaxation cannot reproduce the sweep's
         left-accretion trajectory for the non-monotone repeat
         criterion (caught by diff fuzzing: seeds 516 and 756).
       * FAST (fused engine/bench path, exact_sweep=False): the
         parallel relaxation to ITS fixed point — a documented
         deviation on adversarial chains, kept for throughput.
  4. resplit by |svlen| histogram bins (cluster.py:125-161), single
     chain pass
  5. per-cluster robust statistics (ops/stats.py) and support counting
     by unique read id

The per-read inner merge of fragmented INS/DEL has a device twin
(merge_inner_fold) used for calling statistics; cluster membership
itself stays pre-fold (the host materializes all fragments, then
merges).
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


def _segment_metrics(seg, valid, pos, svlen, arange_n, n):
    """Host-exact compute_metrics per segment (reference: cluster.py:48-61):
    clusters over max_n=100 leads use a stride subsample, with the
    reference's quirks preserved — the stride can visit MORE than max_n
    leads while the svlen mean still divides by max_n, and the start
    stdev is the SAMPLE stdev over the actual pick count. Elements must
    be in host lead order (svtype, bin, insertion) so the picks land on
    the same leads the host visits."""
    L = seg_count(seg, valid, n)
    seg_first = seg_min(jnp.where(valid, arange_n, n), seg, n)
    p = arange_n - jnp.take(seg_first, seg)
    nn = jnp.minimum(L, 100)
    stride_seg = jnp.maximum(L // jnp.maximum(nn, 1), 1)
    is_pick = valid & (p % jnp.take(stride_seg, seg) == 0)
    npicks = seg_sum(jnp.where(is_pick, 1, 0), seg, n)
    posf = pos.astype(jnp.float32)
    svlenf = svlen.astype(jnp.float32)
    mean_svlen = (seg_sum(jnp.where(is_pick, svlenf, 0.0), seg, n)
                  / jnp.maximum(nn, 1).astype(jnp.float32))
    mean_start = (seg_sum(jnp.where(is_pick, posf, 0.0), seg, n)
                  / jnp.maximum(npicks, 1).astype(jnp.float32))
    dev = jnp.where(is_pick, posf - jnp.take(mean_start, seg), 0.0)
    ss = seg_sum(dev * dev, seg, n)
    sd_start = jnp.where(npicks >= 2,
                         jnp.sqrt(ss / jnp.maximum(npicks - 1, 1)
                                  .astype(jnp.float32)), 0.0)
    return mean_svlen, sd_start


def _exact_merge_sweep(s: dict, seed_boundary, bin_, *, cluster_r,
                       cluster_repeat_h, cluster_repeat_h_max,
                       cluster_merge_bnd, global_repeat, binsize,
                       head_freeze):
    """EXACT emulation of the host cluster merge sweep (reference:
    cluster.py:277-308) as a lax.while_loop over seed clusters.

    The host sweep is sequential with `i = max(0, i-2) + 1` pointer
    arithmetic: clusters accrete left-to-right, each merge re-evaluates
    the boundary LEFT of the merged cluster (for i >= 2), and the
    boundary after a svtype's first cluster is evaluated exactly once
    (the i=0 quirk — the head cluster can never absorb a third seed).
    A parallel fixed-point relaxation cannot reproduce this trajectory:
    the repeat criterion (m2) is non-monotone in the evolving means, so
    a pair the sweep never evaluates pristine (its left side accreted
    first) can merge in the closure and vice versa (caught by diff
    fuzzing, seeds 516 and 756). This loop IS the sweep: linked-list
    cluster state, one pointer move or merge per iteration, metrics
    recomputed per merge from the merged cluster's contiguous element
    range with the reference's exact subsample semantics
    (_segment_metrics quirks).

    `head_freeze[t]` False starts svtype t's pointer at i=2 (a mesh
    shard whose local head is NOT the task-global head: interior chains
    behave as if unmergeable clusters precede them).

    Sequential by design: ~2 iterations per seed + 2 per merge,
    latency-bound on a TPU (microseconds per step) — production tasks
    have hundreds to low-thousands of seeds, so the sweep costs
    single-digit milliseconds on-device and stays far below the
    dispatch latency it shares.
    """
    n = s["pos"].shape[0]
    valid = s["valid"]
    svtype = s["svtype"]
    pos = s["pos"]
    arange_n = jnp.arange(n)
    INT32_MAX = jnp.int32(2 ** 31 - 1)
    SENT = jnp.int32(n)

    seed_id = segment_ids_from_boundaries(seed_boundary)
    nseeds = jnp.max(jnp.where(valid, seed_id, -1)) + 1

    # per-seed slot state (n slots; only the first `nseeds` are live)
    lo = seg_min(jnp.where(valid, arange_n, n), seed_id, n)
    hi = seg_max(jnp.where(valid, arange_n, -1), seed_id, n) + 1
    seed_type = seg_max(jnp.where(valid, svtype, -1), seed_id, n)
    start_bp = seg_min(jnp.where(valid, bin_ * binsize, INT32_MAX), seed_id, n)
    end_bp0 = seg_max(jnp.where(valid, bin_ * binsize + binsize, -1), seed_id, n)
    rep0 = seg_max(jnp.where(valid, s["repeat"].astype(jnp.int32), 0), seed_id, n)
    mean_sv0, sd0 = _segment_metrics(seed_id, valid, pos, s["svlen"], arange_n, n)

    if isinstance(head_freeze, (bool, int)):
        head_vec = jnp.full((8,), bool(head_freeze))
    else:
        hf = jnp.asarray(head_freeze)
        head_vec = jnp.full((8,), True) & hf if hf.ndim else jnp.full((8,), hf)

    posf_all = pos.astype(jnp.float32)
    svlenf_all = s["svlen"].astype(jnp.float32)
    PICK_CAP = 256  # stride picks max out at 199 (L in [100, 199], stride 1)
    pick_k = jnp.arange(PICK_CAP)

    def range_metrics(lo_c, hi_c):
        """compute_metrics over the contiguous element range [lo_c, hi_c)
        — merges always join adjacent clusters, so a cluster is always a
        contiguous slice of the sorted elements, in host lead order."""
        L = jnp.maximum(hi_c - lo_c, 0)
        nn = jnp.minimum(L, 100)
        stride = jnp.maximum(L // jnp.maximum(nn, 1), 1)
        idx = lo_c + pick_k * stride
        m = pick_k * stride < L
        idxc = jnp.clip(idx, 0, n - 1)
        sv = jnp.where(m, jnp.take(svlenf_all, idxc), 0.0)
        ps = jnp.where(m, jnp.take(posf_all, idxc), 0.0)
        npicks = jnp.sum(m.astype(jnp.int32))
        mean_sv = jnp.sum(sv) / jnp.maximum(nn, 1).astype(jnp.float32)
        mean_ps = jnp.sum(ps) / jnp.maximum(npicks, 1).astype(jnp.float32)
        dev = jnp.where(m, ps - mean_ps, 0.0)
        sd = jnp.where(npicks >= 2,
                       jnp.sqrt(jnp.sum(dev * dev)
                                / jnp.maximum(npicks - 1, 1).astype(jnp.float32)),
                       0.0)
        return mean_sv, sd

    def init_i(t):
        return jnp.where(jnp.take(head_vec, jnp.clip(t, 0, 7)),
                         jnp.int32(0), jnp.int32(2))

    nxt0 = jnp.where(arange_n + 1 < nseeds, arange_n + 1, SENT)
    prv0 = jnp.where(arange_n > 0, arange_n - 1, SENT).astype(jnp.int32)
    alive0 = (arange_n < nseeds).astype(jnp.int32)

    t0 = seed_type[0]
    state0 = dict(c=jnp.int32(0), i=init_i(t0), cur_t=t0,
                  nxt=nxt0.astype(jnp.int32), prv=prv0,
                  hi=hi.astype(jnp.int32), end_bp=end_bp0.astype(jnp.int32),
                  rep=rep0.astype(jnp.int32), msv=mean_sv0, sd=sd0,
                  alive=alive0, it=jnp.int32(0))
    max_iters = jnp.int32(4 * n + 8)

    def cond(st):
        return (st["c"] < SENT) & (st["it"] < max_iters) & (nseeds > 0)

    def body(st):
        c = st["c"]
        ct = seed_type[c]
        i = jnp.where(ct != st["cur_t"], init_i(ct), st["i"])
        r = st["nxt"][c]
        rc = jnp.clip(r, 0, n - 1)
        pair_ok = (r < SENT) & (seed_type[rc] == ct)

        # criteria, as the host evaluates them (cluster.py:266-275)
        inner = (start_bp[rc] - st["end_bp"][c]).astype(jnp.float32)
        outer = (st["end_bp"][rc] - start_bp[c]).astype(jnp.float32)
        m1 = inner <= jnp.minimum(st["sd"][c], st["sd"][rc]) * cluster_r
        rep_pair = (st["rep"][c] > 0) | (st["rep"][rc] > 0) | bool(global_repeat)
        h_lim = jnp.minimum(jnp.float32(cluster_repeat_h_max),
                            (jnp.abs(st["msv"][c]) + jnp.abs(st["msv"][rc]))
                            * cluster_repeat_h)
        m2 = rep_pair & (outer <= h_lim)
        m3 = (ct == SVTYPE_BND) & (inner <= jnp.float32(cluster_merge_bnd))
        merge = pair_ok & (m1 | m2 | m3)

        new_hi = st["hi"][rc]
        mean_new, sd_new = range_metrics(lo[c], new_hi)
        rn = st["nxt"][rc]
        rnc = jnp.clip(rn, 0, n - 1)

        hi_d = st["hi"].at[c].set(jnp.where(merge, new_hi, st["hi"][c]))
        end_d = st["end_bp"].at[c].set(jnp.where(merge, st["end_bp"][rc],
                                                 st["end_bp"][c]))
        rep_d = st["rep"].at[c].set(jnp.where(merge, st["rep"][c] | st["rep"][rc],
                                              st["rep"][c]))
        msv_d = st["msv"].at[c].set(jnp.where(merge, mean_new, st["msv"][c]))
        sd_d = st["sd"].at[c].set(jnp.where(merge, sd_new, st["sd"][c]))
        nxt_d = st["nxt"].at[c].set(jnp.where(merge, rn, st["nxt"][c]))
        prv_d = st["prv"].at[rnc].set(jnp.where(merge & (rn < SENT), c,
                                                st["prv"][rnc]))
        alive_d = st["alive"].at[rc].set(jnp.where(merge, 0, st["alive"][rc]))

        # pointer transition (host: i = max(0, i-2) + 1 after a merge,
        # i += 1 otherwise, in list-index space):
        #   merge at i == 0 -> next index 1 = the node AFTER the merged
        #     head (the head boundary is never revisited);
        #   merge at i == 1 -> index 1 = the merged node itself;
        #   merge at i >= 2 -> index i-1 = the node BEFORE it (backtrack;
        #     a shard-local head with no real predecessor stays put — the
        #     host would evaluate an unmergeable boundary and come back).
        p = prv_d[c]
        pc = jnp.clip(p, 0, n - 1)
        p_ok = (p < SENT) & (seed_type[pc] == ct)
        c_merge = jnp.where(i == 0, rn,
                            jnp.where(i == 1, c, jnp.where(p_ok, p, c)))
        i_merge = jnp.where(i == 0, jnp.int32(1),
                            jnp.where(i == 1, jnp.int32(1),
                                      jnp.where(p_ok, i - 1, i)))
        c2 = jnp.where(merge, c_merge, r)
        i2 = jnp.where(merge, i_merge, i + 1)

        return dict(c=c2, i=i2, cur_t=ct, nxt=nxt_d, prv=prv_d, hi=hi_d,
                    end_bp=end_d, rep=rep_d, msv=msv_d, sd=sd_d,
                    alive=alive_d, it=st["it"] + 1)

    final = jax.lax.while_loop(cond, body, state0)

    # final element boundaries: the lo of every alive cluster, plus the
    # original seed boundaries of the invalid tail (padding elements keep
    # any segmentation — they are masked everywhere downstream)
    alive_lo = jnp.where(final["alive"] > 0, lo, n)
    scat = jnp.zeros((n + 1,), dtype=bool).at[jnp.clip(alive_lo, 0, n)].set(True)
    boundary = scat[:n] | (seed_boundary & ~valid)
    return boundary.at[0].set(True)


def _exact_merge_sweep_grid(s: dict, seed_boundary, bin_, *, cluster_r,
                            cluster_repeat_h, cluster_repeat_h_max,
                            cluster_merge_bnd, global_repeat, binsize,
                            head_freeze):
    """The exact merge sweep with SEGMENT-LOCKSTEP execution: identical
    trajectory and arithmetic to `_exact_merge_sweep` (same criteria,
    same float32 range metrics with the reference's stride-subsample
    quirks, same `i = max(0, i-2) + 1` pointer semantics), but seeds are
    first partitioned at PROVABLY merge-impermeable gaps and every
    segment's pointer advances in parallel lanes — one while_loop
    iteration steps ALL segments at once, so wall-clock is
    O(max trajectory per segment), not O(total seeds). The sequential
    formulation measured 100-600 ms per production task on the tunneled
    chip (~20-40 us per iteration x one iteration per seed/merge), which
    exceeded the host compute the kernel replaces.

    Soundness of the cuts (no merge can ever cross one, at any stage of
    accretion):
      * inner == the raw bin gap at the cut: a cluster's end_bp/start_bp
        only ever extend INTO its segment, so the boundary pair's inner
        distance is CONSTANT as clusters accrete;
      * m3 needs inner <= cluster_merge_bnd — excluded by
        gap > cluster_merge_bnd;
      * m2 needs outer <= h_lim <= cluster_repeat_h_max and
        outer >= inner == gap — excluded by gap > cluster_repeat_h_max;
      * m1 needs inner <= min(sd_left, sd_right) * cluster_r; every
        position of a cluster lies inside its segment's bin span, and a
        sample stdev never exceeds the max deviation from the mean,
        which is < span — so sd < span and gap >
        cluster_r * min(span_left, span_right) excludes m1. Spans depend
        on the partition, so the partition is the fixpoint of removing
        cuts that fail the criterion (removal only grows spans —
        monotone); if the fixpoint doesn't settle within the pass cap,
        all non-type cuts collapse (sound: that is the sequential
        single-segment behavior per svtype run).
    Host pointer behavior at a cut is reproduced exactly: the host
    evaluates the cross pair (it fails, by the above), advances or
    bounces its backtrack off it with i restored — net state unchanged —
    which is precisely the lane behavior at segment edges (the same
    argument the mesh shard sweep already relies on via head_freeze).

    Type-change boundaries are unconditional cuts (pair_ok is false
    across them and the host re-initializes `i` per svtype); `i` starts
    at 0 only in the lane holding a svtype's task-global head (per
    head_freeze), at 2 everywhere else, and a non-head lane's backtrack
    floor is 2 — so the i==0/i==1 head quirks bind exactly where the
    host's do.
    """
    n = s["pos"].shape[0]
    valid = s["valid"]
    svtype = s["svtype"]
    pos = s["pos"]
    arange_n = jnp.arange(n)
    INT32_MAX = jnp.int32(2 ** 31 - 1)
    SENT = jnp.int32(n)

    seed_id = segment_ids_from_boundaries(seed_boundary)
    nseeds = jnp.max(jnp.where(valid, seed_id, -1)) + 1

    # per-seed slot state (slots 0..nseeds-1 live)
    lo = seg_min(jnp.where(valid, arange_n, n), seed_id, n)
    hi = seg_max(jnp.where(valid, arange_n, -1), seed_id, n) + 1
    seed_type = seg_max(jnp.where(valid, svtype, -1), seed_id, n)
    start_bp = seg_min(jnp.where(valid, bin_ * binsize, INT32_MAX), seed_id, n)
    end_bp0 = seg_max(jnp.where(valid, bin_ * binsize + binsize, -1), seed_id, n)
    rep0 = seg_max(jnp.where(valid, s["repeat"].astype(jnp.int32), 0), seed_id, n)
    mean_sv0, sd0 = _segment_metrics(seed_id, valid, pos, s["svlen"], arange_n, n)

    if isinstance(head_freeze, (bool, int)):
        head_vec = jnp.full((8,), bool(head_freeze))
    else:
        hf = jnp.asarray(head_freeze)
        head_vec = jnp.full((8,), True) & hf if hf.ndim else jnp.full((8,), hf)

    seed_live = arange_n < nseeds
    prev_slot = jnp.clip(arange_n - 1, 0, n - 1)
    type_change = (arange_n == 0) | (seed_type != seed_type[prev_slot])
    gap = (start_bp - end_bp0[prev_slot]).astype(jnp.float32)
    const_ok = gap > jnp.float32(max(float(cluster_merge_bnd),
                                     float(cluster_repeat_h_max)))

    # --- sound cut partition: fixpoint over span-dependent m1 bound ---
    cut0 = seed_live & (type_change | const_ok)
    cut0 = cut0.at[0].set(True)

    def fix_cond(st):
        it, changed, _ = st
        return changed & (it < 24)

    def fix_body(st):
        it, _, cut = st
        segid = segment_ids_from_boundaries(cut)
        span_lo = seg_min(jnp.where(seed_live, start_bp, INT32_MAX), segid, n)
        span_hi = seg_max(jnp.where(seed_live, end_bp0, -1), segid, n)
        span = (jnp.take(span_hi, segid) - jnp.take(span_lo, segid)
                ).astype(jnp.float32)
        span_l = jnp.take(span, jnp.clip(segid - 1, 0, n - 1))
        min_span = jnp.minimum(span_l, span)
        m1_ok = gap > jnp.float32(cluster_r) * min_span
        new_cut = cut & (type_change | (const_ok & m1_ok))
        new_cut = new_cut.at[0].set(True)
        return (it + 1, jnp.any(new_cut != cut), new_cut)

    _, still_changing, cut = jax.lax.while_loop(
        fix_cond, fix_body, (jnp.int32(0), jnp.bool_(True), cut0))
    # pass cap hit while still unstable -> collapse to type cuts (sound)
    cut = jnp.where(still_changing, seed_live & type_change, cut)
    cut = cut.at[0].set(True)
    rowid = segment_ids_from_boundaries(cut)     # per SEED slot

    # ------------------------------------------------------------------
    # Lockstep range metrics WITHOUT per-iteration wide gathers.
    #
    # A (n, 256)-index gather costs ~15 ms per while_loop iteration on
    # TPU (gathers run ~19 ns/element), which dominated the lockstep
    # sweep. The candidate merged ranges of all rows are DISJOINT
    # element runs, so the same picks can be expressed as an
    # element-aligned mask ((idx - lo) % stride == 0 inside [lo, hi) —
    # identical pick set: the 256 cap never binds, picks max out at
    # 199) and reduced with masked cumsums + static row-boundary
    # differences:
    #   * integer sums (pick count, svlen, positions centered on the
    #     row's static first position) use int32 cumsums — two's
    #     complement wraparound keeps row differences EXACT whenever
    #     the true row sum fits int32, which centering guarantees;
    #   * the stdev deviation pass is a boundary-reset f32 segmented
    #     scan: magnitudes stay within-row, so precision is finest
    #     exactly where small stdevs gate merges (a global f32 cumsum
    #     would cancel catastrophically across rows).
    # The centered-integer mean is one final f32 rounding of the exact
    # rational — at least as close to the host's f64 arithmetic as the
    # gather formulation's raw f32 position sums were.
    # ------------------------------------------------------------------
    posf_all = pos.astype(jnp.float32)
    svlen_i = s["svlen"]

    # static element-aligned row machinery (rowid/cut fixed pre-loop)
    rowhead_of_seed = jax.lax.associative_scan(
        jnp.maximum, jnp.where(cut, arange_n, -1))           # seed -> lane
    elem_lane = jnp.take(rowhead_of_seed, seed_id)           # element -> lane
    elem_row = jnp.take(rowid, seed_id)                      # element -> row id
    elem_valid = valid
    rowlast_by_rowid = seg_max(jnp.where(elem_valid, arange_n, -1),
                               elem_row, n)
    row_last_lane = jnp.take(rowlast_by_rowid, rowid)        # lane -> last elem
    row_first_lane = lo                                      # lane -> first elem
    row_start_elem = jnp.zeros((n,), dtype=bool).at[
        jnp.clip(jnp.where(cut & seed_live, lo, n), 0, n - 1)].set(
        True, mode="drop")
    base_elem = jnp.take(pos, jnp.clip(jnp.take(lo, elem_lane), 0, n - 1))
    d_elem = pos - base_elem                                 # int32, centered

    def _row_totals_int(masked_vals, last_lane, first_lane):
        c = jnp.concatenate([jnp.zeros((1,), masked_vals.dtype),
                             jnp.cumsum(masked_vals)])
        return (jnp.take(c, jnp.clip(last_lane + 1, 0, n))
                - jnp.take(c, jnp.clip(first_lane, 0, n)))

    def _row_totals_f32_seg(masked_vals, last_lane):
        def comb(a, b):
            av, ab = a
            bv, bb = b
            return (jnp.where(bb, bv, av + bv), ab | bb)
        scanned, _ = jax.lax.associative_scan(
            comb, (masked_vals, row_start_elem))
        return jnp.take(scanned, jnp.clip(last_lane, 0, n - 1))

    def range_metrics_vec(lo_c, hi_c):
        """compute_metrics of [lo_c, hi_c) per LANE (same pick set and
        divisor quirks as the sequential sweep's range_metrics)."""
        elem_lo = jnp.take(lo_c, elem_lane)
        elem_hi = jnp.take(hi_c, elem_lane)
        off = arange_n - elem_lo
        L_el = jnp.maximum(elem_hi - elem_lo, 0)
        nn_el = jnp.minimum(L_el, 100)
        stride_el = jnp.maximum(L_el // jnp.maximum(nn_el, 1), 1)
        pick = (elem_valid & (off >= 0) & (arange_n < elem_hi)
                & (off % stride_el == 0))
        pick_i = pick.astype(jnp.int32)

        npicks = _row_totals_int(pick_i, row_last_lane, row_first_lane)
        sum_sv = _row_totals_int(jnp.where(pick, svlen_i, 0),
                                 row_last_lane, row_first_lane)
        sum_d = _row_totals_int(jnp.where(pick, d_elem, 0),
                                row_last_lane, row_first_lane)

        L_lane = jnp.maximum(hi_c - lo_c, 0)
        nn_lane = jnp.minimum(L_lane, 100)
        mean_sv = (sum_sv.astype(jnp.float32)
                   / jnp.maximum(nn_lane, 1).astype(jnp.float32))
        mean_d = (sum_d.astype(jnp.float32)
                  / jnp.maximum(npicks, 1).astype(jnp.float32))

        dev = jnp.where(pick,
                        d_elem.astype(jnp.float32)
                        - jnp.take(mean_d, elem_lane), 0.0)
        ss = _row_totals_f32_seg(dev * dev, row_last_lane)
        sd = jnp.where(npicks >= 2,
                       jnp.sqrt(ss / jnp.maximum(npicks - 1, 1)
                                .astype(jnp.float32)),
                       0.0)
        return mean_sv, sd

    # lane init: row state lives at the row's head-seed slot
    first_of_type = seed_live & type_change
    init_i_lane = jnp.where(
        first_of_type & jnp.take(head_vec, jnp.clip(seed_type, 0, 7)),
        jnp.int32(0), jnp.int32(2))
    act0 = cut & seed_live
    nxt0 = jnp.where(arange_n + 1 < nseeds, arange_n + 1, SENT).astype(jnp.int32)
    prv0 = jnp.where(arange_n > 0, arange_n - 1, SENT).astype(jnp.int32)
    alive0 = seed_live.astype(jnp.int32)

    state0 = dict(c=arange_n.astype(jnp.int32), i=init_i_lane,
                  act=act0,
                  nxt=nxt0, prv=prv0,
                  hi=hi.astype(jnp.int32), end_bp=end_bp0.astype(jnp.int32),
                  rep=rep0.astype(jnp.int32), msv=mean_sv0, sd=sd0,
                  alive=alive0, it=jnp.int32(0))
    max_iters = jnp.int32(4 * n + 8)

    def cond(st):
        return jnp.any(st["act"]) & (st["it"] < max_iters)

    def body(st):
        act = st["act"]
        c = st["c"]
        cc = jnp.clip(c, 0, n - 1)
        row = rowid                      # lane's own row id (head slots)
        r = jnp.take(st["nxt"], cc)
        rc = jnp.clip(r, 0, n - 1)
        in_row = (r < SENT) & (jnp.take(rowid, rc) == row)
        ct = jnp.take(seed_type, cc)
        pair_ok = act & in_row & (jnp.take(seed_type, rc) == ct)

        inner = (jnp.take(start_bp, rc) - jnp.take(st["end_bp"], cc)
                 ).astype(jnp.float32)
        outer = (jnp.take(st["end_bp"], rc) - jnp.take(start_bp, cc)
                 ).astype(jnp.float32)
        sd_c = jnp.take(st["sd"], cc)
        sd_r = jnp.take(st["sd"], rc)
        m1 = inner <= jnp.minimum(sd_c, sd_r) * cluster_r
        rep_pair = ((jnp.take(st["rep"], cc) > 0)
                    | (jnp.take(st["rep"], rc) > 0) | bool(global_repeat))
        h_lim = jnp.minimum(jnp.float32(cluster_repeat_h_max),
                            (jnp.abs(jnp.take(st["msv"], cc))
                             + jnp.abs(jnp.take(st["msv"], rc)))
                            * cluster_repeat_h)
        m2 = rep_pair & (outer <= h_lim)
        m3 = (ct == SVTYPE_BND) & (inner <= jnp.float32(cluster_merge_bnd))
        merge = pair_ok & (m1 | m2 | m3)

        new_hi = jnp.take(st["hi"], rc)
        mean_new, sd_new = range_metrics_vec(jnp.take(lo, cc), new_hi)
        rn = jnp.take(st["nxt"], rc)
        rnc = jnp.clip(rn, 0, n - 1)

        # scatter targets: real index when merging, dropped otherwise
        DROP = jnp.int32(n)
        tgt_c = jnp.where(merge, cc, DROP)
        tgt_rc = jnp.where(merge, rc, DROP)
        tgt_rn = jnp.where(merge & (rn < SENT), rnc, DROP)
        hi_d = st["hi"].at[tgt_c].set(new_hi, mode="drop")
        end_d = st["end_bp"].at[tgt_c].set(jnp.take(st["end_bp"], rc),
                                           mode="drop")
        rep_d = st["rep"].at[tgt_c].set(
            jnp.take(st["rep"], cc) | jnp.take(st["rep"], rc), mode="drop")
        msv_d = st["msv"].at[tgt_c].set(mean_new, mode="drop")
        sd_d = st["sd"].at[tgt_c].set(sd_new, mode="drop")
        nxt_d = st["nxt"].at[tgt_c].set(rn, mode="drop")
        prv_d = st["prv"].at[tgt_rn].set(cc, mode="drop")
        alive_d = st["alive"].at[tgt_rc].set(0, mode="drop")

        # pointer transition (identical formulas to the sequential
        # sweep; p_ok additionally requires same-row — the host's
        # backtrack across a cut evaluates the impermeable pair and
        # returns with i restored, net unchanged)
        i = st["i"]
        p = jnp.take(prv_d, cc)
        pc = jnp.clip(p, 0, n - 1)
        p_ok = ((p < SENT) & (jnp.take(seed_type, pc) == ct)
                & (jnp.take(rowid, pc) == row))
        c_merge = jnp.where(i == 0, rn,
                            jnp.where(i == 1, c, jnp.where(p_ok, p, c)))
        i_merge = jnp.where(i == 0, jnp.int32(1),
                            jnp.where(i == 1, jnp.int32(1),
                                      jnp.where(p_ok, i - 1, i)))
        c2 = jnp.where(merge, c_merge, jnp.where(act, r, c))
        i2 = jnp.where(merge, i_merge, jnp.where(act, i + 1, i))
        # a lane retires when its pointer leaves the row (the host walks
        # on into the next segment — that segment's own lane covers it)
        act2 = act & jnp.where(merge, True, in_row)
        c2c = jnp.clip(c2, 0, n - 1)
        act2 = act2 & (c2 < SENT) & (jnp.take(rowid, c2c) == row)

        return dict(c=c2, i=i2, act=act2, nxt=nxt_d, prv=prv_d, hi=hi_d,
                    end_bp=end_d, rep=rep_d, msv=msv_d, sd=sd_d,
                    alive=alive_d, it=st["it"] + 1)

    final = jax.lax.while_loop(cond, body, state0)

    alive_lo = jnp.where((final["alive"] > 0) & seed_live, lo, n)
    scat = jnp.zeros((n + 1,), dtype=bool).at[jnp.clip(alive_lo, 0, n)].set(True)
    boundary = scat[:n] | (seed_boundary & ~valid)
    return boundary.at[0].set(True)


# A/B + emergency escape hatch: force the sequential sweep formulation
# (identical results; the grid is the production default for latency)
_FORCE_SEQ_SWEEP = bool(__import__("os").environ.get("SNIFFLES_TPU_SEQ_SWEEP"))


def _exact_merge_sweep_auto(s, seed_boundary, bin_, **kw):
    """Runtime dispatch between the two EXACT sweep formulations (both
    produce identical boundaries): the segment-lockstep grid wins when
    the sound-cut partition is effective (iterations ~ max seeds per
    segment; realistic tasks: 3-6x faster), while an adversarial layout
    that resists cutting (seed chains at sub-cap gaps across the whole
    window) degenerates the grid into a sequential walk with ~25x
    costlier iterations (measured 18 s vs 0.6 s on a fully dense random
    batch) — there the classic per-seed while_loop is the right tool.
    The predicate replicates the grid's cut fixpoint (cheap, vectorized)
    and compares the longest row against the total seed count scaled by
    the measured per-iteration cost ratio."""
    n = s["pos"].shape[0]
    valid = s["valid"]
    arange_n = jnp.arange(n)
    INT32_MAX = jnp.int32(2 ** 31 - 1)
    seed_id = segment_ids_from_boundaries(seed_boundary)
    nseeds = jnp.max(jnp.where(valid, seed_id, -1)) + 1
    seed_type = seg_max(jnp.where(valid, s["svtype"], -1), seed_id, n)
    start_bp = seg_min(jnp.where(valid, bin_ * kw["binsize"], INT32_MAX),
                       seed_id, n)
    end_bp0 = seg_max(jnp.where(valid, bin_ * kw["binsize"] + kw["binsize"],
                                -1), seed_id, n)
    seed_live = arange_n < nseeds
    prev_slot = jnp.clip(arange_n - 1, 0, n - 1)
    type_change = (arange_n == 0) | (seed_type != seed_type[prev_slot])
    gap = (start_bp - end_bp0[prev_slot]).astype(jnp.float32)
    const_ok = gap > jnp.float32(max(float(kw["cluster_merge_bnd"]),
                                     float(kw["cluster_repeat_h_max"])))
    cut0 = (seed_live & (type_change | const_ok)).at[0].set(True)

    def fix_cond(st):
        it, changed, _ = st
        return changed & (it < 24)

    def fix_body(st):
        it, _, cut = st
        segid = segment_ids_from_boundaries(cut)
        span_lo = seg_min(jnp.where(seed_live, start_bp, INT32_MAX), segid, n)
        span_hi = seg_max(jnp.where(seed_live, end_bp0, -1), segid, n)
        span = (jnp.take(span_hi, segid) - jnp.take(span_lo, segid)
                ).astype(jnp.float32)
        span_l = jnp.take(span, jnp.clip(segid - 1, 0, n - 1))
        m1_ok = gap > jnp.float32(kw["cluster_r"]) * jnp.minimum(span_l, span)
        new_cut = (cut & (type_change | (const_ok & m1_ok))).at[0].set(True)
        return (it + 1, jnp.any(new_cut != cut), new_cut)

    _, still_changing, cut = jax.lax.while_loop(
        fix_cond, fix_body, (jnp.int32(0), jnp.bool_(True), cut0))
    cut = jnp.where(still_changing, seed_live & type_change, cut)
    cut = cut.at[0].set(True)
    rowid = segment_ids_from_boundaries(cut)
    row_seeds = seg_sum(jnp.where(seed_live, 1, 0), rowid, n)
    max_row = jnp.max(row_seeds)
    # grid iteration ~25x the sequential iteration's cost; prefer the
    # grid only when its lockstep depth is far below the seed count
    use_grid = max_row * 28 <= jnp.maximum(nseeds, 1)

    return jax.lax.cond(
        use_grid,
        lambda: _exact_merge_sweep_grid(s, seed_boundary, bin_, **kw),
        lambda: _exact_merge_sweep(s, seed_boundary, bin_, **kw))


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
                       head_freeze=True,
                       global_repeat: bool = False,
                       exact_sweep: bool = True) -> dict:
    """
    Cluster a signature batch. `sig` is a dict of equal-length arrays:
    pos (i32), svlen (i32), svtype (i32), read_id (i32), strand (i32,
    +1/-1), mapq (i32), nm (f32), repeat (bool), valid (bool).

    `head_freeze`: True / per-svtype (8,) bool vector marking svtypes
    whose task-globally FIRST cluster is in this batch (the sweep's
    i=0 pointer quirk applies only there; mesh shards pass the pmin
    -derived vector). `exact_sweep` selects the sequential host-sweep
    emulation (production, exact) over the parallel relaxation (fast,
    approximate — the fused engine/bench path).

    Returns the sorted signature arrays plus `cluster_id` per element
    and `n_clusters`.
    """
    n = sig["pos"].shape[0]
    valid = sig["valid"]

    # --- 1. sort by (svtype, seed bin, insertion order); invalid last ---
    # Within a bin the HOST keeps scan/insertion order (leadtab lists,
    # reference: leadprov.py:400-418), and the sweep's subsampled
    # compute_metrics picks depend on that order — so the device sorts
    # by the original lead index within bins (orig_idx when the caller
    # provides it; pos otherwise) to reproduce the host's exact lead
    # order per cluster.
    INT32_MAX = jnp.int32(2 ** 31 - 1)
    bin0 = sig["pos"] // binsize
    tie0 = sig.get("orig_idx", sig["pos"])
    order = jnp.lexsort((jnp.where(valid, tie0, INT32_MAX),
                         jnp.where(valid, bin0, INT32_MAX),
                         jnp.where(valid, sig["svtype"], INT32_MAX)))
    s = _apply_order(sig, order)
    valid = s["valid"]

    pos = s["pos"]
    svtype = s["svtype"]
    bin_ = pos // binsize

    # --- 2. seed boundaries: svtype or bin change ---
    first = jnp.ones((1,), dtype=bool)
    change = (svtype[1:] != svtype[:-1]) | (bin_[1:] != bin_[:-1]) | (~valid[1:] & valid[:-1])
    boundary = jnp.concatenate([first, change])

    # --- 3. the merge sweep ---
    arange_n = jnp.arange(n)

    if exact_sweep:
        sweep = (_exact_merge_sweep if _FORCE_SEQ_SWEEP
                 else _exact_merge_sweep_auto)
        boundary = sweep(
            s, boundary, bin_, cluster_r=cluster_r,
            cluster_repeat_h=cluster_repeat_h,
            cluster_repeat_h_max=cluster_repeat_h_max,
            cluster_merge_bnd=cluster_merge_bnd,
            global_repeat=global_repeat, binsize=binsize,
            head_freeze=head_freeze)
    else:
        # Parallel fixed-point relaxation: the FAST approximate path for
        # the fused engine/bench step. It merges the closure of the
        # criteria under final metrics, which can differ from the host
        # sweep's left-accretion trajectory on adversarial chains (the
        # production paths use the exact sweep above; this path is a
        # documented deviation).
        def merge_step(boundary):
            seg = segment_ids_from_boundaries(boundary)
            start_bp = seg_min(jnp.where(valid, bin_ * binsize, 2 ** 31 - 1), seg, n)
            end_bp = seg_max(jnp.where(valid, bin_ * binsize + binsize, -1), seg, n)
            mean_svlen, sd_start = _segment_metrics(seg, valid, pos, s["svlen"],
                                                    arange_n, n)
            has_repeat = seg_max(jnp.where(valid, s["repeat"].astype(jnp.int32), 0),
                                 seg, n) > 0

            seg_here = seg
            seg_prev_c = jnp.clip(seg_here - 1, 0, n - 1)
            inner = jnp.take(start_bp, seg_here) - jnp.take(end_bp, seg_prev_c)
            outer = jnp.take(end_bp, seg_here) - jnp.take(start_bp, seg_prev_c)
            sd_pair = jnp.minimum(jnp.take(sd_start, seg_here),
                                  jnp.take(sd_start, seg_prev_c))
            m1 = inner.astype(jnp.float32) <= sd_pair * cluster_r
            rep_pair = (jnp.take(has_repeat, seg_here)
                        | jnp.take(has_repeat, seg_prev_c) | bool(global_repeat))
            h_lim = jnp.minimum(jnp.float32(cluster_repeat_h_max),
                                (jnp.abs(jnp.take(mean_svlen, seg_here))
                                 + jnp.abs(jnp.take(mean_svlen, seg_prev_c)))
                                * cluster_repeat_h)
            m2 = rep_pair & (outer.astype(jnp.float32) <= h_lim)
            m3 = (svtype == SVTYPE_BND) & (inner <= cluster_merge_bnd)
            same_type_prev = jnp.concatenate([jnp.zeros((1,), dtype=bool),
                                              svtype[1:] == svtype[:-1]])
            can_merge = boundary & same_type_prev & valid & (m1 | m2 | m3)
            keep_first = jnp.concatenate([jnp.ones((1,), dtype=bool),
                                          jnp.zeros((n - 1,), dtype=bool)])
            return jnp.where(can_merge & ~keep_first, False, boundary)

        def merge_cond(state):
            it, n_bounds, prev_n = state[0], state[1], state[2]
            return (it < MERGE_ITERS_MAX) & (n_bounds != prev_n)

        def merge_body(state):
            it, n_bounds, _, boundary = state
            new = merge_step(boundary)
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
                                                       "do_resplit", "global_repeat",
                                                       "exact_sweep"))(_cluster_body)


def merge_inner_fold(clustered: dict, *, cluster_merge_pos: int,
                     global_repeat: bool) -> dict:
    """Device twin of the host per-read inner merge (cluster.merge_inner,
    reference: cluster.py:85-122): INS/DEL fragments of the same read
    inside one cluster fold into a single signature — svlen summed, all
    other fields taken from the first fragment (the host's open_lead).

    The host chain walk is purely local: a fragment merges into the open
    group iff it is `near` its immediate predecessor AND its strand
    matches the group head's — and since every previously-merged member
    already matched the head's strand, head-strand == predecessor-strand,
    so the whole decision is an adjacent-pair predicate (no scan needed).
    Inside repeat clusters the host threshold is -1 (merge a read's
    fragments unconditionally); per-cluster repeat status replicates
    that here.

    Input `clustered` is _cluster_body output carrying ref_end /
    qry_start / qry_end columns. Returns the same dict with `svlen`
    folded and `valid` masked to fold-group heads (non-head slots are
    dropped from statistics exactly as the host drops merged fragments).
    """
    n = clustered["pos"].shape[0]
    cid = clustered["cluster_id"]
    valid = clustered["valid"]
    pos = clustered["pos"]

    rep_cluster = seg_max(jnp.where(valid, clustered["repeat"].astype(jnp.int32), 0),
                          cid, n) > 0
    if global_repeat:
        rep_cluster = rep_cluster | True
    rep_here = jnp.take(rep_cluster, jnp.clip(cid, 0, n - 1))

    # sort by (cluster, read, ref_start); stable, so ties keep the
    # cluster-sort order — the same order the host's stable per-read
    # sort produces from cluster.leads
    INT32_MAX = jnp.int32(2 ** 31 - 1)
    order = jnp.lexsort((jnp.where(valid, pos, INT32_MAX),
                         jnp.where(valid, clustered["read_id"], INT32_MAX),
                         jnp.where(valid, cid, INT32_MAX)))
    s = {k: (jnp.take(v, order) if isinstance(v, jnp.ndarray) and v.ndim == 1 else v)
         for k, v in clustered.items()}
    valid = s["valid"]
    pos = s["pos"]
    cid_s = s["cluster_id"]
    t = jnp.int32(cluster_merge_pos)

    prev = {k: jnp.concatenate([v[:1], v[:-1]])
            for k, v in s.items() if isinstance(v, jnp.ndarray) and v.ndim == 1}
    same_key = (valid & prev["valid"] & (cid_s == prev["cluster_id"])
                & (s["read_id"] == prev["read_id"]))
    near = (((jnp.abs(pos - prev["ref_end"]) < t)
             | (jnp.abs(pos - prev["pos"]) < t))
            & ((jnp.abs(s["qry_start"] - prev["qry_end"]) < t)
               | (jnp.abs(s["qry_start"] - prev["qry_start"]) < t)))
    foldable = (s["svtype"] == SVTYPE_INS) | (s["svtype"] == SVTYPE_DEL)
    rep_s = jnp.take(rep_here, order)
    merge = (same_key & foldable
             & (rep_s | (near & (s["strand"] == prev["strand"]))))
    merge = merge.at[0].set(False)

    fold_id = segment_ids_from_boundaries(~merge)
    svlen_f = seg_sum(jnp.where(valid, s["svlen"], 0), fold_id, n)

    out = dict(s)
    out["svlen"] = jnp.take(svlen_f, fold_id)
    out["valid"] = valid & ~merge
    # pre-head-masking validity: every element of a fold group stays
    # valid here and carries the FOLDED svlen — so per-child phase
    # tallies (which need all pre-fold elements) can segment by the
    # resplit child ids computed from folded lengths
    out["valid_all"] = valid
    return out


def resplit_child_ids(folded: dict, *, resplit_binsize: int, minsvlen: int,
                      cluster_merge_len: float):
    """Device twin of the host svlen-histogram resplit (cluster.resplit,
    reference: cluster.py:125-161), computed over merge_inner_fold
    output.

    The host sweep quantizes |svlen| to bins, walks the sorted bin list
    and folds the LOWER bin into the higher one when
    ``hi - lo <= max(minsvlen, lo * cluster_merge_len)``, with
    ``i = max(0, i-2) + 1`` backtracking. That backtracking is provably
    redundant here: merges always keep the RIGHT (higher) bin's key, so
    every comparison is between two ORIGINAL bin keys, each adjacent
    original pair is evaluated exactly once before anything to its
    right, and re-evaluations after a removal compare a pair with a
    strictly larger gap at the same (lower-key) threshold — monotone,
    so they can never newly merge. The final partition is therefore the
    pure adjacent-occupied-bin predicate, fully parallel on device.

    Returns (child_id per element in `folded`'s order, n_children,
    uncertain per parent-cluster slot). Child ids ascend in
    (cluster, bin) order — within a parent cluster, ascending svlen bin,
    exactly the host's child yield order. BND keeps one child per
    cluster (the host routes BND to resplit_bnd instead).

    Precision: the host evaluates ``lo * cluster_merge_len`` in float64;
    this kernel uses float32. An adjacent-bin gap within a relative
    ~1e-5 window of its threshold could therefore split differently, so
    such pairs mark their PARENT cluster `uncertain` — the consumer
    withholds device stats for its children and the exact host resplit
    decides (conservative, never wrong).
    """
    n = folded["pos"].shape[0]
    valid = folded["valid_all"]
    cid = folded["cluster_id"]
    svbin = (jnp.abs(folded["svlen"]) // resplit_binsize) * resplit_binsize
    INT32_MAX = jnp.int32(2 ** 31 - 1)

    order = jnp.lexsort((jnp.where(valid, svbin, INT32_MAX),
                         jnp.where(valid, cid, INT32_MAX)))
    bin_s = jnp.take(svbin, order)
    cid_s = jnp.take(cid, order)
    valid_s = jnp.take(valid, order)
    type_s = jnp.take(folded["svtype"], order)

    prev_bin = jnp.concatenate([bin_s[:1], bin_s[:-1]])
    prev_cid = jnp.concatenate([cid_s[:1] - 1, cid_s[:-1]])
    same_cluster = cid_s == prev_cid
    gap = (bin_s - prev_bin).astype(jnp.float32)
    thr = jnp.maximum(jnp.float32(minsvlen),
                      prev_bin.astype(jnp.float32) * cluster_merge_len)
    no_resplit = type_s == SVTYPE_BND
    boundary = ((~same_cluster) | ((gap > thr) & ~no_resplit)
                | (~valid_s & jnp.concatenate([valid_s[:1], valid_s[:-1]])))
    boundary = boundary.at[0].set(True)
    child_sorted = segment_ids_from_boundaries(boundary)
    n_children = jnp.max(jnp.where(valid_s, child_sorted, -1)) + 1
    child = jnp.zeros((n,), dtype=child_sorted.dtype).at[order].set(child_sorted)

    # float32-vs-float64 ambiguity flag, reduced onto the parent cluster
    eps = jnp.float32(1e-5) * jnp.maximum(thr, 1.0) + jnp.float32(1e-3)
    ambiguous = (valid_s & same_cluster & ~no_resplit & (gap > 0)
                 & (jnp.abs(gap - thr) <= eps))
    uncertain = seg_max(jnp.where(ambiguous, 1, 0),
                        jnp.clip(cid_s, 0, n - 1), n)
    return child, n_children, uncertain


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
                                   "cluster_merge_pos", "global_repeat",
                                   "binsize", "resplit_binsize"))
def call_task_packed(packed: jnp.ndarray, *,
                     cluster_r: float,
                     cluster_repeat_h: float,
                     cluster_repeat_h_max: float,
                     cluster_merge_bnd: int,
                     cluster_merge_len: float,
                     minsvlen: int,
                     cluster_merge_pos: int = 150,
                     global_repeat: bool = False,
                     binsize: int = 100,
                     resplit_binsize: int = 20) -> jnp.ndarray:
    """Production --tpu-call step: cluster assignment PLUS the exact
    per-cluster calling statistics of call_statistics (reference:
    sv.py:497-598) computed AFTER the device merge_inner fold
    (merge_inner_fold — the per-read fragment fold the host applies
    before calling, cluster.py:85-122), one H2D and one D2H transfer.

    `packed` is a (15, N) int32 matrix with rows pos, svlen, svtype,
    orig_idx, repeat, valid, strand(+1/-1), mapq, read_id (a hash of
    the read name — support counts unique reads, sv.py:520), is_sa
    (lead source != INLINE — split-read evidence, sv.py:580-581),
    ref_end, qry_start, qry_end (the merge_inner anchor columns),
    hap (HP tag, 0 when absent), ps (PS tag, -1 when absent).

    Returns ONE flat int32 array shaped for minimal D2H transfer (the
    per-dispatch cost over a tunneled chip is ~22ms fixed + ~1.9ms per
    100KB moved, and per-cluster statistics stored at N element slots
    were ~75% of the bytes for ~2% real content; a single buffer pays
    the fixed latency once). split_call_task_output unpacks it into:

      elements: (3, N) int32, per element (sort-permuted):
        cluster_id, orig_idx, valid — the PRE-fold stage-1 assignment
        (the host materializes every fragment, then merges)
      stats: (21, SLOTS) int32 with SLOTS = max(1024, N//8), per
        RESPLIT CHILD (indexed by child id: the device runs the exact
        svlen-histogram resplit after the fold, resplit_child_ids, so
        multi-child clusters consume device stats too). Rows 0-8
        POST-fold calling stats: raw_pos_center, svlen_center, support,
        lead_count (folded count), fwd, rev, sum_mapq, pos_sum
        (int32-wrapping sum of folded head positions — the host
        verifies its own merge_inner+resplit produced the same child
        before consuming these stats), support_sa (count of split-read
        leads — the DEL genotyper's SUPPORT_SA). Rows 9-17 phase-vote
        tallies (phase_tallies, pre-fold unique-read counts): hp0, hp1,
        hp2, hp_other, ps_win, ps_win_cnt, ps_second_cnt, ps_null,
        mixed. Row 18 the child's parent cluster id (host children map
        ordinally within a parent: both sides order by ascending svlen
        bin). Row 19 the parent's resplit float32-ambiguity flag (set
        -> the host resplit decides; stats withheld). Row 20 slot 0 =
        n_children, slot 1 = n_clusters. A task with more than SLOTS
        children reports n_children > SLOTS and the caller falls back
        to the exact host sweep (capacity, not correctness).
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
        "ref_end": packed[10],
        "qry_start": packed[11],
        "qry_end": packed[12],
        "hap": packed[13],
        "ps": packed[14],
    }
    clustered = _cluster_body(sig, cluster_r=cluster_r, cluster_repeat_h=cluster_repeat_h,
                              cluster_repeat_h_max=cluster_repeat_h_max,
                              cluster_merge_bnd=cluster_merge_bnd,
                              cluster_merge_len=cluster_merge_len, minsvlen=minsvlen,
                              binsize=binsize, resplit_binsize=resplit_binsize,
                              global_repeat=global_repeat,
                              # reference order is merge_inner THEN resplit
                              # (cluster.py:330-339); merge_inner is host-side,
                              # so the host also resplits (device_call.py)
                              do_resplit=False)
    elements = jnp.stack([
        clustered["cluster_id"].astype(jnp.int32),
        clustered["orig_idx"].astype(jnp.int32),
        clustered["valid"].astype(jnp.int32),
    ])

    folded = merge_inner_fold(clustered, cluster_merge_pos=cluster_merge_pos,
                              global_repeat=global_repeat)
    # svlen-histogram resplit on device (reference: cluster.py:125-161):
    # all statistics below segment by the RESPLIT CHILD, so multi-child
    # clusters consume device stats too (previously fb_resplit fallback)
    child, n_children, uncertain_parent = resplit_child_ids(
        folded, resplit_binsize=resplit_binsize, minsvlen=minsvlen,
        cluster_merge_len=cluster_merge_len)
    folded_child = dict(folded)
    folded_child["cluster_id"] = child
    folded_child["n_clusters"] = n_children
    stats = call_statistics(folded_child)
    phase = phase_tallies({"cluster_id": child, "valid": folded["valid_all"],
                           "read_id": folded["read_id"], "hap": folded["hap"],
                           "ps": folded["ps"]}, folded["pos"].shape[0])

    n = folded["pos"].shape[0]
    valid = folded["valid"]
    sum_mapq = seg_sum(jnp.where(valid, folded["mapq"], 0), child, n)
    pos_sum = seg_sum(jnp.where(valid, folded["pos"], 0), child, n)
    support_sa = seg_sum(jnp.where(valid & (folded["sa"] > 0), 1, 0), child, n)
    # per child slot: its parent cluster id (ordinal host<->device child
    # mapping) and the parent's float32-ambiguity flag
    parent = seg_max(jnp.where(folded["valid_all"], folded["cluster_id"], -1),
                     child, n)
    child_uncertain = jnp.take(uncertain_parent, jnp.clip(parent, 0, n - 1))

    slots = max(1024, n // 8)
    full = jnp.stack([
        stats["raw_pos_center"],
        stats["svlen"],
        stats["support"].astype(jnp.int32),
        stats["lead_count"].astype(jnp.int32),
        stats["fwd"].astype(jnp.int32),
        stats["rev"].astype(jnp.int32),
        sum_mapq.astype(jnp.int32),
        pos_sum.astype(jnp.int32),
        support_sa.astype(jnp.int32),
        phase["hp0"], phase["hp1"], phase["hp2"], phase["hp_other"],
        phase["ps_win"], phase["ps_win_cnt"], phase["ps_second_cnt"],
        phase["ps_null"], phase["mixed"],
        parent.astype(jnp.int32),
        child_uncertain.astype(jnp.int32),
        jnp.zeros((n,), jnp.int32)
           .at[0].set(n_children.astype(jnp.int32))
           .at[1].set(clustered["n_clusters"].astype(jnp.int32)),
    ])
    # ONE flat buffer: every D2H transfer pays ~22ms of tunnel latency,
    # so two result arrays would double the fixed cost per dispatch
    return jnp.concatenate([elements.reshape(-1), full[:, :slots].reshape(-1)])


STATS_ROWS = 21          # 9 calling stats + 9 phase tallies + parent +
                         # uncertain + counts — ALL PER RESPLIT CHILD
STATS_PARENT_ROW = 18    # child's parent (pre-resplit) cluster id
STATS_UNCERTAIN_ROW = 19  # parent's resplit float32-ambiguity flag
STATS_NC_ROW = 20        # slot 0 = n_children, slot 1 = n_clusters


def split_call_task_output(flat: np.ndarray, n: int):
    """Split the flat call_task_packed result back into (elements (3, N),
    stats (STATS_ROWS, SLOTS))."""
    elements = flat[:3 * n].reshape(3, n)
    stats = flat[3 * n:].reshape(STATS_ROWS, -1)
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


def phase_tallies(clustered: dict, n: int) -> dict:
    """Per-cluster phase-vote tallies (reference: postprocessing.py:626-654
    phase_sv): unique-READ counts per haplotype value and the phase-set
    mode, computed pre-fold (the host's by_read dict deduplicates a
    read's leads, so element multiplicity is irrelevant — uniqueness per
    read is what matters).

    The host vote (util.most_common + postprocess._vote) is a pure
    function of the {value: unique-read-count} multiset — ties sort by
    (count, value-string) descending — so the host can reproduce it
    EXACTLY from these integer tallies. Two cases the counts cannot
    decide ride back as flags and force the exact host fallback:
    `mixed` (a read whose elements disagree on hap or ps — the host's
    last-lead-wins would apply) and a non-null phase-set count tie
    (winner selection needs string comparison of the tied values).
    """
    cid = clustered["cluster_id"]
    valid = clustered["valid"]
    read = clustered["read_id"]
    hap = clustered["hap"]
    ps = clustered["ps"]
    INT32_MAX = jnp.int32(2 ** 31 - 1)

    def shift(v):
        return jnp.concatenate([v[:1], v[:-1]])

    order = jnp.lexsort((jnp.where(valid, read, INT32_MAX),
                         jnp.where(valid, cid, INT32_MAX)))
    cid_r = jnp.take(cid, order)
    read_r = jnp.take(read, order)
    hap_r = jnp.take(hap, order)
    ps_r = jnp.take(ps, order)
    valid_r = jnp.take(valid, order)

    same_run = (valid_r & shift(valid_r) & (cid_r == shift(cid_r))
                & (read_r == shift(read_r)))
    same_run = same_run.at[0].set(False)
    first = valid_r & ~same_run   # representative element per (cluster, read)
    mixed_e = same_run & ((hap_r != shift(hap_r)) | (ps_r != shift(ps_r)))
    seg = jnp.where(valid_r, cid_r, 0)
    mixed = seg_max(jnp.where(valid_r, mixed_e.astype(jnp.int32), 0), seg, n)

    def ucount(cond):
        return seg_sum(jnp.where(first & cond, 1, 0), seg, n)

    hp0 = ucount(hap_r == 0)
    hp1 = ucount(hap_r == 1)
    hp2 = ucount(hap_r == 2)
    hp_other = ucount((hap_r < 0) | (hap_r > 2))
    ps_null = ucount(ps_r < 0)

    # phase-set mode among non-null representatives: run-length count per
    # (cluster, ps) after a second sort, then per-cluster max + second max
    rep = first & (ps_r >= 0)
    order2 = jnp.lexsort((jnp.where(rep, ps_r, INT32_MAX),
                          jnp.where(rep, cid_r, INT32_MAX)))
    cid_p = jnp.take(cid_r, order2)
    ps_p = jnp.take(ps_r, order2)
    rep_p = jnp.take(rep, order2)
    new_run = rep_p & (~shift(rep_p) | (cid_p != shift(cid_p))
                       | (ps_p != shift(ps_p)))
    new_run = new_run.at[0].set(rep_p[0])
    run_id = jnp.clip(jnp.cumsum(new_run.astype(jnp.int32)) - 1, 0, n - 1)
    run_count = seg_sum(jnp.where(rep_p, 1, 0), run_id, n)
    run_cid = seg_max(jnp.where(new_run, cid_p, -1), run_id, n)
    run_ps = seg_max(jnp.where(new_run, ps_p, -1), run_id, n)
    run_valid = run_count > 0

    rc = jnp.where(run_valid, run_cid, 0)
    win_cnt = seg_max(jnp.where(run_valid, run_count, 0), rc, n)
    run_idx = jnp.arange(n, dtype=jnp.int32)
    is_max = run_valid & (run_count == jnp.take(win_cnt, rc))
    first_max_idx = seg_min(jnp.where(is_max, run_idx, INT32_MAX), rc, n)
    win_ps = jnp.where(first_max_idx < INT32_MAX,
                       jnp.take(run_ps, jnp.clip(first_max_idx, 0, n - 1)), -1)
    second_cnt = seg_max(
        jnp.where(run_valid & (run_idx != jnp.take(first_max_idx, rc)),
                  run_count, 0), rc, n)

    i32 = jnp.int32
    return {
        "hp0": hp0.astype(i32), "hp1": hp1.astype(i32), "hp2": hp2.astype(i32),
        "hp_other": hp_other.astype(i32),
        "ps_win": win_ps.astype(i32), "ps_win_cnt": win_cnt.astype(i32),
        "ps_second_cnt": second_cnt.astype(i32),
        "ps_null": ps_null.astype(i32), "mixed": mixed.astype(i32),
    }


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
