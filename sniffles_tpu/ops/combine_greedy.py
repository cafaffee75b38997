"""
Device-owned multi-sample combine grouping: an EXACT emulation of the
host's sequential greedy assignment (cluster.resolve_block_groups,
reference: cluster.py:356-390) as a lax.while_loop — the
`_exact_merge_sweep` pattern applied to combine.

The host greedy walks candidates in support-descending order; each
candidate joins the best existing group by
``dist = |pos_mean - pos| + |len_mean - |svlen||`` subject to
``dist <= combine_match * sqrt(min(len_mean, |svlen|))``, capped at
``combine_match_max``, a sequence-identity gate (edit distance of the
candidate alt against the GROUP HEAD's alt, sv.py:280-301), and strict
improvement (ties keep the earliest group in list order). Group means
evolve as candidates join (sv.py:303-313).

This kernel IS that trajectory, one candidate per loop iteration, with
the candidate probe against ALL group slots vectorized (the host's
O(groups) inner scan becomes one masked argmin):

* Group state is kept as INTEGER sums (pos_sum, len_sum, n) in
  dispatch-local coordinates, so distances are exact rationals D/n.
* Cross-group comparisons use an int32-exact total-order key:
  ``key = (D//n) * 2^20 + ((D%n) * 2^20) // n``. Two distinct rational
  distances with denominators <= NMAX=1024 differ by >= 2^-20, so the
  floor-scaled fraction separates them; equal rationals map to equal
  keys; argmin's first-minimum tie-break is exactly the host's
  earliest-group-wins rule. (Requires combine_match_max <= 1023 and
  group size <= 1024 — guarded; overflow flags force the host path.)
* The sqrt threshold and the identity-ratio gate are evaluated in
  float32 where the host uses float64; probes within a ~1e-5 relative
  window of either threshold raise the `ambiguous` flag and the caller
  replays the whole dispatch on the exact host greedy (conservative,
  never wrong). Exact integer ties — the common case with integer
  positions/lengths — are decided exactly by the integer key.
* The identity gate reads a PRECOMPUTED exact edit-distance table
  (group-head alt id x candidate index, radius-gated like
  tasks._prefill_ed_cache); a probe whose pair is missing raises the
  `ed_miss` flag -> host fallback.

The caller (pipeline/tasks.py device combine path) replays the returned
assignment through the real SVGroup objects in the same order, so every
downstream float statistic, QC decision and emission order is the
host's own.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from sniffles_tpu.ops._greedy_consts import (  # noqa: F401  (re-exported)
    CMM_MAX, EPS, NMAX, SCALE, SEG_LMAX, SEGF_AMBIGUOUS, SEGF_ED_MISS,
    SEGF_N_OVERFLOW, SPAN_MAX, TASK_ED_HEADS)

FLAG_AMBIGUOUS, FLAG_ED_MISS, FLAG_N_OVERFLOW = 0, 1, 2


@partial(jax.jit, static_argnames=("cm", "cmm", "limit"))
def _greedy_loop(c_pos, c_len, c_alt, c_count, g_psum, g_lsum, g_n, g_head,
                 ed, n_groups0, *, cm: int, cmm: int, limit: float):
    C = c_pos.shape[0]
    G = g_psum.shape[0]
    H = ed.shape[0]
    slots = jnp.arange(G, dtype=jnp.int32)
    INT32_MAX = jnp.int32(2 ** 31 - 1)
    cm_f = jnp.float32(cm)
    cmm_f = jnp.float32(cmm)
    limit_f = jnp.float32(limit)
    # host semantics for identical alt strings: distance 0, gate passes
    # iff (len_mean - 0)/len_mean = 1.0 > limit (exact in float64)
    pass_same = bool(limit < 1.0)

    state0 = dict(i=jnp.int32(0), ngroups=n_groups0.astype(jnp.int32),
                  psum=g_psum, lsum=g_lsum, n=g_n, head=g_head,
                  assign=jnp.full((C,), -1, dtype=jnp.int32),
                  flags=jnp.zeros((3,), dtype=jnp.int32))

    def cond(st):
        return st["i"] < c_count

    def body(st):
        i = st["i"]
        pos = c_pos[i]
        ln = c_len[i]
        aid = c_alt[i]
        n = st["n"]
        psum = st["psum"]
        lsum = st["lsum"]
        active = (slots < st["ngroups"]) & (n > 0)

        # exact rational distance D/n per group (local coords keep every
        # intermediate inside int32; guarded by the packer)
        pdiff = psum - pos * n
        ldiff = lsum - ln * n
        D = jnp.abs(pdiff) + jnp.abs(ldiff)
        nf = jnp.maximum(n, 1).astype(jnp.float32)
        cap_ok = D <= n * cmm
        shorter_pos = (lsum > 0) & (ln > 0)

        # sqrt-scaled match radius (float32 + ambiguity margin; forced
        # pass when the threshold provably clears the cap, where gate1
        # already decides)
        lmf = lsum.astype(jnp.float32) / nf
        shorter_f = jnp.minimum(lmf, jnp.float32(ln))
        thr_f = cm_f * jnp.sqrt(jnp.maximum(shorter_f, 0.0))
        dist_f = D.astype(jnp.float32) / nf
        forced = thr_f >= cmm_f * (1.0 + 2.0 * EPS)
        pass2 = (dist_f <= thr_f) | forced
        amb2 = (jnp.abs(dist_f - thr_f)
                <= EPS * jnp.maximum(thr_f, 1.0)) & ~forced

        pre = active & cap_ok & shorter_pos
        if limit > 0:
            head = st["head"]
            same = head == aid
            d_ed = ed[jnp.clip(head, 0, H - 1), i]
            have = d_ed >= 0
            ratio = (lmf - d_ed.astype(jnp.float32)) / jnp.maximum(lmf, 1e-9)
            pass3 = jnp.where(same, pass_same, have & (ratio > limit_f))
            amb3 = (~same & have
                    & (jnp.abs(ratio - limit_f) <= EPS))
            miss = ~same & ~have
            miss_hit = jnp.any(pre & pass2 & miss)
        else:
            pass3 = jnp.ones((G,), dtype=bool)
            amb3 = jnp.zeros((G,), dtype=bool)
            miss_hit = jnp.bool_(False)

        eligible = pre & pass2 & pass3
        amb_hit = jnp.any(pre & (amb2 | amb3))

        nd = jnp.maximum(n, 1)
        q = D // nd
        r = D - q * nd
        key = q * SCALE + (r * SCALE) // nd
        key = jnp.where(eligible, key, INT32_MAX)
        best = jnp.argmin(key).astype(jnp.int32)
        found = key[best] < INT32_MAX

        tgt = jnp.where(found, best, st["ngroups"])
        over = n[tgt] + 1 > NMAX
        flags = st["flags"]
        flags = flags.at[FLAG_AMBIGUOUS].max(amb_hit.astype(jnp.int32))
        flags = flags.at[FLAG_ED_MISS].max(miss_hit.astype(jnp.int32))
        flags = flags.at[FLAG_N_OVERFLOW].max(over.astype(jnp.int32))

        return dict(
            i=i + 1,
            ngroups=st["ngroups"] + jnp.where(found, 0, 1).astype(jnp.int32),
            psum=psum.at[tgt].add(pos),
            lsum=lsum.at[tgt].add(ln),
            n=n.at[tgt].add(1),
            head=st["head"].at[tgt].set(
                jnp.where(found, st["head"][tgt], aid)),
            assign=st["assign"].at[i].set(tgt),
            flags=flags,
        )

    final = jax.lax.while_loop(cond, body, state0)
    return final["assign"], final["ngroups"], final["flags"]


def _pow2(x: int, floor: int) -> int:
    size = floor
    while size < x:
        size *= 2
    return size


# (SEGF_* flag bits, TASK_ED_HEADS table depth, and the SEG_LMAX
# per-segment cap live in ops/_greedy_consts so the jax-free client
# packer shares them; a flat sequential loop is O(total^2) — the grid
# runs all segments in lockstep, so wall-clock is
# O(max-per-segment * grid), and one multi-kilo-candidate segment would
# stretch every other segment's padding — the packer hosts those)


@partial(jax.jit, static_argnames=("cm", "cmm", "limit"))
def _greedy_grid_loop(c_pos, c_len, c_alt, c_hord, counts, ed,
                      *, cm: int, cmm: int, limit: float):
    """Whole-task greedy as a SEGMENT-GRID lockstep loop.

    Combine tasks start with an empty frontier, and position gaps >
    combine_match_max split candidates into provably interaction-free
    segments (any cross-segment pos distance alone exceeds the match
    cap), so every segment's sequential trajectory is independent. The
    grid runs them all at once: row s is segment s, loop step i
    processes each segment's i-th candidate (its trajectory order =
    the host's flush-major support-descending order restricted to the
    segment — sufficient for exactness because each group's
    add_candidate order is its segment's relative order). Wall-clock is
    O(max candidates per segment), not O(total candidates): the flat
    while_loop formulation measured 58us/candidate on chip — 14x
    SLOWER than the host at population scale — while the grid runs the
    same trajectories in ~30-50us per lockstep ROW of segments.

    Inputs are (S, L) grids: c_pos segment-rebased local coordinates,
    c_len |svlen|, c_alt segment-local alt ids, c_hord the candidate
    alt's row in the segment's potential-head ED table (-1 when not
    tabulated), counts (S,) per-segment candidate counts, ed (S, K, L)
    exact edit distances (head table row x candidate, -1 = missing).

    Soundness flags (float32 threshold ambiguity, missing ED entry,
    group-size overflow for the rational-key bound) are attributed to
    the segment: the caller replays flagged segments with the live host
    greedy and consumes the device assignment everywhere else — exact
    either way.

    Returns (assign (S, L) segment-local slot ids, segflags (S,)).
    """
    S, L = c_pos.shape
    K = ed.shape[1]
    slots = jnp.arange(L, dtype=jnp.int32)[None, :]
    INT32_MAX = jnp.int32(2 ** 31 - 1)
    cm_f = jnp.float32(cm)
    cmm_f = jnp.float32(cmm)
    limit_f = jnp.float32(limit)
    pass_same = bool(limit < 1.0)
    max_count = jnp.max(counts)

    state0 = dict(i=jnp.int32(0),
                  ngroups=jnp.zeros((S,), jnp.int32),
                  psum=jnp.zeros((S, L), jnp.int32),
                  lsum=jnp.zeros((S, L), jnp.int32),
                  n=jnp.zeros((S, L), jnp.int32),
                  head=jnp.zeros((S, L), jnp.int32),
                  hord=jnp.full((S, L), -1, jnp.int32),
                  assign=jnp.full((S, L), -1, dtype=jnp.int32),
                  segflags=jnp.zeros((S,), dtype=jnp.int32))

    def cond(st):
        return st["i"] < max_count

    def body(st):
        i = st["i"]
        upd = i < counts                        # (S,)
        pos = c_pos[:, i][:, None]              # (S, 1)
        ln = c_len[:, i][:, None]
        aid = c_alt[:, i][:, None]
        n = st["n"]
        psum = st["psum"]
        lsum = st["lsum"]
        active = (slots < st["ngroups"][:, None]) & (n > 0)

        pdiff = psum - pos * n
        ldiff = lsum - ln * n
        D = jnp.abs(pdiff) + jnp.abs(ldiff)
        nf = jnp.maximum(n, 1).astype(jnp.float32)
        cap_ok = D <= n * cmm
        shorter_pos = (lsum > 0) & (ln > 0)

        lmf = lsum.astype(jnp.float32) / nf
        shorter_f = jnp.minimum(lmf, ln.astype(jnp.float32))
        thr_f = cm_f * jnp.sqrt(jnp.maximum(shorter_f, 0.0))
        dist_f = D.astype(jnp.float32) / nf
        forced = thr_f >= cmm_f * (1.0 + 2.0 * EPS)
        pass2 = (dist_f <= thr_f) | forced
        amb2 = (jnp.abs(dist_f - thr_f)
                <= EPS * jnp.maximum(thr_f, 1.0)) & ~forced

        pre = active & cap_ok & shorter_pos
        if limit > 0:
            head = st["head"]
            same = head == aid
            ed_i = ed[:, :, i]                          # (S, K)
            # K is tiny and static: unrolled selects beat a gather
            # inside the loop body (TPU gathers/scatters are the
            # dominant per-iteration cost, measured ~1ms/iter with them)
            d_ed = jnp.full((S, L), -1, dtype=jnp.int32)
            for k in range(K):
                d_ed = jnp.where(st["hord"] == k, ed_i[:, k][:, None], d_ed)
            have = d_ed >= 0
            ratio = (lmf - d_ed.astype(jnp.float32)) / jnp.maximum(lmf, 1e-9)
            pass3 = jnp.where(same, pass_same, have & (ratio > limit_f))
            amb3 = (~same & have
                    & (jnp.abs(ratio - limit_f) <= EPS))
            miss = ~same & ~have
            miss_hit = jnp.any(pre & pass2 & miss, axis=1)       # (S,)
        else:
            pass3 = jnp.ones((S, L), dtype=bool)
            amb3 = jnp.zeros((S, L), dtype=bool)
            miss_hit = jnp.zeros((S,), dtype=bool)

        eligible = pre & pass2 & pass3
        amb_hit = jnp.any(pre & (amb2 | amb3), axis=1)           # (S,)

        nd = jnp.maximum(n, 1)
        q = D // nd
        r = D - q * nd
        key = q * SCALE + (r * SCALE) // nd
        key = jnp.where(eligible, key, INT32_MAX)
        best = jnp.argmin(key, axis=1).astype(jnp.int32)         # (S,)
        found = jnp.min(key, axis=1) < INT32_MAX

        tgt = jnp.where(found, best, st["ngroups"])              # (S,)
        # one-hot updates instead of scatters: the (S,) -> (S, L)
        # scatter lowering costs ~1ms/iteration on TPU; masked
        # element-wise selects are pure VPU work
        onehot = (slots == tgt[:, None]) & upd[:, None]          # (S, L)
        tgt_n = jnp.max(jnp.where(onehot, n, 0), axis=1)
        over = (tgt_n + 1 > NMAX) & upd
        bits = ((amb_hit & upd).astype(jnp.int32) * SEGF_AMBIGUOUS
                + (miss_hit & upd).astype(jnp.int32) * SEGF_ED_MISS
                + over.astype(jnp.int32) * SEGF_N_OVERFLOW)

        create = onehot & ~(found | ~upd)[:, None]
        at_i = slots == i                                        # (S, L)
        return dict(
            i=i + 1,
            ngroups=st["ngroups"] + (upd & ~found).astype(jnp.int32),
            psum=psum + jnp.where(onehot, pos, 0),
            lsum=lsum + jnp.where(onehot, ln, 0),
            n=n + onehot.astype(jnp.int32),
            head=jnp.where(create, aid, st["head"]),
            hord=jnp.where(create, c_hord[:, i][:, None], st["hord"]),
            assign=jnp.where(at_i & upd[:, None], tgt[:, None], st["assign"]),
            segflags=st["segflags"] | bits,
        )

    final = jax.lax.while_loop(cond, body, state0)
    return final["assign"], final["segflags"]


def start_combine_greedy_task(payload: dict, meta: dict):
    """Dispatch the whole-task grid greedy asynchronously (one dispatch
    per (combine task, svtype) — the per-(block, svtype) dispatch
    cadence paid one ~25ms tunnel round trip per block and lost the
    wall-clock it saved) and return a finish() that fetches the result
    — callers under the device service run finish() after dispatching
    the NEXT kernel so the tunnel fetch overlaps device compute.

    payload: c_pos/c_len/c_alt/c_hord (S, L) int32 grids in segment-row
    layout (trimmed; padded to power-of-two here so a handful of
    compiled shapes serve every dispatch), counts (S,), ed_rows (head
    table row), ed_segs, ed_cols, ed_vals (sparse exact ED entries).
    meta: cm, cmm, limit.

    Returns {"assign": (S, L) int32 segment-local slot ids,
    "seg_flags": (S,) int32 SEGF_* bitmasks}.
    """
    c_pos = np.asarray(payload["c_pos"], dtype=np.int32)
    S, L = c_pos.shape
    Sp = _pow2(max(S, 1), 16)
    Lp = _pow2(max(L, 1), 64)

    def pad_g(a, fill=0):
        out = np.full((Sp, Lp), fill, dtype=np.int32)
        out[:S, :L] = a
        return out

    counts = np.zeros(Sp, dtype=np.int32)
    counts[:S] = np.asarray(payload["counts"], dtype=np.int32)
    segs = np.asarray(payload["ed_segs"], dtype=np.int64)
    if len(segs):
        ed = np.full((Sp, TASK_ED_HEADS, Lp), -1, dtype=np.int32)
        ed[segs, np.asarray(payload["ed_rows"], dtype=np.int64),
           np.asarray(payload["ed_cols"], dtype=np.int64)] = \
            np.asarray(payload["ed_vals"], dtype=np.int32)
    else:
        # all-missing table: a width-1 grid reads the same -1 everywhere
        # (dynamic-slice clamps the column index), so the common
        # identical-alleles case skips a multi-MB H2D transfer
        ed = np.full((Sp, TASK_ED_HEADS, 1), -1, dtype=np.int32)

    out = _greedy_grid_loop(
        jnp.asarray(pad_g(c_pos)),
        jnp.asarray(pad_g(np.asarray(payload["c_len"], dtype=np.int32))),
        jnp.asarray(pad_g(np.asarray(payload["c_alt"], dtype=np.int32))),
        jnp.asarray(pad_g(np.asarray(payload["c_hord"], dtype=np.int32),
                          fill=-1)),
        jnp.asarray(counts),
        jnp.asarray(ed),
        cm=int(meta["cm"]), cmm=int(meta["cmm"]),
        limit=float(meta["limit"]))
    for o in out:
        try:
            o.copy_to_host_async()
        except Exception:
            break

    def finish():
        # ONE device_get — each separate fetch pays a full tunnel RT
        assign, segflags = jax.device_get(out)
        return {"assign": np.asarray(assign)[:S, :L],
                "seg_flags": np.asarray(segflags)[:S]}
    return finish


def run_combine_greedy_task(payload: dict, meta: dict) -> dict:
    return start_combine_greedy_task(payload, meta)()


def run_combine_greedy(payload: dict, meta: dict) -> dict:
    """Execute the greedy kernel (in the process owning the JAX client:
    inline CLI, device service, or daemon). payload arrays are TRIMMED;
    padding happens here so the wire stays small and a handful of
    compiled shapes serve every dispatch.

    payload: c_pos/c_len/c_alt (int32, local coords, processing order),
    g_psum/g_lsum/g_n/g_head (int32, K0 initial groups in list order),
    ed_rows/ed_cols/ed_vals (sparse exact ED table entries over
    (alt_id, candidate_index)), n_alts.
    meta: cm, cmm, limit.

    Returns {"assign": (C,) int32 (slot < K0 = initial group, else
    creation order K0, K0+1, ...), "flags": (3,) int32}.
    """
    c_pos = np.asarray(payload["c_pos"], dtype=np.int32)
    C = len(c_pos)
    K0 = len(payload["g_n"])
    Cp = _pow2(max(C, 1), 64)
    Kp = _pow2(max(K0, 1), 16)
    G = Cp + Kp

    def pad_c(a):
        out = np.zeros(Cp, dtype=np.int32)
        out[:C] = a
        return out

    def pad_g(a):
        out = np.zeros(G, dtype=np.int32)
        out[:K0] = a
        return out

    n_alts = int(payload["n_alts"])
    Hp = _pow2(max(n_alts, 1), 16)
    ed = np.full((Hp, Cp), -1, dtype=np.int32)
    rows = np.asarray(payload["ed_rows"], dtype=np.int64)
    if len(rows):
        ed[rows, np.asarray(payload["ed_cols"], dtype=np.int64)] = \
            np.asarray(payload["ed_vals"], dtype=np.int32)

    head = pad_g(payload["g_head"])
    out = _greedy_loop(
        jnp.asarray(pad_c(c_pos)),
        jnp.asarray(pad_c(np.asarray(payload["c_len"], dtype=np.int32))),
        jnp.asarray(pad_c(np.asarray(payload["c_alt"], dtype=np.int32))),
        jnp.int32(C),
        jnp.asarray(pad_g(payload["g_psum"])),
        jnp.asarray(pad_g(payload["g_lsum"])),
        jnp.asarray(pad_g(payload["g_n"])),
        jnp.asarray(head),
        jnp.asarray(ed),
        jnp.int32(K0),
        cm=int(meta["cm"]), cmm=int(meta["cmm"]),
        limit=float(meta["limit"]))
    # ONE device_get: each separate fetch pays a full tunnel round trip
    # (~25ms measured on the axon tunnel), so assign+flags come back in
    # a single batched transfer
    assign, _ngroups, flags = jax.device_get(out)
    return {"assign": np.asarray(assign)[:C], "flags": np.asarray(flags)}
