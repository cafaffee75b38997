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

SCALE = 1 << 20          # rational-key fraction scale (see module doc)
NMAX = 1024              # max group size for key exactness
CMM_MAX = 1023           # max combine_match_max for key exactness
SPAN_MAX = 1 << 18       # max local coordinate / |svlen| (int32 budget)
EPS = 1e-5               # float32-vs-float64 ambiguity margin

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
    assign, ngroups, flags = _greedy_loop(
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
    return {"assign": np.asarray(assign)[:C], "flags": np.asarray(flags)}
