"""
Batched affine-gap (Gotoh) alignment scores on TPU: Pallas wavefront
kernel, the scoring half of the banded-POA replacement for SPOA
(reference: local_asm.py:26-73 size-tiered scoring; pyspoa.poa).

Same anti-diagonal formulation as ops/edit_distance_jax.py but with the
three Gotoh state vectors advanced per diagonal:

    H_t[i] = max(H_{t-2}[i-1] + s(a_i, b_j), E_t[i], F_t[i])
    E_t[i] = max(H_{t-1}[i] + go + ge, E_{t-1}[i] + ge)      (gap in A)
    F_t[i] = max(H_{t-1}[i-1] + go + ge, F_{t-1}[i-1] + ge)  (gap in B)

All updates are elementwise/shift ops over [tile, L] vectors. Scores
are exact global (NW) affine alignment scores; an optional band masks
cells with |j - i - (lb-la)/2-ish| > band (cells outside the band score
-inf), matching the banded host aligner's search space.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(1 << 20)


def _score_kernel(a_ref, b_rev_ref, la_ref, lb_ref, params_ref, out_ref):
    tb, L = a_ref.shape

    a_sh = a_ref[:, :]
    la = la_ref[:, :]
    lb = lb_ref[:, :]
    match = params_ref[0, 0]
    mismatch = params_ref[0, 1]
    go = params_ref[0, 2]
    ge = params_ref[0, 3]
    band = params_ref[0, 4]

    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, L), dimension=1)
    onehot_la = (lane == la).astype(jnp.int32)
    dep0 = jnp.minimum(a_sh, 0)  # data-dependent zero (Mosaic carry layout)

    # t=0: H(0,0)=0; t=1: gap openers
    h_prev2 = jnp.where(lane == 0, 0, NEG) + dep0
    h_prev1 = jnp.where(lane <= 1, go + ge, NEG) + dep0
    e_prev1 = jnp.where(lane == 0, go + ge, NEG) + dep0
    f_prev1 = jnp.where(lane == 1, go + ge, NEG) + dep0
    ans0 = jnp.where(la + lb == 1, onehot_la * (go + ge), 0) + dep0

    b_roll0 = b_rev_ref[:, :]

    def step(t, carry):
        h_prev2, h_prev1, e_prev1, f_prev1, b_roll, ans = carry
        from jax.experimental.pallas import tpu as pltpu
        b_roll = pltpu.roll(b_roll, 1, 1)
        bchar = jnp.concatenate([jnp.zeros((tb, 1), dtype=b_roll.dtype),
                                 b_roll[:, :-1]], axis=1)
        sub = jnp.where(a_sh == bchar, match, mismatch)

        def shift(x):
            return jnp.concatenate([jnp.full((tb, 1), NEG), x[:, :-1]], axis=1)

        e = jnp.maximum(h_prev1 + go + ge, e_prev1 + ge)                  # gap in A: (i, j-1)
        f = jnp.maximum(shift(h_prev1) + go + ge, shift(f_prev1) + ge)    # gap in B: (i-1, j)
        m = shift(h_prev2) + sub                                          # diag (i-1, j-1)
        h = jnp.maximum(jnp.maximum(m, e), f)

        # boundary columns/rows: H(0,t) = H(t,0) = go + ge*t
        h = jnp.where(lane == 0, go + ge * t, h)
        e = jnp.where(lane == 0, go + ge * t, e)
        h = jnp.where(lane == t, jnp.maximum(h, go + ge * t), h)
        f = jnp.where(lane == t, jnp.maximum(f, go + ge * t), f)

        valid = (lane <= t) & (lane <= la) & ((t - lane) <= lb)
        # band on |j - i| = |t - 2i| (0 disables)
        in_band = (band <= 0) | (jnp.abs(t - 2 * lane) <= band + jnp.abs(lb - la))
        keep = valid & in_band
        h = jnp.where(keep, h, NEG)
        e = jnp.where(keep, e, NEG)
        f = jnp.where(keep, f, NEG)

        hit = (t == la + lb)
        ans = jnp.where(hit, h * onehot_la, ans)
        return h_prev1, h, e, f, b_roll, ans

    _, _, _, _, _, ans = jax.lax.fori_loop(
        2, 2 * L + 1, step, (h_prev2, h_prev1, e_prev1, f_prev1, b_roll0, ans0))
    out_ref[:, :] = ans


@partial(jax.jit, static_argnames=("tile",))
def affine_score_batch_pallas(a, b, la, lb, match=10, mismatch=-10, gap_open=-20,
                              gap_extend=0, band=0, tile: int = 128):
    """Global affine-gap alignment scores for padded pairs on TPU."""
    from jax.experimental import pallas as pl

    B, L = a.shape
    assert L % 128 == 0
    pad_b = (-B) % tile
    if pad_b:
        a = jnp.pad(a, ((0, pad_b), (0, 0)))
        b = jnp.pad(b, ((0, pad_b), (0, 0)))
        la = jnp.pad(la, (0, pad_b))
        lb = jnp.pad(lb, (0, pad_b))
    Bp = a.shape[0]

    a_sh = jnp.concatenate([jnp.zeros((Bp, 1), dtype=a.dtype), a[:, :L - 1]], axis=1)
    b_rev = jnp.flip(b, axis=1)
    la_bc = jnp.broadcast_to(la.reshape(-1, 1).astype(jnp.int32), (Bp, L))
    lb_bc = jnp.broadcast_to(lb.reshape(-1, 1).astype(jnp.int32), (Bp, L))
    params = jnp.array([[match, mismatch, gap_open, gap_extend, band]], dtype=jnp.int32)

    out = pl.pallas_call(
        _score_kernel,
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
            pl.BlockSpec((1, 8), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, L), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, L), jnp.int32),
    )(a_sh.astype(jnp.int32), b_rev.astype(jnp.int32), la_bc, lb_bc,
      jnp.pad(params, ((0, 0), (0, 3))))
    return jnp.sum(out[:B], axis=1)


@partial(jax.jit, static_argnames=())
def affine_score_batch_jnp(a, b, la, lb, match=10, mismatch=-10, gap_open=-20,
                           gap_extend=0):
    """jnp scan fallback (CPU), same wavefront recurrence, unbanded."""
    B, L = a.shape
    lane = jnp.arange(L, dtype=jnp.int32)

    def one_pair(av, bv, m_, n_):
        a_sh = jnp.concatenate([jnp.zeros((1,), dtype=av.dtype), av[:L - 1]])
        b_rev = jnp.flip(bv)
        onehot = (lane == m_).astype(jnp.int32)

        h_prev2 = jnp.where(lane == 0, 0, NEG)
        h_prev1 = jnp.where(lane <= 1, gap_open + gap_extend, NEG)
        e_prev1 = jnp.where(lane == 0, gap_open + gap_extend, NEG)
        f_prev1 = jnp.where(lane == 1, gap_open + gap_extend, NEG)
        ans = jnp.where(m_ + n_ == 1, gap_open + gap_extend,
                        jnp.where(m_ + n_ == 0, 0, NEG))

        def shift(x):
            return jnp.concatenate([jnp.array([NEG], dtype=jnp.int32), x[:-1]])

        def step(carry, t):
            h_prev2, h_prev1, e_prev1, f_prev1, b_roll, ans = carry
            b_roll = jnp.roll(b_roll, 1)
            bchar = jnp.concatenate([jnp.zeros((1,), dtype=b_roll.dtype), b_roll[:-1]])
            sub = jnp.where(a_sh == bchar, match, mismatch)
            e = jnp.maximum(h_prev1 + gap_open + gap_extend, e_prev1 + gap_extend)
            f = jnp.maximum(shift(h_prev1) + gap_open + gap_extend,
                            shift(f_prev1) + gap_extend)
            m = shift(h_prev2) + sub
            h = jnp.maximum(jnp.maximum(m, e), f)
            h = jnp.where(lane == 0, gap_open + gap_extend * t, h)
            e = jnp.where(lane == 0, gap_open + gap_extend * t, e)
            h = jnp.where(lane == t, jnp.maximum(h, gap_open + gap_extend * t), h)
            f = jnp.where(lane == t, jnp.maximum(f, gap_open + gap_extend * t), f)
            valid = (lane <= t) & (lane <= m_) & ((t - lane) <= n_)
            h = jnp.where(valid, h, NEG)
            e = jnp.where(valid, e, NEG)
            f = jnp.where(valid, f, NEG)
            ans = jnp.where(t == m_ + n_, h[m_], ans)
            return (h_prev1, h, e, f, b_roll, ans), None

        (_, _, _, _, _, ans), _ = jax.lax.scan(
            step, (h_prev2, h_prev1, e_prev1, f_prev1, b_rev, ans),
            jnp.arange(2, 2 * L + 1, dtype=jnp.int32))
        return ans

    return jax.vmap(one_pair)(a.astype(jnp.int32), b.astype(jnp.int32),
                              la.astype(jnp.int32), lb.astype(jnp.int32))
