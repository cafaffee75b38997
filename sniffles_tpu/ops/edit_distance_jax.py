"""
Batched edit-distance on TPU: Pallas anti-diagonal wavefront kernel.

Replaces edlib for batch workloads (reference: sv.py:287 and
snfp.py:103 gate INS merges by pairwise alt-sequence distance; combine
over thousands of blocks evaluates many pairs). The DP is formulated
over anti-diagonals so every step is an elementwise min over shifted
vectors — no in-row dependencies — mapping straight onto the VPU:

    diag_t[i] = min(diag_{t-1}[i-1] + 1,
                    diag_{t-1}[i]   + 1,
                    diag_{t-2}[i-1] + cost(a[i-1], b[t-i-1]))

with b accessed through a per-step circular roll of the reversed
sequence. A tile of pairs advances 2*L steps in VMEM; the result
D(la, lb) is harvested on the step where t == la + lb.

`edit_distance_batch` dispatches to the Pallas kernel on TPU and to a
jnp scan implementation elsewhere; both are exact (validated against
the host Myers implementation in tests/test_edit_distance_kernel.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1 << 20  # plain int: jnp constants would be captured consts in the Pallas kernel


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _ed_kernel(a_ref, b_rev_ref, la_ref, lb_ref, out_ref):
    # Lane dimension is exactly L (a multiple of 128 — Mosaic needs
    # 128-aligned vectors); lane i carries DP row index i, so sequence
    # lengths must satisfy max(la, lb) <= L - 1 (enforced by the caller).
    # la/lb arrive lane-broadcast ([TB, L]) and the answer is written
    # one-hot at lane la ([TB, L], summed by the caller): Mosaic cannot
    # relayout [TB, 1] vectors out of reductions.
    tb, L = a_ref.shape

    a_sh = a_ref[:, :]                      # a_sh[:, i] == a[i-1] (precomputed on host side)
    la = la_ref[:, :]                       # [TB, L], lane-broadcast
    lb = lb_ref[:, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, L), dimension=1)
    onehot_la = (lane == la).astype(jnp.int32)

    # dep0 is always 0 but data-dependent: the fori_loop carry layout is
    # fixed by its init, and a purely iota-derived (sublane-replicated)
    # init cannot accept the body's non-replicated results in Mosaic.
    dep0 = jnp.minimum(a_sh, 0)
    d_prev2 = jnp.where(lane == 0, 0, BIG) + dep0   # diag t=0: D(0,0)=0
    d_prev1 = jnp.where(lane <= 1, 1, BIG) + dep0   # diag t=1: D(0,1)=D(1,0)=1
    ans0 = jnp.where(la + lb == 1, onehot_la, 0) + dep0

    b_roll0 = b_rev_ref[:, :]                       # [TB, L] reversed b

    def step(t, carry):
        d_prev2, d_prev1, b_roll, ans = carry
        from jax.experimental.pallas import tpu as pltpu
        b_roll = pltpu.roll(b_roll, 1, 1)
        # cost(a[i-1], b[t-i-1]) at lane i: b_roll[:, i-1] holds b[t-i-1]
        bchar = jnp.concatenate([jnp.zeros((tb, 1), dtype=b_roll.dtype),
                                 b_roll[:, :-1]], axis=1)
        cost = jnp.where(a_sh == bchar, 0, 1).astype(jnp.int32)

        up = d_prev1 + 1                             # D(i, j-1): same lane
        left = jnp.concatenate([jnp.full((tb, 1), BIG), d_prev1[:, :-1]], axis=1) + 1
        diagv = jnp.concatenate([jnp.full((tb, 1), BIG), d_prev2[:, :-1]], axis=1) + cost

        d = jnp.minimum(jnp.minimum(up, left), diagv)
        # boundaries: D(0, t) = t ; D(t, 0) = t
        d = jnp.where(lane == 0, t, d)
        d = jnp.where(lane == t, jnp.minimum(d, t), d)
        # out-of-range lanes
        valid = (lane <= t) & (lane <= la) & ((t - lane) <= lb)
        d = jnp.where(valid, d, BIG)

        hit = (t == la + lb)
        ans = jnp.where(hit, d * onehot_la, ans)
        return d_prev1, d, b_roll, ans

    _, _, _, ans = jax.lax.fori_loop(2, 2 * L + 1, step,
                                     (d_prev2, d_prev1, b_roll0, ans0))
    out_ref[:, :] = ans


@partial(jax.jit, static_argnames=("tile",))
def edit_distance_batch_pallas(a: jnp.ndarray, b: jnp.ndarray,
                               la: jnp.ndarray, lb: jnp.ndarray,
                               tile: int = 128) -> jnp.ndarray:
    """
    a, b: [B, L] uint8 (padded); la, lb: [B] int32 actual lengths with
    max(la, lb) <= L - 1. L must be a multiple of 128 (Mosaic lane
    alignment). Returns [B] int32 edit distances.
    """
    from jax.experimental import pallas as pl

    B, L = a.shape
    assert L % 128 == 0, "lane dimension must be 128-aligned"
    pad_b = (-B) % tile
    if pad_b:
        a = jnp.pad(a, ((0, pad_b), (0, 0)))
        b = jnp.pad(b, ((0, pad_b), (0, 0)))
        la = jnp.pad(la, (0, pad_b))
        lb = jnp.pad(lb, (0, pad_b))
    Bp = a.shape[0]

    # a_sh[:, i] = a[i-1] with sentinel at lane 0
    a_sh = jnp.concatenate([jnp.zeros((Bp, 1), dtype=a.dtype), a[:, :L - 1]], axis=1)
    b_rev = jnp.flip(b, axis=1)

    la_bc = jnp.broadcast_to(la.reshape(-1, 1).astype(jnp.int32), (Bp, L))
    lb_bc = jnp.broadcast_to(lb.reshape(-1, 1).astype(jnp.int32), (Bp, L))
    out = pl.pallas_call(
        _ed_kernel,
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, L), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, L), jnp.int32),
    )(a_sh.astype(jnp.int32), b_rev.astype(jnp.int32), la_bc, lb_bc)
    # answers are one-hot at lane la; reduce outside the kernel
    return jnp.sum(out[:B], axis=1)


# ---------------------------------------------------------------------------
# jnp fallback (same wavefront, vmapped scan) — used on CPU
# ---------------------------------------------------------------------------

@jax.jit
def edit_distance_batch_jnp(a: jnp.ndarray, b: jnp.ndarray,
                            la: jnp.ndarray, lb: jnp.ndarray) -> jnp.ndarray:
    B, L = a.shape
    lane = jnp.arange(L + 1, dtype=jnp.int32)

    def one_pair(av, bv, m, n):
        a_sh = jnp.concatenate([jnp.zeros((1,), dtype=av.dtype), av])
        b_rev = jnp.flip(bv)

        d_prev2 = jnp.where(lane == 0, 0, BIG)
        d_prev1 = jnp.where(lane <= 1, 1, BIG)
        ans = jnp.where(m + n == 0, 0, jnp.where(m + n == 1, 1, BIG))

        def step(carry, t):
            d_prev2, d_prev1, b_roll, ans = carry
            b_roll = jnp.roll(b_roll, 1)
            bchar = jnp.concatenate([jnp.zeros((1,), dtype=b_roll.dtype), b_roll])
            cost = jnp.where(a_sh == bchar, 0, 1).astype(jnp.int32)
            up = d_prev1 + 1
            left = jnp.concatenate([jnp.array([BIG], dtype=jnp.int32), d_prev1[:-1]]) + 1
            diagv = jnp.concatenate([jnp.array([BIG], dtype=jnp.int32), d_prev2[:-1]]) + cost
            d = jnp.minimum(jnp.minimum(up, left), diagv)
            d = jnp.where(lane == 0, t, d)
            d = jnp.where(lane == t, jnp.minimum(d, t), d)
            valid = (lane <= t) & (lane <= m) & ((t - lane) <= n)
            d = jnp.where(valid, d, BIG)
            ans = jnp.where(t == m + n, d[m], ans)
            return (d_prev1, d, b_roll, ans), None

        (_, _, _, ans), _ = jax.lax.scan(step, (d_prev2, d_prev1, b_rev, ans),
                                         jnp.arange(2, 2 * L + 1, dtype=jnp.int32))
        return ans

    return jax.vmap(one_pair)(a.astype(jnp.int32), b.astype(jnp.int32),
                              la.astype(jnp.int32), lb.astype(jnp.int32))


def encode_pairs(pairs: list[tuple[str, str]], max_len: int | None = None):
    """Pack string pairs into padded uint8 arrays for the batch kernels."""
    if max_len is None:
        max_len = max((max(len(a), len(b)) for a, b in pairs), default=1)
        # +1: the Pallas kernel needs lane index la <= L-1
        max_len = max(128, int(np.ceil((max_len + 1) / 128.0)) * 128)
    B = len(pairs)
    a = np.zeros((B, max_len), dtype=np.uint8)
    b = np.zeros((B, max_len), dtype=np.uint8)
    la = np.zeros(B, dtype=np.int32)
    lb = np.zeros(B, dtype=np.int32)
    for i, (x, y) in enumerate(pairs):
        xa = np.frombuffer(x.encode("ascii"), dtype=np.uint8)[:max_len]
        ya = np.frombuffer(y.encode("ascii"), dtype=np.uint8)[:max_len]
        a[i, :len(xa)] = xa
        b[i, :len(ya)] = ya
        la[i] = len(xa)
        lb[i] = len(ya)
    return a, b, la, lb


def build_distance_cache(group_alts: list[str], cand_alts: list[str],
                         max_len: int = 1023) -> dict[tuple[str, str], int]:
    """
    Precompute the pairwise distance matrix (group first-alt x candidate
    alt) used by the combine merge gate (reference: sv.py:280-289), in
    one device batch. Pairs longer than max_len are left to the host
    Myers fallback.
    """
    ga = sorted({a for a in group_alts if a and len(a) <= max_len})
    ca = sorted({b for b in cand_alts if b and len(b) <= max_len})
    pairs = [(a, b) for a in ga for b in ca if a != b]
    if not pairs:
        return {}
    dists = edit_distance_batch(pairs)
    cache = {p: int(d) for p, d in zip(pairs, dists)}
    for a in ga:
        cache[(a, a)] = 0
    return cache


# Only batches at least this many DP cells go to the device: the native
# blocked-Myers host scan does ~64 cells/word-op per core, so small
# batches lose more to dispatch (and, through the axon tunnel, to
# per-shape compiles) than the MXU-adjacent kernel can win back.
DEVICE_MIN_CELLS = 2 * 10 ** 8

from sniffles_tpu.ops._greedy_consts import ED_DEVICE_MIN_CELLS as _ED_MIRROR  # noqa: E402
assert _ED_MIRROR == DEVICE_MIN_CELLS, \
    "ops/_greedy_consts.ED_DEVICE_MIN_CELLS must mirror DEVICE_MIN_CELLS"


def edit_distance_batch(pairs: list[tuple[str, str]], max_len: int | None = None) -> np.ndarray:
    """Edit distances for a batch of string pairs.

    Dispatch: the native blocked-Myers scan (bamcore) handles everything
    below DEVICE_MIN_CELLS; genuinely large batches go to the Pallas
    wavefront kernel on TPU (or the jnp fallback elsewhere). The batch
    dimension is padded to a power of two so repeated device calls reuse
    a handful of compiled shapes instead of compiling per batch size."""
    cells = sum(len(x) * len(y) for x, y in pairs)
    if cells < DEVICE_MIN_CELLS:
        # stay fully host-side: don't even initialize the JAX backend
        from sniffles_tpu.io import native
        lib = native.get_lib()
        if lib is not None and hasattr(lib, "bamcore_edit_distance"):
            from sniffles_tpu.ops.edit_distance import edit_distance as ed_host
            return np.array([ed_host(x, y) for x, y in pairs], dtype=np.int32)
    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    if not on_tpu:
        from sniffles_tpu.io import native
        lib = native.get_lib()
        if lib is not None and hasattr(lib, "bamcore_edit_distance"):
            from sniffles_tpu.ops.edit_distance import edit_distance as ed_host
            return np.array([ed_host(x, y) for x, y in pairs], dtype=np.int32)
    a, b, la, lb = encode_pairs(pairs, max_len)
    n = a.shape[0]
    n_pad = 16
    while n_pad < n:
        n_pad *= 2
    if n_pad > n:
        pad = ((0, n_pad - n), (0, 0))
        a = np.pad(a, pad)
        b = np.pad(b, pad)
        la = np.pad(la, (0, n_pad - n))
        lb = np.pad(lb, (0, n_pad - n))
    if on_tpu:
        out = edit_distance_batch_pallas(jnp.asarray(a), jnp.asarray(b),
                                         jnp.asarray(la), jnp.asarray(lb))
    else:
        out = edit_distance_batch_jnp(jnp.asarray(a), jnp.asarray(b),
                                      jnp.asarray(la), jnp.asarray(lb))
    return np.asarray(out)[:n]
