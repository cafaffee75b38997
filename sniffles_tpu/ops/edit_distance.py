"""
Edit (Levenshtein) distance kernels.

Replaces `edlib.align(...)['editDistance']` (reference: sv.py:287,
snfp.py:103 — global/NW distance between INS alt sequences when merging
across samples).

Two implementations:
  * `edit_distance` — host-side Myers bit-parallel algorithm on Python
    big ints: O(n*m/w); exact, used by the host pipeline.
  * `edit_distance_batch` — batched anti-diagonal wavefront DP in JAX
    for the TPU device pipeline (ops/edit_distance_jax.py), operating
    on padded uint8 sequence tensors. Exact for lengths <= the padded
    size; pairs are scored in parallel across the batch.
"""
from __future__ import annotations

import numpy as np


def edit_distance(a: str, b: str, k: int = -1) -> int:
    """Global (NW) Levenshtein distance via Myers' bit-parallel scan.

    With k >= 0 the result is exact when <= k, and k+1 when the true
    distance exceeds k (the bounded form the identity gates need —
    `edlib.align(..., k=...)` semantics). Common prefix/suffix trimming
    and a per-column abort (`score - remaining_cols > k` proves
    exceedance) make near-identical and far-apart pairs cheap; both are
    exact under unit edit costs.

    Dispatches to the uint64-blocked C implementation in native/bamcore.cc
    when available (same algorithm, ~100x faster than Python big ints for
    kb-scale INS sequences); this pure-Python version is the fallback and
    the exactness reference."""
    # trim common prefix / suffix (exact under unit costs)
    lo = 0
    hi_a, hi_b = len(a), len(b)
    while lo < hi_a and lo < hi_b and a[lo] == b[lo]:
        lo += 1
    while hi_a > lo and hi_b > lo and a[hi_a - 1] == b[hi_b - 1]:
        hi_a -= 1
        hi_b -= 1
    a = a[lo:hi_a]
    b = b[lo:hi_b]
    m = len(a)
    n = len(b)
    if k >= 0 and abs(m - n) > k:
        return k + 1
    if m == 0:
        return n
    if n == 0:
        return m
    try:
        ab = a.encode("ascii")
        bb = b.encode("ascii")
    except UnicodeEncodeError:
        ab = None
    if ab is not None:
        from sniffles_tpu.io import native
        lib = native.get_lib()
        if lib is not None and hasattr(lib, "bamcore_edit_distance_k"):
            return int(lib.bamcore_edit_distance_k(ab, m, bb, n, k))
        if lib is not None and hasattr(lib, "bamcore_edit_distance"):
            d = int(lib.bamcore_edit_distance(ab, m, bb, n))
            return d if k < 0 or d <= k else k + 1
    # Build match bitmasks for the pattern
    peq: dict[str, int] = {}
    for i, c in enumerate(a):
        peq[c] = peq.get(c, 0) | (1 << i)

    mask = (1 << m) - 1
    hibit = 1 << (m - 1)
    pv = mask
    mv = 0
    score = m
    for c in b:
        eq = peq.get(c, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = (mv | (~(xh | pv) & mask)) & mask
        mh = pv & xh
        if ph & hibit:
            score += 1
        if mh & hibit:
            score -= 1
        ph = ((ph << 1) | 1) & mask
        mv_new = ph & xv
        pv = ((mh << 1) | (~(xv | ph) & mask)) & mask
        mv = mv_new
        n -= 1
        if k >= 0 and score - n > k:
            return k + 1
    return score


def edit_distance_dp(a: str, b: str) -> int:
    """Reference O(n*m) DP (for testing the bit-parallel version)."""
    m, n = len(a), len(b)
    prev = np.arange(n + 1, dtype=np.int32)
    for i in range(1, m + 1):
        curr = np.empty(n + 1, dtype=np.int32)
        curr[0] = i
        ai = a[i - 1]
        for j in range(1, n + 1):
            cost = 0 if ai == b[j - 1] else 1
            curr[j] = min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + cost)
        prev = curr
    return int(prev[n])


def identity_gate(len_mean: float, distance: int, limit: float) -> bool:
    """The merge gate ((len_mean - d) / len_mean) > limit (reference: sv.py:289)."""
    return ((len_mean - distance) / len_mean) > limit
