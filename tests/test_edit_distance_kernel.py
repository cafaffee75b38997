"""Batched edit-distance kernels vs the exact host Myers implementation."""
import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sniffles_tpu.ops.edit_distance import edit_distance  # noqa: E402
from sniffles_tpu.ops.edit_distance_jax import (edit_distance_batch_jnp, encode_pairs,
                                                edit_distance_batch)  # noqa: E402


def random_pairs(n, max_len, seed):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        a = ''.join(rng.choice('ACGT') for _ in range(rng.randint(0, max_len)))
        b = ''.join(rng.choice('ACGT') for _ in range(rng.randint(0, max_len)))
        out.append((a, b))
    return out


def test_jnp_wavefront_exact():
    pairs = random_pairs(80, 120, seed=1)
    a, b, la, lb = encode_pairs(pairs, 128)
    out = np.asarray(edit_distance_batch_jnp(jnp.asarray(a), jnp.asarray(b),
                                             jnp.asarray(la), jnp.asarray(lb)))
    host = np.array([edit_distance(x, y) for x, y in pairs])
    assert (out == host).all()


def test_edge_cases():
    pairs = [("", ""), ("A", ""), ("", "ACGT"), ("ACGT", "ACGT"),
             ("AAAA", "TTTT"), ("A" * 126, "A" * 125 + "T")]
    a, b, la, lb = encode_pairs(pairs, 128)
    out = np.asarray(edit_distance_batch_jnp(jnp.asarray(a), jnp.asarray(b),
                                             jnp.asarray(la), jnp.asarray(lb)))
    host = np.array([edit_distance(x, y) for x, y in pairs])
    assert (out == host).all()


def test_dispatch_wrapper():
    pairs = random_pairs(16, 100, seed=2)
    out = edit_distance_batch(pairs)
    host = np.array([edit_distance(x, y) for x, y in pairs])
    assert (out == host).all()


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Pallas TPU kernel needs a TPU backend")
def test_pallas_kernel_exact_on_tpu():
    from sniffles_tpu.ops.edit_distance_jax import edit_distance_batch_pallas
    pairs = random_pairs(64, 120, seed=3)
    a, b, la, lb = encode_pairs(pairs, 128)
    out = np.asarray(edit_distance_batch_pallas(jnp.asarray(a), jnp.asarray(b),
                                                jnp.asarray(la), jnp.asarray(lb)))
    host = np.array([edit_distance(x, y) for x, y in pairs])
    assert (out == host).all()


def test_bounded_edit_distance_exact():
    """edit_distance(a, b, k): exact when <= k, k+1 when exceeded —
    native and pure-Python paths, incl. trim/abort edge cases."""
    import random
    from sniffles_tpu.ops.edit_distance import edit_distance, edit_distance_dp

    rng = random.Random(13)
    cases = []
    for _ in range(120):
        la, lb = rng.randint(0, 70), rng.randint(0, 70)
        a = "".join(rng.choice("ACGT") for _ in range(la))
        if rng.random() < 0.5 and la > 4:
            b = list(a)
            for _ in range(rng.randint(0, 6)):
                op = rng.choice("sid")
                p = rng.randrange(max(1, len(b)))
                if op == "s":
                    b[p] = rng.choice("ACGT")
                elif op == "i":
                    b.insert(p, rng.choice("ACGT"))
                elif len(b) > 1:
                    del b[p]
            b = "".join(b)
        else:
            b = "".join(rng.choice("ACGT") for _ in range(lb))
        cases.append((a, b))
    cases += [("", ""), ("A", ""), ("", "ACGT"), ("ACGT", "ACGT"),
              ("AAAA", "AAAT"), ("TTTT", "ATTT")]

    for a, b in cases:
        d_true = edit_distance_dp(a, b)
        for k in (-1, 0, 1, d_true - 1, d_true, d_true + 1, 64, 1000):
            d = edit_distance(a, b, k=k)
            if k < 0 or d_true <= k:
                assert d == d_true, (a, b, k, d, d_true)
            else:
                assert d == k + 1, (a, b, k, d, d_true)


def test_bounded_edit_distance_python_fallback(monkeypatch):
    import sniffles_tpu.io.native as native
    import sniffles_tpu.ops.edit_distance as edmod

    monkeypatch.setattr(native, "get_lib", lambda: None)
    assert edmod.edit_distance("ACGTACGT", "ACGAACGT") == 1
    assert edmod.edit_distance("ACGTACGT", "TGCATGCA", k=2) == 3
    assert edmod.edit_distance("A" * 200, "A" * 100 + "C" * 100, k=5) == 6
    assert edmod.edit_distance("A" * 200 + "G", "A" * 200 + "T", k=5) == 1
