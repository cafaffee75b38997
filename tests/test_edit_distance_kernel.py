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
