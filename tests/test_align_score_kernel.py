"""Batched affine-gap score kernels vs the exact host Gotoh aligner."""
import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sniffles_tpu.ops.align import banded_global_affine  # noqa: E402
from sniffles_tpu.ops.align_score_jax import affine_score_batch_jnp  # noqa: E402
from sniffles_tpu.ops.edit_distance_jax import encode_pairs  # noqa: E402


def random_pairs(n, max_len, seed):
    rng = random.Random(seed)
    return [(''.join(rng.choice('ACGT') for _ in range(rng.randint(1, max_len))),
             ''.join(rng.choice('ACGT') for _ in range(rng.randint(1, max_len))))
            for _ in range(n)]


@pytest.mark.parametrize("scoring", [
    (10, -10, -20, 0),    # local_asm small-SV tier (reference: local_asm.py:34-39)
    (13, -5, -25, 0),     # mid tier
    (10, -10, -30, -1),   # large tier
])
def test_affine_scores_match_host(scoring):
    match, mismatch, go, ge = scoring
    pairs = random_pairs(40, 100, seed=match)
    a, b, la, lb = encode_pairs(pairs, 128)
    out = np.asarray(affine_score_batch_jnp(jnp.asarray(a), jnp.asarray(b),
                                            jnp.asarray(la), jnp.asarray(lb),
                                            match=match, mismatch=mismatch,
                                            gap_open=go, gap_extend=ge))
    host = np.array([banded_global_affine(x, y, match=match, mismatch=mismatch,
                                          gap_open=go, gap_extend=ge, slack=128)[2]
                     for x, y in pairs])
    assert (out == host).all()


def test_big_gap_scoring():
    """A single large indel scores go + ge*L, not fragmented gaps."""
    a = "ACGTACGT" + "T" * 50 + "GGCCGGCC"
    b = "ACGTACGT" + "GGCCGGCC"
    pa, pb, la, lb = encode_pairs([(a, b)], 128)
    out = int(np.asarray(affine_score_batch_jnp(jnp.asarray(pa), jnp.asarray(pb),
                                                jnp.asarray(la), jnp.asarray(lb),
                                                match=10, mismatch=-10,
                                                gap_open=-20, gap_extend=0))[0])
    assert out == 16 * 10 - 20


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Pallas TPU kernel needs a TPU backend")
def test_pallas_affine_on_tpu():
    from sniffles_tpu.ops.align_score_jax import affine_score_batch_pallas
    pairs = random_pairs(64, 100, seed=7)
    a, b, la, lb = encode_pairs(pairs, 128)
    out = np.asarray(affine_score_batch_pallas(jnp.asarray(a), jnp.asarray(b),
                                               jnp.asarray(la), jnp.asarray(lb),
                                               match=10, mismatch=-10,
                                               gap_open=-20, gap_extend=-1))
    host = np.array([banded_global_affine(x, y, gap_extend=-1, slack=128)[2]
                     for x, y in pairs])
    assert (out == host).all()
