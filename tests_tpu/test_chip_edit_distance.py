"""Production-path exercise of the Pallas wavefront ED kernel on the
REAL chip: a combine-scale batch above DEVICE_MIN_CELLS dispatches to
edit_distance_batch_pallas and must be exact against the host Myers
scan (reference semantics: edlib.align at sv.py:287)."""
import numpy as np


def _rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def test_chip_ed_batch_dispatches_and_is_exact():
    import jax
    from sniffles_tpu.ops import edit_distance_jax as edj
    from sniffles_tpu.ops.edit_distance import edit_distance as ed_host

    assert jax.default_backend() in ("tpu", "axon")

    rng = np.random.default_rng(12)
    # 2048 pairs x (512x512 cells) = 5.4e8 cells > DEVICE_MIN_CELLS (2e8)
    pairs = []
    for _ in range(2048):
        a = _rand_seq(rng, int(rng.integers(300, 500)))
        if rng.random() < 0.5:
            b = list(a)
            for _ in range(int(rng.integers(1, 30))):
                b[int(rng.integers(0, len(b)))] = "ACGT"[int(rng.integers(0, 4))]
            b = "".join(b)
        else:
            b = _rand_seq(rng, int(rng.integers(300, 500)))
        pairs.append((a, b))
    cells = sum(len(a) * len(b) for a, b in pairs)
    assert cells >= edj.DEVICE_MIN_CELLS

    dists = edj.edit_distance_batch(pairs)
    assert dists.shape == (len(pairs),)

    # spot-check exactness against the host scan
    idx = rng.choice(len(pairs), size=64, replace=False)
    for i in idx:
        a, b = pairs[i]
        assert int(dists[i]) == ed_host(a, b), (i, len(a), len(b))
