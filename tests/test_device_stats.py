"""Device segment statistics vs the exact host implementations (util.py)."""
import numpy as np
import pytest

from sniffles_tpu import util

jnp = pytest.importorskip("jax.numpy")

from sniffles_tpu.ops.stats import seg_median_modes, seg_trimmed_stdev, seg_most_common_top  # noqa: E402


def make_segments(rng, n_segs, max_len=30, lo=-500, hi=500):
    values, seg_ids, host_groups = [], [], []
    for s in range(n_segs):
        ln = rng.integers(1, max_len)
        vals = rng.integers(lo, hi, size=ln)
        # duplicates to exercise mode logic
        if ln > 3:
            vals[1: 1 + ln // 2] = vals[0]
        host_groups.append(sorted(vals.tolist()))
        for v in sorted(vals):
            values.append(v)
            seg_ids.append(s)
    return (np.array(values, dtype=np.int32), np.array(seg_ids, dtype=np.int32), host_groups)


def test_seg_median_modes_matches_host():
    rng = np.random.default_rng(0)
    values, seg_ids, groups = make_segments(rng, 50)
    n = len(values)
    out = np.asarray(seg_median_modes(jnp.asarray(values), jnp.asarray(seg_ids),
                                      jnp.ones(n, dtype=bool), n))
    for s, vals in enumerate(groups):
        assert out[s] == util.median_modes(vals), (s, vals, out[s])


def test_seg_trimmed_stdev_matches_host():
    rng = np.random.default_rng(1)
    values, seg_ids, groups = make_segments(rng, 50)
    n = len(values)
    out = np.asarray(seg_trimmed_stdev(jnp.asarray(values), jnp.asarray(seg_ids),
                                       jnp.ones(n, dtype=bool), n))
    for s, vals in enumerate(groups):
        expect = util.stdev(util.trim(vals))
        assert abs(out[s] - expect) < 1e-3, (s, vals, out[s], expect)


def test_seg_most_common_top_matches_host():
    rng = np.random.default_rng(2)
    values, seg_ids, groups = make_segments(rng, 50)
    n = len(values)
    out = np.asarray(seg_most_common_top(jnp.asarray(values), jnp.asarray(seg_ids),
                                         jnp.ones(n, dtype=bool), n))
    for s, vals in enumerate(groups):
        assert out[s] == util.most_common_top(vals), (s, vals)


def test_invalid_slots_ignored():
    # invalid elements (padding) sorted to the end of a segment must not
    # affect the statistics
    values = np.array([5, 5, 7, 999, 999], dtype=np.int32)
    seg_ids = np.array([0, 0, 0, 0, 0], dtype=np.int32)
    valid = np.array([True, True, True, False, False])
    out = np.asarray(seg_median_modes(jnp.asarray(values), jnp.asarray(seg_ids),
                                      jnp.asarray(valid), 5))
    assert out[0] == util.median_modes([5, 5, 7])
