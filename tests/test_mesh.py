"""Multi-chip sharded step on the 8-device virtual CPU mesh: psum global
stats and the ppermute boundary halo exchange."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from sniffles_tpu.parallel.mesh import make_genome_mesh
    return make_genome_mesh(8)


def test_sharded_step_runs(mesh8):
    from sniffles_tpu.parallel.mesh import build_sharded_step, shard_batch
    from sniffles_tpu.parallel.engine import default_params
    from sniffles_tpu.signatures import synthetic_batch

    n_dev = 8
    per_dev = 256
    batch = synthetic_batch(per_dev * n_dev - 8, 4 * n_dev, seed=1,
                            genome_span=50_000 * n_dev, batch_size=per_dev * n_dev)
    sig = {k: jnp.asarray(v) for k, v in shard_batch(batch.as_dict(), n_dev).items()}
    cov_per_dev = 65536
    coverage = jnp.full((cov_per_dev * n_dev,), 25, dtype=jnp.int32)
    offs = jnp.arange(n_dev, dtype=jnp.int32) * cov_per_dev

    step = build_sharded_step(mesh8, default_params())
    out = step(sig, coverage, offs)
    jax.block_until_ready(out)

    ncl = np.asarray(out["n_clusters"])
    assert ncl.shape == (n_dev,)
    assert ncl.sum() >= 4 * n_dev  # every true site found somewhere
    # psum-derived global coverage must be identical on every shard
    cg = np.asarray(out["coverage_global"])
    assert np.allclose(cg, cg[0])
    assert abs(float(cg[0]) - 25.0) < 1e-3


_COMPARE_INT = ("svtype", "pos", "end", "svlen", "support", "lead_count",
                "fwd", "rev", "qual", "gt_a", "gt_b", "gq", "dr", "dv",
                "filter_code", "coverage_upstream", "coverage_start",
                "coverage_center", "coverage_end", "coverage_downstream")
_COMPARE_FLOAT = ("stdev_pos", "stdev_len", "af")


def _cluster_records(out, n_shards):
    """All valid clusters as comparable records (sorted)."""
    arrays = {k: np.asarray(out[k]) for k in
              _COMPARE_INT + _COMPARE_FLOAT + ("cluster_valid", "precise", "qc")}
    n_total = arrays["cluster_valid"].shape[0]
    per = n_total // n_shards
    recs = []
    for s in range(n_shards):
        sl = slice(s * per, (s + 1) * per)
        valid = arrays["cluster_valid"][sl]
        for i in np.nonzero(valid)[0]:
            rec = tuple(int(arrays[k][sl][i]) for k in _COMPARE_INT)
            rec += tuple(round(float(arrays[k][sl][i]), 4) for k in _COMPARE_FLOAT)
            rec += (bool(arrays["precise"][sl][i]), bool(arrays["qc"][sl][i]))
            recs.append(rec)
    return sorted(recs)


def _single_device_records(sig, coverage, params):
    """Reference: one call_pipeline_step over the full batch."""
    from sniffles_tpu.parallel.engine import call_pipeline_step
    cov = np.asarray(coverage)
    p = dict(params)
    p["coverage_global"] = float(cov.mean())
    nm = np.asarray(sig["nm"])[np.asarray(sig["valid"])]
    p["qc_nm_threshold"] = float(nm.mean()) if nm.size else 0.0
    out = call_pipeline_step({k: jnp.asarray(v) for k, v in sig.items()},
                             jnp.asarray(coverage), p, region_offset=0)
    out = {k: np.asarray(v) for k, v in out.items()}
    out["cluster_valid"] = out["cluster_valid"] & out["qc_ready_mask"] \
        if "qc_ready_mask" in out else out["cluster_valid"]
    return _cluster_records(out, 1)


def _planted_shard_batch(n_dev, per_dev, cov_per_dev, seed, straddle_types):
    """Random multi-svtype batch laid out per shard window, with a
    straddling cluster of each requested svtype at successive shard
    boundaries."""
    rng = np.random.default_rng(seed)
    total = per_dev * n_dev
    sig = {
        "pos": np.zeros(total, dtype=np.int32),
        "svlen": np.zeros(total, dtype=np.int32),
        "svtype": np.zeros(total, dtype=np.int32),
        "read_id": np.zeros(total, dtype=np.int32),
        "strand": np.ones(total, dtype=np.int32),
        "mapq": np.full(total, 60, dtype=np.int32),
        "nm": np.zeros(total, dtype=np.float32),
        "repeat": np.zeros(total, dtype=bool),
        "sa": np.zeros(total, dtype=bool),
        "valid": np.zeros(total, dtype=bool),
    }
    next_slot = [s * per_dev for s in range(n_dev)]
    next_read = [1]

    def add(shard, pos, svlen, svtype, n_sig):
        for _ in range(n_sig):
            i = next_slot[shard]
            assert i < (shard + 1) * per_dev, "shard slots exhausted"
            sig["pos"][i] = pos + int(rng.integers(-12, 13))
            sig["svlen"][i] = svlen + int(rng.integers(-3, 4))
            sig["svtype"][i] = svtype
            sig["read_id"][i] = next_read[0]
            sig["strand"][i] = int(rng.choice((-1, 1)))
            sig["mapq"][i] = int(rng.integers(30, 60))
            sig["valid"][i] = True
            next_slot[shard] += 1
            next_read[0] += 1

    # interior clusters on every shard (mixed types)
    for s in range(n_dev):
        base = s * cov_per_dev
        for c in range(3):
            pos = base + 8_000 + c * 15_000 + int(rng.integers(0, 4_000))
            svtype = int(rng.integers(0, 4))
            svlen = int(rng.integers(60, 1500)) * (-1 if svtype == 1 else 1)
            add(s, pos, svlen, svtype, int(rng.integers(4, 9)))

    # straddling clusters: one svtype per boundary
    for b, svtype in enumerate(straddle_types):
        left, right = b % (n_dev - 1), b % (n_dev - 1) + 1
        boundary = right * cov_per_dev
        svlen = int(rng.integers(80, 900)) * (-1 if svtype == 1 else 1)
        add(left, boundary - 40, svlen, svtype, 5)
        add(right, boundary + 40, svlen, svtype, 5)
    return sig


def test_halo_exchange_property_matches_single_device(mesh8):
    """Sharded output == single-device call_pipeline_step output on
    randomized multi-svtype batches with boundary-straddling clusters of
    every device svtype (INS/DEL/DUP/INV/BND), including recomputed
    statistics, genotypes and QC for the merged clusters."""
    from sniffles_tpu.parallel.mesh import build_sharded_step, GENOME_AXIS
    from sniffles_tpu.parallel.engine import default_params

    n_dev = 8
    per_dev = 128
    cov_per_dev = 65536
    params = default_params()
    step = build_sharded_step(mesh8, params, halo_bp=5000, halo_slots=128)

    for seed in (3, 17, 99):
        # straddle every device svtype, several boundaries, incl. repeats
        straddle = [0, 1, 2, 3, 4, 0, 1, 4, 2, 3]
        sig = _planted_shard_batch(n_dev, per_dev, cov_per_dev, seed, straddle)
        coverage = np.full((cov_per_dev * n_dev,), 25, dtype=np.int32)
        offs = jnp.arange(n_dev, dtype=jnp.int32) * cov_per_dev

        out = step({k: jnp.asarray(v) for k, v in sig.items()},
                   jnp.asarray(coverage), offs)
        out = {k: np.asarray(v) for k, v in out.items()}
        assert not out["halo_overflow"].any()

        got = _cluster_records(out, n_dev)
        want = _single_device_records(sig, coverage, params)
        assert got == want, (f"seed {seed}: {len(got)} vs {len(want)} clusters\n"
                             f"extra={set(got)-set(want)}\n"
                             f"missing={set(want)-set(got)}")


def test_combine_halo_exchange_matches_single_device(mesh8):
    """Sharded combine grouping == single-device group_candidates on
    window-sharded candidates with boundary-straddling groups."""
    from sniffles_tpu.parallel.mesh import build_sharded_combine_step
    from sniffles_tpu.ops.combine_groups import group_candidates

    n_dev = 8
    per_dev = 128
    window = 50_000
    total = per_dev * n_dev
    rng = np.random.default_rng(5)

    pos = np.zeros(total, dtype=np.int32)
    svlen = np.zeros(total, dtype=np.int32)
    svtype = np.zeros(total, dtype=np.int32)
    slot = [s * per_dev for s in range(n_dev)]

    def add(shard, p, ln, ty, n_c):
        for _ in range(n_c):
            i = slot[shard]
            pos[i] = p + int(rng.integers(-10, 11))
            svlen[i] = ln + int(rng.integers(-2, 3))
            svtype[i] = ty
            slot[shard] += 1

    for s in range(n_dev):
        for c in range(6):
            add(s, s * window + 4_000 + c * 7_000, int(rng.integers(60, 900)),
                int(rng.integers(0, 4)), int(rng.integers(3, 8)))
    # straddling groups at three boundaries
    for b, ty in ((1, 0), (3, 1), (6, 2)):
        ln = int(rng.integers(80, 400))
        add(b - 1, b * window - 30, ln, ty, 4)
        add(b, b * window + 30, ln, ty, 4)

    valid = np.zeros(total, dtype=bool)
    for s in range(n_dev):
        valid[s * per_dev:slot[s]] = True
    cand = {
        "pos": pos, "svlen": svlen, "svtype": svtype,
        "sample_id": rng.integers(0, 6, size=total).astype(np.int32),
        "support": rng.integers(3, 30, size=total).astype(np.int32),
        "qc": np.ones(total, dtype=bool), "valid": valid,
    }

    offs = jnp.arange(n_dev, dtype=jnp.int32) * window
    wlen = jnp.full((n_dev,), window, dtype=jnp.int32)
    step = build_sharded_combine_step(mesh8, halo_slots=64)
    halo_w = jnp.full((n_dev,), 2000, dtype=jnp.int32)
    out = {k: np.asarray(v) for k, v in
           step({k: jnp.asarray(v) for k, v in cand.items()},
                offs, wlen, halo_w).items()}
    assert not out["halo_overflow"].any()

    def records(o, n_shards):
        per = o["group_valid"].shape[0] // n_shards
        recs = []
        for s in range(n_shards):
            sl = slice(s * per, (s + 1) * per)
            gid = o["group_id"][sl]          # nondecreasing over sorted elements
            for i in np.nonzero(o["group_valid"][sl])[0]:
                head = int(np.searchsorted(gid, i))   # group's first element
                recs.append((int(o["svtype"][sl][head]),)
                            + tuple(int(o[k][sl][i]) for k in
                                    ("group_pos", "group_svlen",
                                     "group_count", "group_sample_count")))
        return sorted(recs)

    got = records(out, n_dev)

    single = {k: np.asarray(v) for k, v in
              group_candidates({k: jnp.asarray(v) for k, v in cand.items()},
                               250.0, 1000.0).items()}
    single["group_valid"] = np.arange(total) < single["n_groups"]
    want = records(single, 1)
    assert got == want, (f"{len(got)} vs {len(want)}\nextra={set(got)-set(want)}\n"
                         f"missing={set(want)-set(got)}")


def test_halo_exchange_straddling_cluster_exact_stats(mesh8):
    """A 20-signature INS cluster split 10/10 across a shard boundary is
    emitted exactly once with full-union statistics."""
    from sniffles_tpu.parallel.mesh import build_sharded_step
    from sniffles_tpu.parallel.engine import default_params

    n_dev = 8
    per_dev = 64
    cov_per_dev = 65536
    total = per_dev * n_dev
    sig = {
        "pos": np.zeros(total, dtype=np.int32),
        "svlen": np.zeros(total, dtype=np.int32),
        "svtype": np.zeros(total, dtype=np.int32),
        "read_id": np.arange(total, dtype=np.int32),
        "strand": np.ones(total, dtype=np.int32),
        "mapq": np.full(total, 60, dtype=np.int32),
        "nm": np.zeros(total, dtype=np.float32),
        "repeat": np.zeros(total, dtype=bool),
        "sa": np.zeros(total, dtype=bool),
        "valid": np.zeros(total, dtype=bool),
    }
    for i in range(10):
        sig["pos"][i] = 65400 + i
        sig["svlen"][i] = 100
        sig["valid"][i] = True
    for i in range(10):
        j = per_dev + i
        sig["pos"][j] = 65560 + i
        sig["svlen"][j] = 100
        sig["valid"][j] = True

    coverage = np.full((cov_per_dev * n_dev,), 25, dtype=np.int32)
    offs = jnp.arange(n_dev, dtype=jnp.int32) * cov_per_dev
    params = default_params()
    step = build_sharded_step(mesh8, params, halo_bp=5000, halo_slots=64)
    out = step({k: jnp.asarray(v) for k, v in sig.items()},
               jnp.asarray(coverage), offs)
    out = {k: np.asarray(v) for k, v in out.items()}

    got = _cluster_records(out, n_dev)
    want = _single_device_records(sig, coverage, params)
    assert got == want
    assert len(got) == 1
    # full-union support (20 unique reads), not a folded half-shard count
    support_idx = _COMPARE_INT.index("support")
    assert got[0][support_idx] == 20
