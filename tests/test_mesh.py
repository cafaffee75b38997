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


def test_halo_exchange_merges_boundary_cluster(mesh8):
    """A cluster whose signatures straddle two shards is folded into one:
    the receiving shard absorbs the sender's support and the sender's
    last cluster is invalidated."""
    from sniffles_tpu.parallel.mesh import build_sharded_step
    from sniffles_tpu.parallel.engine import default_params
    import numpy as np

    n_dev = 8
    per_dev = 64
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
        "valid": np.zeros(total, dtype=bool),
    }
    # one INS cluster at the boundary between shard 0 and shard 1:
    # 10 signatures on shard 0 at pos ~65500, 10 on shard 1 at ~65560
    for i in range(10):
        sig["pos"][i] = 65500 + i
        sig["svlen"][i] = 100
        sig["valid"][i] = True
    for i in range(10):
        j = per_dev + i
        sig["pos"][j] = 65560 + i
        sig["svlen"][j] = 100
        sig["valid"][j] = True

    sigj = {k: jnp.asarray(v) for k, v in sig.items()}
    cov_per_dev = 65536
    coverage = jnp.full((cov_per_dev * n_dev,), 25, dtype=jnp.int32)
    offs = jnp.arange(n_dev, dtype=jnp.int32) * cov_per_dev

    step = build_sharded_step(mesh8, default_params(),
                              halo_merge_dist=1000)
    out = step(sigj, coverage, offs)

    support = np.asarray(out["support"]).reshape(n_dev, per_dev)
    valid = np.asarray(out["cluster_valid"]).reshape(n_dev, per_dev)
    ncl = np.asarray(out["n_clusters"])
    # shard 1's first cluster absorbed shard 0's 10 signatures
    assert ncl[0] == 1 and ncl[1] == 1
    assert support[1][0] == 20, support[1][:2]
    # shard 0's (now duplicated) boundary cluster was invalidated
    assert not valid[0][0]
