"""Multi-PROCESS execution of the sharded calling step: two OS processes
with 4 virtual CPU devices each join through jax.distributed (Gloo
collectives standing in for DCN), build the 8-device global genome mesh,
and run parallel/mesh.build_sharded_step with real cross-process
psum/ppermute. Results must equal the single-process 8-device run.

This validates the multi-host design (parallel/distributed.py +
parallel/mesh.py) end to end without TPU pod hardware: the same code
paths initialize the runtime, assign shards, elect the emitter, place
global arrays, and execute collectives across process boundaries.
"""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_PROC = 2
DEV_PER_PROC = 4
N_DEV = N_PROC * DEV_PER_PROC

CHILD = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count={dev_per_proc}")
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")

    from sniffles_tpu.parallel import distributed

    pid = int(sys.argv[1])
    assert distributed.initialize(coordinator_address=sys.argv[2],
                                  num_processes={n_proc}, process_id=pid)
    assert jax.process_count() == {n_proc}
    assert jax.device_count() == {n_dev}
    assert distributed.is_emitter() == (pid == 0)
    assert distributed.shard_assignment(5) == [i for i in range(5)
                                               if i % {n_proc} == pid]

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils
    from sniffles_tpu.signatures import synthetic_batch
    from sniffles_tpu.parallel.mesh import (make_genome_mesh, build_sharded_step,
                                            shard_batch, GENOME_AXIS)
    from sniffles_tpu.parallel.engine import default_params

    mesh = make_genome_mesh({n_dev})
    n_dev = {n_dev}
    per_dev = 512
    total = per_dev * n_dev
    batch = synthetic_batch(total - 8, 4 * n_dev, seed=11,
                            genome_span=50_000 * n_dev, batch_size=total)
    sig_np = shard_batch(batch.as_dict(), n_dev)
    cov_per_dev = 65536
    cov_np = np.full((cov_per_dev * n_dev,), 25, dtype=np.int32)
    off_np = (np.arange(n_dev, dtype=np.int32) * cov_per_dev)

    def place(arr):
        sharding = NamedSharding(mesh, P(GENOME_AXIS))
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: arr[idx])

    sig = {{k: place(np.asarray(v)) for k, v in sig_np.items()}}
    coverage = place(cov_np)
    region_offset = place(off_np)

    step = build_sharded_step(mesh, default_params())
    out = step(sig, coverage, region_offset)
    jax.block_until_ready(out)

    ncl = multihost_utils.process_allgather(out["n_clusters"], tiled=True).reshape(-1)
    cov = multihost_utils.process_allgather(out["coverage_global"], tiled=True).reshape(-1)
    print("RESULT", pid, ",".join(str(int(x)) for x in ncl), float(cov[0]), flush=True)

    # sharded multi-sample combine step (grouping + psum + halo exchange)
    from sniffles_tpu.parallel.mesh import build_sharded_combine_step
    rngc = np.random.default_rng(3)
    total_c = 128 * n_dev
    window_c = 50_000
    base_c = np.arange(n_dev).repeat(128) * window_c
    cand_np = {{
        "pos": (base_c + rngc.integers(0, window_c, size=total_c)).astype(np.int32),
        "svlen": rngc.integers(60, 500, size=total_c).astype(np.int32),
        "svtype": rngc.integers(0, 4, size=total_c).astype(np.int32),
        "sample_id": rngc.integers(0, 8, size=total_c).astype(np.int32),
        "support": rngc.integers(3, 30, size=total_c).astype(np.int32),
        "qc": np.ones(total_c, dtype=bool),
        "valid": np.ones(total_c, dtype=bool),
    }}
    cand = {{k: place(v) for k, v in cand_np.items()}}
    offs_c = place(np.arange(n_dev, dtype=np.int32) * window_c)
    wlen_c = place(np.full((n_dev,), window_c, dtype=np.int32))
    halo_c = place(np.full((n_dev,), 5000, dtype=np.int32))
    cout = build_sharded_combine_step(mesh)(cand, offs_c, wlen_c, halo_c)
    jax.block_until_ready(cout)
    ng = multihost_utils.process_allgather(cout["n_groups"], tiled=True).reshape(-1)
    gc = multihost_utils.process_allgather(cout["global_candidates"], tiled=True).reshape(-1)
    print("COMBINE", pid, ",".join(str(int(x)) for x in ng), int(gc[0]), flush=True)
""").format(repo=REPO, n_proc=N_PROC, n_dev=N_DEV, dev_per_proc=DEV_PER_PROC)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _expected():
    """Single-process 8-device reference result (same construction)."""
    import jax
    import jax.numpy as jnp
    from sniffles_tpu.signatures import synthetic_batch
    from sniffles_tpu.parallel.mesh import make_genome_mesh, build_sharded_step, shard_batch
    from sniffles_tpu.parallel.engine import default_params

    mesh = make_genome_mesh(N_DEV)
    per_dev = 512
    total = per_dev * N_DEV
    batch = synthetic_batch(total - 8, 4 * N_DEV, seed=11,
                            genome_span=50_000 * N_DEV, batch_size=total)
    sig = {k: jnp.asarray(v) for k, v in shard_batch(batch.as_dict(), N_DEV).items()}
    coverage = jnp.full((65536 * N_DEV,), 25, dtype=jnp.int32)
    region_offset = jnp.arange(N_DEV, dtype=jnp.int32) * 65536
    out = build_sharded_step(mesh, default_params())(sig, coverage, region_offset)
    jax.block_until_ready(out)
    return (np.asarray(out["n_clusters"]).reshape(-1).tolist(),
            float(np.asarray(out["coverage_global"]).reshape(-1)[0]))


@pytest.mark.slow
def test_two_process_sharded_call_step(tmp_path):
    import jax
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"needs {N_DEV} virtual devices")

    exp_ncl, exp_cov = _expected()

    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, "-c", CHILD, str(i), coord],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in range(N_PROC)]
    results = {}
    combine = {}
    for p in procs:
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, out[-4000:]
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, ncl, cov = line.split()
                results[int(pid)] = ([int(x) for x in ncl.split(",")], float(cov))
            elif line.startswith("COMBINE"):
                _, pid, ng, gc = line.split()
                combine[int(pid)] = ([int(x) for x in ng.split(",")], int(gc))
    assert set(results) == set(range(N_PROC)), results
    assert set(combine) == set(range(N_PROC)), combine

    # every process saw the same global result, equal to single-process
    for pid, (ncl, cov) in results.items():
        assert ncl == exp_ncl, (pid, ncl, exp_ncl)
        assert cov == pytest.approx(exp_cov)

    # combine: psum'd candidate total is the global count on every process,
    # and per-shard group counts agree across processes
    for pid, (ng, gc) in combine.items():
        assert gc == 128 * N_DEV
        assert ng == combine[0][0]
        assert len(ng) == N_DEV and all(x > 0 for x in ng)


@pytest.mark.slow
def test_two_process_cli_bam_to_vcf_byte_identical(tmp_path):
    """Full BAM->VCF through the CLI across 2 jax.distributed processes:
    each executes its contig-shard subset, results allgather to process 0,
    and the emitted VCF body is byte-identical to a single-process run."""
    from sniffles_tpu.sim import PlantedSV, write_dataset

    svs = [PlantedSV(pos=p, svtype=("DEL" if i % 2 else "INS"),
                     svlen=120 + 40 * (i % 5))
           for i, p in enumerate(range(25_000, 360_000, 45_000))]
    bam, _ = write_dataset(str(tmp_path), ref_len=400_000, depth=20,
                           read_len=10_000, seed=23, svs=svs, n_contigs=4)

    def body(path):
        with open(path) as f:
            return [line for line in f if not line.startswith("##")]

    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = REPO + os.pathsep + env_base.get("PYTHONPATH", "")
    env_base["SNIFFLES_TPU_FORCE_CPU"] = "1"

    single = os.path.join(str(tmp_path), "single.vcf")
    p = subprocess.run([sys.executable, "-m", "sniffles_tpu.cli", "--input", bam,
                        "--vcf", single, "--threads", "2"],
                       capture_output=True, text=True, env=env_base,
                       cwd=str(tmp_path), timeout=600)
    assert p.returncode == 0, p.stderr

    multi = os.path.join(str(tmp_path), "multi.vcf")
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env.update({"SNIFFLES_TPU_COORDINATOR": coord,
                    "SNIFFLES_TPU_NUM_PROCESSES": "2",
                    "SNIFFLES_TPU_PROCESS_ID": str(pid)})
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "sniffles_tpu.cli", "--input", bam,
             "--vcf", multi, "--threads", "2", "--allow-overwrite"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(tmp_path)))
    for p in procs:
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, out[-4000:]

    assert len(body(single)) > len(svs) // 2
    assert body(multi) == body(single)
