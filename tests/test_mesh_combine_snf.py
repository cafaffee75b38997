"""Sharded combine step on REAL SNF-derived candidate tensors: the
multi-chip combine legs must consume genuine .snf files (written by the
production CLI), not synthetic candidates — sharded output must equal
single-device grouping, and the grouping must equal the host greedy
(CombineTask's resolve_block_groups) on the same candidates
(reference: parallel.py:444-566, cluster.py:356-390)."""
import os
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sniffles_tpu.config import SnifflesConfig  # noqa: E402
from sniffles_tpu.sim import PlantedSV, write_dataset  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from sniffles_tpu.parallel.mesh import make_genome_mesh
    return make_genome_mesh(8)


def run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["SNIFFLES_TPU_FORCE_CPU"] = "1"
    return subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=str(cwd),
                          timeout=600)


@pytest.fixture(scope="module")
def snf_cohort(tmp_path_factory):
    """Three real SNFs from the production CLI on a simulated BAM."""
    tmp = tmp_path_factory.mktemp("snf_cohort")
    rng = np.random.default_rng(77)
    svs = [PlantedSV(pos=p, svtype="DEL" if i % 2 else "INS",
                     svlen=int(rng.integers(80, 1200)), vaf=1.0 if i % 3 else 0.5)
           for i, p in enumerate(range(30_000, 560_000, 40_000))]
    bam, _ = write_dataset(str(tmp), ref_len=600_000, depth=20,
                           read_len=10_000, seed=77, svs=svs)
    paths = []
    for i in range(3):
        snf = tmp / f"s{i}.snf"
        r = run_cli(["--input", bam, "--snf", str(snf), "--sample-id", f"S{i}",
                     "--threads", "0"], tmp)
        assert r.returncode == 0, r.stderr
        paths.append(str(snf))
    return paths


def _load_tensors(snf_cohort):
    from sniffles_tpu.parallel.combine_tensors import snf_candidate_tensors
    config = SnifflesConfig("--input", "x.snf", "--vcf", "y.vcf")
    cand = snf_candidate_tensors(snf_cohort, "chr1", config,
                                 support_threshold=config.combine_support_threshold)
    assert cand["pos"].shape[0] > 10, "SNF cohort produced too few candidates"
    return config, cand


def _membership(o, n_shards):
    """Per-group member multisets {(svtype, pos, svlen, sample_id)}."""
    per = o["group_valid"].shape[0] // n_shards
    groups = []
    for s in range(n_shards):
        sl = slice(s * per, (s + 1) * per)
        gid, gv = o["group_id"][sl], o["group_valid"][sl]
        members: dict[int, list] = {}
        for i in np.nonzero(o["valid"][sl])[0]:
            g = int(gid[i])
            if gv[g]:
                members.setdefault(g, []).append(
                    (int(o["svtype"][sl][i]), int(o["pos"][sl][i]),
                     int(o["svlen"][sl][i]), int(o["sample_id"][sl][i])))
        groups.extend(tuple(sorted(m)) for m in members.values())
    return sorted(groups)


def test_sharded_combine_on_snf_tensors_matches_single_device(snf_cohort, mesh8):
    from sniffles_tpu.ops.combine_groups import group_candidates
    from sniffles_tpu.parallel.combine_tensors import shard_candidate_tensors
    from sniffles_tpu.parallel.mesh import build_sharded_combine_step

    config, cand = _load_tensors(snf_cohort)
    n_dev = 8
    sharded, offsets, window_len = shard_candidate_tensors(cand, n_dev)

    step = build_sharded_combine_step(
        mesh8, combine_match=float(config.combine_match),
        combine_match_max=float(config.combine_match_max),
        halo_slots=256)
    halo_w = jnp.full((n_dev,), 2000, dtype=jnp.int32)
    out = {k: np.asarray(v) for k, v in
           step({k: jnp.asarray(v) for k, v in sharded.items()},
                jnp.asarray(offsets), jnp.asarray(window_len), halo_w).items()}
    assert not out["halo_overflow"].any()

    single = {k: np.asarray(v) for k, v in
              group_candidates({k: jnp.asarray(v) for k, v in cand.items()},
                               float(config.combine_match),
                               float(config.combine_match_max)).items()}
    n = cand["pos"].shape[0]
    single["group_valid"] = np.arange(single["group_id"].shape[0]) < single["n_groups"]

    got = _membership(out, n_dev)
    want = _membership(single, 1)
    assert got == want, (f"{len(got)} vs {len(want)} groups\n"
                         f"extra={[g for g in got if g not in want][:3]}\n"
                         f"missing={[g for g in want if g not in got][:3]}")


def test_device_grouping_matches_host_greedy_on_snf(snf_cohort):
    """Device group membership == CombineTask's exact host greedy on the
    same real SNF candidates (well-separated cohort)."""
    from sniffles_tpu import cluster as cl
    from sniffles_tpu.io import snf as snfmod
    from sniffles_tpu.ops.clustering import SVTYPE_CODES
    from sniffles_tpu.ops.combine_groups import group_candidates

    config, cand = _load_tensors(snf_cohort)

    # host greedy over the same candidates, read as real SVCall objects
    by_type: dict[str, list] = {}
    for sample_id, path in enumerate(snf_cohort):
        handle = snfmod.SNFile(config, open(path, "rb"), filename=path)
        handle.read_header()
        for block_start in sorted(int(b) for b in handle.header["index"]["chr1"]):
            for block in handle.read_blocks("chr1", block_start) or []:
                for svtype in ("INS", "DEL", "DUP", "INV"):
                    for c in block.get(svtype, []):
                        if c.support < config.combine_support_threshold:
                            continue
                        c.sample_internal_id = sample_id
                        by_type.setdefault(svtype, []).append(c)
        handle.close()

    host_groups = []
    for svtype, cands in by_type.items():
        for group in cl.resolve_block_groups(svtype, cands, [], config, None):
            host_groups.append(tuple(sorted(
                (SVTYPE_CODES[svtype], c.pos, c.svlen, c.sample_internal_id)
                for c in group.candidates)))

    single = {k: np.asarray(v) for k, v in
              group_candidates({k: jnp.asarray(v) for k, v in cand.items()},
                               float(config.combine_match),
                               float(config.combine_match_max)).items()}
    single["group_valid"] = np.arange(single["group_id"].shape[0]) < single["n_groups"]
    device_groups = _membership(single, 1)

    assert sorted(host_groups) == device_groups
