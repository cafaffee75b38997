"""--tpu-combine device-owned greedy (ops/combine_greedy +
parallel/combine_device_greedy): the whole-block kernel assignment,
replayed through the real SVGroup objects, must keep the multi-sample
combine VCF byte-identical to the host greedy — including the INS
sequence-identity gate and the frontier carry-over (reference:
parallel.py:444-566, cluster.py:356-390, sv.py:262-313)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from sniffles_tpu.sim import PlantedSV, random_seq, write_dataset  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd, env_extra=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["SNIFFLES_TPU_FORCE_CPU"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    if env_extra:
        env.update(env_extra)
    return subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=str(cwd),
                          timeout=900)


def read_calls(vcf_path):
    with open(vcf_path) as f:
        return [l for l in f if not l.startswith("#")]


def _ins_cohort(tmp_path, n_samples=4, seed0=500):
    """INS-heavy cohort exercising the identity gate: per site, samples
    carry either a SHARED allele sequence (should group) or a DIVERGENT
    one (combine_pctseq=0.7 keeps them apart), with jittered
    breakpoints and a couple of DEL/DUP sites."""
    site_rng = np.random.default_rng(seed0)
    sites = []
    pos = 20_000
    while pos < 200_000:
        ln = int(site_rng.choice((80, 150, 400)))
        shared = random_seq(site_rng, ln)
        divergent = random_seq(site_rng, ln)
        sites.append((pos, ln, shared, divergent))
        pos += int(site_rng.integers(9_000, 16_000))
    snfs = []
    for i in range(n_samples):
        rng = np.random.default_rng(seed0 + 1 + i)
        svs = []
        for pos, ln, shared, divergent in sites:
            draw = rng.random()
            if draw < 0.15:
                continue
            seq = shared if draw < 0.75 else divergent
            svs.append(PlantedSV(pos=pos + int(rng.integers(-25, 26)),
                                 svtype="INS", svlen=ln, seq=seq))
        svs.append(PlantedSV(pos=205_000, svtype="DEL", svlen=300))
        svs.append(PlantedSV(pos=215_000, svtype="DUP", svlen=700))
        sampledir = tmp_path / f"c{i}"
        sampledir.mkdir()
        bam, _ = write_dataset(str(sampledir), ref_len=230_000, depth=18,
                               read_len=12_000, seed=seed0 + 40 + i, svs=svs)
        snf = str(tmp_path / f"c{i}.snf")
        r = run_cli(["--input", bam, "--snf", snf, "--sample-id", f"c{i}",
                     "--threads", "0"], tmp_path)
        assert r.returncode == 0, r.stderr
        snfs.append(snf)
    return snfs


def test_combine_greedy_cli_matches_host(tmp_path):
    snfs = _ins_cohort(tmp_path)
    host_out = tmp_path / "host.vcf"
    dev_out = tmp_path / "dev.vcf"
    r1 = run_cli(["--input", *snfs, "--vcf", str(host_out), "--threads", "0"],
                 tmp_path)
    assert r1.returncode == 0, r1.stderr
    counters_path = str(tmp_path / "counters.json")
    r2 = run_cli(["--input", *snfs, "--vcf", str(dev_out), "--threads", "0",
                  "--tpu-combine", "--dev-combine-greedy-min", "1"], tmp_path,
                 env_extra={"SNIFFLES_TPU_REQUIRE_DEVICE": "1",
                            "SNIFFLES_TPU_COUNTERS_JSON": counters_path})
    assert r2.returncode == 0, r2.stderr
    host_calls = read_calls(host_out)
    assert host_calls == read_calls(dev_out)
    assert len(host_calls) >= 10
    counters = json.loads(open(counters_path).read())
    # the device really owned the grouping (no silent host fallback)
    assert counters.get("combine_greedy_dispatches", 0) >= 3
    assert counters.get("combine_greedy_candidates", 0) >= 20
    assert counters.get("combine_greedy_flag_fallbacks", 0) == 0
    assert counters.get("combine_greedy_guard_fallbacks", 0) == 0


def test_combine_greedy_threaded_matches_host(tmp_path):
    """Workers route combine_greedy requests through the parent device
    service."""
    snfs = _ins_cohort(tmp_path, n_samples=2, seed0=700)
    host_out = tmp_path / "host.vcf"
    dev_out = tmp_path / "dev.vcf"
    r1 = run_cli(["--input", *snfs, "--vcf", str(host_out), "--threads", "2"],
                 tmp_path)
    assert r1.returncode == 0, r1.stderr
    r2 = run_cli(["--input", *snfs, "--vcf", str(dev_out), "--threads", "2",
                  "--tpu-combine", "--dev-combine-greedy-min", "1"], tmp_path,
                 env_extra={"SNIFFLES_TPU_REQUIRE_DEVICE": "1"})
    assert r2.returncode == 0, r2.stderr
    assert read_calls(host_out) == read_calls(dev_out)


def test_combine_greedy_fuzz_cohorts(tmp_path):
    """Randomized cohort seeds (jittered shared sites, divergent INS
    alleles, mixed svtypes): device combine must stay byte-identical on
    every seed."""
    for k, seed0 in enumerate((1100, 1200, 1300)):
        d = tmp_path / f"f{k}"
        d.mkdir()
        snfs = _ins_cohort(d, n_samples=3, seed0=seed0)
        host_out = d / "host.vcf"
        dev_out = d / "dev.vcf"
        r1 = run_cli(["--input", *snfs, "--vcf", str(host_out),
                      "--threads", "0"], d)
        assert r1.returncode == 0, r1.stderr
        r2 = run_cli(["--input", *snfs, "--vcf", str(dev_out), "--threads", "0",
                      "--tpu-combine", "--dev-combine-greedy-min", "1"], d,
                     env_extra={"SNIFFLES_TPU_REQUIRE_DEVICE": "1"})
        assert r2.returncode == 0, r2.stderr
        assert read_calls(host_out) == read_calls(dev_out), seed0
