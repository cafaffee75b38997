"""Chip CI: --tpu-combine device-owned greedy grouping on the REAL TPU.
A small INS-heavy cohort (identity-gate active) must combine
byte-identically to the host greedy with the kernel owning every
dispatch (no flag/guard fallbacks). Reference analogue: the combine hot
loop, parallel.py:444-566 + cluster.py:356-390; VERDICT r4 item 1."""
import json
import os
import subprocess
import sys

import numpy as np

from sniffles_tpu.sim import PlantedSV, random_seq, write_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd, on_chip: bool, env_extra=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if on_chip:
        env.pop("SNIFFLES_TPU_FORCE_CPU", None)
        env["SNIFFLES_TPU_REQUIRE_DEVICE"] = "1"
    else:
        env["SNIFFLES_TPU_FORCE_CPU"] = "1"
    if env_extra:
        env.update(env_extra)
    return subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=str(cwd),
                          timeout=1800)


def read_calls(vcf_path):
    with open(vcf_path) as f:
        return [l for l in f if not l.startswith("#")]


def test_chip_combine_greedy_byte_identical(tmp_path):
    site_rng = np.random.default_rng(77)
    sites = []
    pos = 20_000
    while pos < 160_000:
        ln = int(site_rng.choice((100, 250)))
        sites.append((pos, ln, random_seq(site_rng, ln),
                      random_seq(site_rng, ln)))
        pos += int(site_rng.integers(10_000, 18_000))

    snfs = []
    for i in range(3):
        rng = np.random.default_rng(80 + i)
        svs = []
        for p, ln, shared, divergent in sites:
            draw = rng.random()
            if draw < 0.15:
                continue
            svs.append(PlantedSV(pos=p + int(rng.integers(-25, 26)),
                                 svtype="INS", svlen=ln,
                                 seq=shared if draw < 0.75 else divergent))
        svs.append(PlantedSV(pos=170_000, svtype="DEL", svlen=300))
        sampledir = tmp_path / f"s{i}"
        sampledir.mkdir()
        bam, _ = write_dataset(str(sampledir), ref_len=190_000, depth=18,
                               read_len=12_000, seed=90 + i, svs=svs)
        snf = str(tmp_path / f"s{i}.snf")
        r = run_cli(["--input", bam, "--snf", snf, "--sample-id", f"s{i}",
                     "--threads", "0"], tmp_path, on_chip=False)
        assert r.returncode == 0, r.stderr
        snfs.append(snf)

    host_out = tmp_path / "host.vcf"
    dev_out = tmp_path / "dev.vcf"
    r1 = run_cli(["--input", *snfs, "--vcf", str(host_out), "--threads", "0"],
                 tmp_path, on_chip=False)
    assert r1.returncode == 0, r1.stderr
    counters_path = str(tmp_path / "counters.json")
    r2 = run_cli(["--input", *snfs, "--vcf", str(dev_out), "--threads", "0",
                  "--tpu-combine", "--dev-combine-greedy-min", "1"], tmp_path,
                 on_chip=True,
                 env_extra={"SNIFFLES_TPU_COUNTERS_JSON": counters_path})
    assert r2.returncode == 0, r2.stderr
    host_calls = read_calls(host_out)
    assert host_calls == read_calls(dev_out)
    assert len(host_calls) >= 6
    counters = json.loads(open(counters_path).read())
    assert counters.get("combine_greedy_dispatches", 0) >= 2
    assert counters.get("combine_greedy_flag_fallbacks", 0) == 0
    assert counters.get("combine_greedy_guard_fallbacks", 0) == 0
