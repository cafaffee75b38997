"""Chip CI: --tpu-call on a dataset with genuinely FRAGMENTED reads
(two near DEL ops per read -> host merge_inner folds them; the device
merge_inner_fold must match) plus a NON-DEFAULT clustering flag (the
kernel config is not the daemon-warm default shape). Asserts the VCF is
byte-identical, consumption covers every non-BND cluster including the
multi-fragment ones (fb_multi_fragment == 0), and no silent host-sweep
fallback happens (SNIFFLES_TPU_REQUIRE_DEVICE).
Reference: cluster.py:85-122 (merge_inner), VERDICT r3 item 6.
"""
import os
import re
import subprocess
import sys

from sniffles_tpu.sim import PlantedSV, write_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd, on_chip: bool):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if on_chip:
        env.pop("SNIFFLES_TPU_FORCE_CPU", None)
        env["SNIFFLES_TPU_REQUIRE_DEVICE"] = "1"
    else:
        env["SNIFFLES_TPU_FORCE_CPU"] = "1"
    return subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=str(cwd),
                          timeout=1800)


def vcf_body(path):
    with open(path) as f:
        return [line for line in f if not line.startswith("##")]


def fragmented_dataset(tmp_path):
    """Pairs of equal DELs 20bp apart: every spanning read carries two
    DEL leads within merge_inner reach, the pair clusters as ONE cluster
    (6 called DELs, not 12 — verified empirically), so each cluster is a
    multi-fragment fold case for the device merge_inner_fold."""
    svs = []
    pos = 30_000
    for k in range(6):
        svs.append(PlantedSV(pos=pos, svtype="DEL", svlen=120, vaf=1.0))
        svs.append(PlantedSV(pos=pos + 140, svtype="DEL", svlen=120, vaf=1.0))
        pos += 22_000
    svs.append(PlantedSV(pos=pos, svtype="INS", svlen=200, vaf=1.0))
    return write_dataset(str(tmp_path), ref_len=200_000, depth=24,
                         read_len=12_000, seed=23, svs=svs)


def test_chip_fragmented_nondefault_flag_byte_identical(tmp_path):
    bam, _ = fragmented_dataset(tmp_path)
    flags = ["--cluster-merge-pos", "200"]   # non-default kernel config
    # (changes the kernel meta -> side-thread compile path -- unlike
    # --cluster-binsize, it keeps the DEL pairs in one cluster so the
    # fold premise holds: 6 folded DEL calls, verified host-side)
    host_out = tmp_path / "host.vcf"
    dev_out = tmp_path / "dev.vcf"
    r1 = run_cli(["--input", bam, "--vcf", str(host_out), "--threads", "0",
                  *flags], tmp_path, on_chip=False)
    assert r1.returncode == 0, r1.stderr
    r2 = run_cli(["--input", bam, "--vcf", str(dev_out), "--threads", "0",
                  "--tpu-call", "--dev-debug-log", *flags], tmp_path, on_chip=True)
    assert r2.returncode == 0, r2.stderr
    assert "falling back" not in r2.stderr
    assert vcf_body(host_out) == vcf_body(dev_out)
    # the fold really engaged: each DEL pair emerged as ONE call
    dels = [l for l in vcf_body(dev_out)
            if "\tDEL\t" in l or "SVTYPE=DEL" in l]
    assert len(dels) == 6, f"expected 6 folded DEL calls, got {len(dels)}"

    consumed = total = bnd = frag = resplit = collision = 0
    for m in re.finditer(r"device engine stats consumed by (\d+)/(\d+) children "
                         r"of \d+ clusters \(fallbacks: bnd=(\d+), "
                         r"multi_fragment=(\d+), resplit=(\d+), "
                         r"collision=(\d+)", r2.stdout + r2.stderr):
        consumed += int(m.group(1))
        total += int(m.group(2))
        bnd += int(m.group(3))
        frag += int(m.group(4))
        resplit += int(m.group(5))
        collision += int(m.group(6))
    assert total > 0, "no consumption counters in debug log"
    # the device fold handled every fragmented cluster (a fold-grouping
    # mismatch would count as multi_fragment)
    assert frag == 0, f"device fold fell back on {frag} multi-fragment clusters"
    # each DEL-pair cluster resplits by svlen histogram (spanning reads
    # fold to -240, pair-edge reads keep -120) -> the device resplit
    # (ops/clustering.resplit_child_ids) computes PER-CHILD stats, so
    # even multi-child clusters consume: nothing may fall back
    assert resplit == 0, f"device resplit fell back on {resplit} children"
    assert collision == 0
    assert consumed == total, (consumed, resplit, total, bnd)
    assert consumed >= 1, "nothing consumed device stats"
