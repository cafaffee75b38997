"""
Accuracy harness: recall/precision/F1 against planted truth on a
mixed het/hom multi-SV dataset (the GIAB-Tier1-style check of
BASELINE.md, scaled to CI size).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from sniffles_tpu.sim import PlantedSV, write_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=str(cwd), timeout=900)


def evaluate(vcf_path, truth, pos_tol=25, len_tol_frac=0.25):
    calls = []
    with open(vcf_path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t")
            info = dict(kv.split("=", 1) for kv in fields[7].split(";") if "=" in kv)
            calls.append({
                "pos": int(fields[1]),
                "svtype": info["SVTYPE"],
                "svlen": abs(int(info.get("SVLEN", 0))),
                "gt": fields[9].split(":")[0].replace("|", "/"),
            })

    matched_truth = set()
    matched_calls = set()
    for ti, sv in enumerate(truth):
        for ci, c in enumerate(calls):
            if ci in matched_calls:
                continue
            if (c["svtype"] == sv.svtype and abs(c["pos"] - sv.pos) <= pos_tol
                    and abs(c["svlen"] - sv.svlen) <= max(10, sv.svlen * len_tol_frac)):
                matched_truth.add(ti)
                matched_calls.add(ci)
                break

    recall = len(matched_truth) / max(1, len(truth))
    precision = len(matched_calls) / max(1, len(calls))
    f1 = 2 * recall * precision / max(1e-9, recall + precision)
    return recall, precision, f1, calls, matched_calls


def test_f1_mixed_genotypes(tmp_path):
    rng = np.random.default_rng(21)
    truth = []
    pos = 40_000
    for i in range(30):
        svtype = "DEL" if i % 2 else "INS"
        svlen = int(rng.integers(60, 2000))
        vaf = 1.0 if i % 3 else 0.5
        truth.append(PlantedSV(pos=pos, svtype=svtype, svlen=svlen, vaf=vaf))
        pos += int(rng.integers(45_000, 70_000))

    ref_len = pos + 40_000
    bam, fasta = write_dataset(str(tmp_path), ref_len=ref_len, depth=26,
                               read_len=12_000, seed=21, svs=truth,
                               contig_len=max(1_000_000, ref_len))
    out = tmp_path / "out.vcf"
    res = run_cli(["--input", bam, "--vcf", str(out), "--reference", fasta,
                   "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr

    recall, precision, f1, calls, matched = evaluate(str(out), truth)
    assert recall >= 0.95, (recall, precision, f1)
    assert precision >= 0.95, (recall, precision, f1)
    assert f1 >= 0.95

    # genotype concordance on matched hom/het truth
    gt_errors = 0
    checked = 0
    for ti, sv in enumerate(truth):
        expect = "1/1" if sv.vaf == 1.0 else "0/1"
        for ci in matched:
            c = calls[ci]
            if c["svtype"] == sv.svtype and abs(c["pos"] - sv.pos) <= 25:
                checked += 1
                gt_errors += (c["gt"] != expect)
                break
    assert checked >= 25
    assert gt_errors <= checked * 0.1, (gt_errors, checked)


def test_f1_all_types(tmp_path):
    """Mixed INS/DEL/DUP/INV truth set across one contig."""
    rng = np.random.default_rng(23)
    truth = []
    pos = 50_000
    types = ["INS", "DEL", "DUP", "INV"]
    for i in range(16):
        svtype = types[i % 4]
        svlen = int(rng.integers(300, 1500))
        truth.append(PlantedSV(pos=pos, svtype=svtype, svlen=svlen))
        pos += int(rng.integers(50_000, 70_000))
    ref_len = pos + 50_000
    bam, fasta = write_dataset(str(tmp_path), ref_len=ref_len, depth=24,
                               read_len=12_000, seed=23, svs=truth,
                               contig_len=max(1_000_000, ref_len))
    out = tmp_path / "out.vcf"
    res = run_cli(["--input", bam, "--vcf", str(out), "--reference", fasta,
                   "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr
    recall, precision, f1, calls, matched = evaluate(str(out), truth)
    assert recall >= 0.9 and precision >= 0.9, (recall, precision, [c["svtype"] for c in calls])
