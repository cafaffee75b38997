"""
Whole-pipeline truth tests on simulated reads with planted SVs: the
end-to-end differential harness the reference lacks (SURVEY §4).
"""
import os
import subprocess
import sys

import pytest

from sniffles_tpu.sim import PlantedSV, write_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=str(cwd), timeout=600)


def read_calls(vcf_path):
    calls = []
    with open(vcf_path) as f:
        for line in f:
            if not line.startswith("#"):
                calls.append(line.rstrip("\n").split("\t"))
    return calls


def info_dict(call):
    d = {}
    for item in call[7].split(";"):
        if "=" in item:
            k, v = item.split("=", 1)
            d[k] = v
        else:
            d[item] = True
    return d


def test_germline_del_ins(tmp_path):
    bam, fasta = write_dataset(
        str(tmp_path), ref_len=200_000, depth=24, read_len=12_000, seed=1,
        svs=[PlantedSV(pos=50_000, svtype="DEL", svlen=120),
             PlantedSV(pos=120_000, svtype="INS", svlen=150)])
    out = tmp_path / "out.vcf"
    res = run_cli(["--input", bam, "--vcf", str(out), "--reference", fasta,
                   "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr + res.stdout
    calls = read_calls(out)
    by_type = {}
    for c in calls:
        by_type.setdefault(info_dict(c)["SVTYPE"], []).append(c)

    assert "DEL" in by_type and len(by_type["DEL"]) == 1
    assert "INS" in by_type and len(by_type["INS"]) == 1

    dele = by_type["DEL"][0]
    d = info_dict(dele)
    assert abs(int(dele[1]) - 50_000) <= 2
    assert int(d["SVLEN"]) == -120
    assert dele[6] == "PASS"
    # DEL sequence resolved from the reference FASTA
    assert len(dele[3]) == 121 and dele[4] == dele[3][0]
    # hom-alt: every read carries the deletion
    assert dele[9].startswith("1/1")

    ins = by_type["INS"][0]
    d = info_dict(ins)
    assert abs(int(ins[1]) - 120_000) <= 2
    assert int(d["SVLEN"]) == 150
    assert ins[6] == "PASS"
    assert ins[9].startswith("1/1")
    # INS sequence assembled from reads (anchor base + 150bp)
    assert len(ins[4]) == 151


def test_het_sv_genotype(tmp_path):
    bam, fasta = write_dataset(
        str(tmp_path), ref_len=150_000, depth=30, read_len=10_000, seed=2,
        svs=[PlantedSV(pos=70_000, svtype="DEL", svlen=200, vaf=0.5)])
    out = tmp_path / "out.vcf"
    res = run_cli(["--input", bam, "--vcf", str(out), "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr + res.stdout
    calls = [c for c in read_calls(out) if info_dict(c)["SVTYPE"] == "DEL"]
    assert len(calls) == 1
    gt = calls[0][9].split(":")[0]
    assert gt == "0/1", calls[0]


def test_mosaic_mode_low_vaf(tmp_path):
    bam, fasta = write_dataset(
        str(tmp_path), ref_len=150_000, depth=40, read_len=10_000, seed=3,
        svs=[PlantedSV(pos=70_000, svtype="DEL", svlen=300, vaf=0.12)])
    out_g = tmp_path / "g.vcf"
    out_m = tmp_path / "m.vcf"
    res = run_cli(["--input", bam, "--vcf", str(out_g), "--threads", "0"], tmp_path)
    assert res.returncode == 0
    res = run_cli(["--input", bam, "--vcf", str(out_m), "--threads", "0", "--mosaic"], tmp_path)
    assert res.returncode == 0, res.stderr + res.stdout
    # germline mode filters the low-VAF call; mosaic mode reports it
    germ = [c for c in read_calls(out_g) if info_dict(c)["SVTYPE"] == "DEL"]
    mos = [c for c in read_calls(out_m) if info_dict(c)["SVTYPE"] == "DEL"]
    assert len(germ) == 0
    assert len(mos) == 1
    assert "MOSAIC" in info_dict(mos[0])


def test_no_qc_outputs_filtered(tmp_path):
    bam, fasta = write_dataset(
        str(tmp_path), ref_len=120_000, depth=8, read_len=10_000, seed=4,
        svs=[PlantedSV(pos=60_000, svtype="INS", svlen=80, vaf=0.2)])
    out = tmp_path / "out.vcf"
    res = run_cli(["--input", bam, "--vcf", str(out), "--threads", "0", "--no-qc"], tmp_path)
    assert res.returncode == 0, res.stderr + res.stdout
    calls = read_calls(out)
    assert len(calls) >= 1  # low-support candidate still emitted


def test_prefetch_multi_contig_matches_worker_path(tmp_path):
    """Decode-ahead (threads 0) must not corrupt concurrent decodes
    (regression: shared inflate scratch raced between the prefetch thread
    and task 0's inline decode, losing calls on the first contigs)."""
    svs = [PlantedSV(pos=p, svtype="DEL" if i % 2 else "INS", svlen=100 + i % 50)
           for i, p in enumerate(range(30_000, 950_000, 60_000))]
    bam, fasta = write_dataset(str(tmp_path), ref_len=1_000_000, depth=20,
                               read_len=10_000, seed=44, svs=svs, n_contigs=4,
                               contig_len=1_000_000)
    out0 = tmp_path / "inline.vcf"
    out1 = tmp_path / "worker.vcf"
    r0 = run_cli(["--input", bam, "--vcf", str(out0), "--threads", "0"], tmp_path)
    r1 = run_cli(["--input", bam, "--vcf", str(out1), "--threads", "1"], tmp_path)
    assert r0.returncode == 0 and r1.returncode == 0
    assert read_calls(out0) == read_calls(out1)
    by_contig = {}
    for c in read_calls(out0):
        by_contig[c[0]] = by_contig.get(c[0], 0) + 1
    assert set(by_contig) == {"chr1", "chr2", "chr3", "chr4"}
    assert all(v == len(svs) for v in by_contig.values()), by_contig


def test_dup_inv_split_reads(tmp_path):
    """DUP/INV from SA-tagged split alignments: the classify_splits
    geometry path end to end (no prior e2e coverage for these types)."""
    bam, fasta = write_dataset(
        str(tmp_path), ref_len=200_000, depth=20, read_len=10_000, seed=50,
        svs=[PlantedSV(pos=60_000, svtype="DUP", svlen=800, support=15),
             PlantedSV(pos=140_000, svtype="INV", svlen=1200, support=15)])
    out = tmp_path / "out.vcf"
    res = run_cli(["--input", bam, "--vcf", str(out), "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr
    calls = {info_dict(c)["SVTYPE"]: c for c in read_calls(out)}
    assert set(calls) == {"DUP", "INV"}

    dup = calls["DUP"]
    assert int(dup[1]) == 60_000
    assert int(info_dict(dup)["SVLEN"]) == 800
    assert dup[6] == "PASS"
    assert int(info_dict(dup)["SUPPORT"]) == 15

    inv = calls["INV"]
    assert int(inv[1]) == 140_000
    assert int(info_dict(inv)["SVLEN"]) == 1200
    assert inv[6] == "PASS"
