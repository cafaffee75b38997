"""Malformed-input robustness: clean errors, not crashes."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HG008 = "/root/reference/src/tests/data/hg008.bam"


def run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=str(cwd), timeout=300)


def test_not_a_bam(tmp_path):
    bad = tmp_path / "junk.bam"
    bad.write_bytes(b"this is not a bam file at all" * 10)
    res = run_cli(["--input", str(bad), "--vcf", str(tmp_path / "o.vcf")], tmp_path)
    assert res.returncode != 0
    combined = res.stderr + res.stdout
    assert "Unable to open input file" in combined, combined


def test_truncated_bam(tmp_path):
    data = open(HG008, "rb").read()
    trunc = tmp_path / "trunc.bam"
    trunc.write_bytes(data[:len(data) // 3])
    # copy the index so mode detection proceeds to decode
    (tmp_path / "trunc.bam.csi").write_bytes(open(HG008 + ".csi", "rb").read())
    res = run_cli(["--input", str(trunc), "--vcf", str(tmp_path / "o.vcf")], tmp_path)
    # must terminate (cleanly or with an error), never hang or corrupt
    assert res.returncode in (0, 1)


def test_missing_input(tmp_path):
    res = run_cli(["--input", "no_such_file.bam", "--vcf", str(tmp_path / "o.vcf")], tmp_path)
    assert res.returncode != 0


def test_bad_snf_header(tmp_path):
    bad = tmp_path / "bad.snf"
    bad.write_bytes(b"garbage that is not json\n" + b"\x00" * 100)
    res = run_cli(["--input", str(bad), "--vcf", str(tmp_path / "o.vcf")], tmp_path)
    assert res.returncode != 0


def test_empty_vcf_for_genotyping(tmp_path):
    empty = tmp_path / "empty.vcf"
    empty.write_text("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    res = run_cli(["--input", HG008, "--genotype-vcf", str(empty),
                   "--vcf", str(tmp_path / "o.vcf"), "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr


def test_module_main_entry(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run([sys.executable, "-m", "sniffles_tpu", "--version"],
                         capture_output=True, text=True, env=env, timeout=120)
    assert res.returncode == 0
    assert "sniffles-tpu" in res.stdout


def test_task_errors_produce_nonzero_exit(tmp_path):
    """Corrupt SNF blocks: tasks fail, partial results are written, and
    the exit code is nonzero in both inline and worker modes (the
    reference logs the errors and exits 0, result.py:288-299 — the TPU
    build surfaces them so pipelines cannot consume a truncated VCF)."""
    from sniffles_tpu.sim import write_dataset, PlantedSV

    bam, _ = write_dataset(str(tmp_path), ref_len=120_000, depth=15, seed=4,
                           svs=[PlantedSV(pos=50_000, svtype="DEL", svlen=120)])
    res = run_cli(["--input", bam, "--snf", "a.snf", "--sample-id", "A",
                   "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr

    # keep the JSON header line, zero the block payloads
    raw = (tmp_path / "a.snf").read_bytes()
    nl = raw.index(b"\n")
    (tmp_path / "bad.snf").write_bytes(raw[:nl + 1] + bytes(len(raw) - nl - 1))

    for threads in ("0", "2"):
        res = run_cli(["--input", "a.snf", "bad.snf", "--vcf", f"o{threads}.vcf",
                       "--threads", threads, "--allow-overwrite"], tmp_path)
        assert res.returncode != 0, f"threads={threads} should fail: {res.stdout}"

    # healthy combine still exits 0
    res = run_cli(["--input", "a.snf", "a.snf", "--vcf", "ok.vcf",
                   "--threads", "2", "--allow-overwrite"], tmp_path)
    assert res.returncode == 0, res.stderr
