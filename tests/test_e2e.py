"""End-to-end calling on the GIAB fixtures: BAM -> leads -> clusters -> calls -> VCF."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HG008 = "/root/reference/src/tests/data/hg008.bam"
HG002 = "/root/reference/src/tests/data/hg002.bam"


def run_cli(args, tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                         capture_output=True, text=True, env=env, cwd=str(tmp_path),
                         timeout=600)
    return res


def read_calls(vcf_path):
    calls = []
    with open(vcf_path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            calls.append(line.rstrip("\n").split("\t"))
    return calls


def test_call_sample_hg008(tmp_path):
    out = tmp_path / "out.vcf"
    res = run_cli(["--input", HG008, "--vcf", str(out), "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr + res.stdout
    calls = read_calls(out)
    # The hg008 fixture contains reads supporting known GIAB breakends.
    bnds = [c for c in calls if "SVTYPE=BND" in c[7]]
    assert len(bnds) >= 2
    by_pos = {(c[0], c[1]): c for c in bnds}
    # Truth: chr1 23272628 G]chr5:52747359] (orange case)
    assert ("chr1", "23272628") in by_pos
    assert "]chr5:52747359]" in by_pos[("chr1", "23272628")][4]
    # Truth: chr18 21493610 [chr20:25499120[T (green case)
    assert ("chr18", "21493610") in by_pos
    assert "[chr20:25499120[" in by_pos[("chr18", "21493610")][4]
    # Genotype column is well-formed
    for c in calls:
        gt = c[9].split(":")[0]
        assert gt in ("0/0", "0/1", "1/1", "./.", "0|1", "1|0", "1|1")


def test_call_sample_multiprocess_matches_inline(tmp_path):
    out0 = tmp_path / "t0.vcf"
    out4 = tmp_path / "t4.vcf"
    r0 = run_cli(["--input", HG008, "--vcf", str(out0), "--threads", "0"], tmp_path)
    r4 = run_cli(["--input", HG008, "--vcf", str(out4), "--threads", "4"], tmp_path)
    assert r0.returncode == 0 and r4.returncode == 0
    assert read_calls(out0) == read_calls(out4)


def test_snf_roundtrip_and_combine(tmp_path):
    """call with --snf, then combine two SNFs into a multi-sample VCF."""
    snf1 = tmp_path / "s1.snf"
    snf2 = tmp_path / "s2.snf"
    r1 = run_cli(["--input", HG008, "--snf", str(snf1), "--sample-id", "S1"], tmp_path)
    assert r1.returncode == 0, r1.stderr + r1.stdout
    r2 = run_cli(["--input", HG008, "--snf", str(snf2), "--sample-id", "S2"], tmp_path)
    assert r2.returncode == 0, r2.stderr + r2.stdout
    assert snf1.exists() and snf1.stat().st_size > 0

    # for_bnd translocation groups are dropped by the reference's combine
    # length screen (parity, sv.py:470-471; see
    # test_modes_e2e.test_combine_bnd_length_screen_matches_reference);
    # --dev-combine-keep-bnd retains them for this round-trip check
    out = tmp_path / "multi.vcf"
    rc = run_cli(["--input", str(snf1), str(snf2), "--vcf", str(out),
                  "--dev-combine-keep-bnd", "--threads", "0"], tmp_path)
    assert rc.returncode == 0, rc.stderr + rc.stdout
    with open(out) as f:
        header = [l for l in f if l.startswith("#CHROM")]
    assert header and header[0].rstrip().split("\t")[9:] == ["S1", "S2"]
    calls = read_calls(out)
    # BND truth sites present with genotypes for both samples
    bnds = [c for c in calls if "SVTYPE=BND" in c[7]]
    assert len(bnds) >= 2
    for c in calls:
        assert len(c) == 11  # 9 fixed + 2 samples


def test_vcf_gz_output(tmp_path):
    out = tmp_path / "out.vcf.gz"
    res = run_cli(["--input", HG008, "--vcf", str(out), "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr + res.stdout
    assert out.exists()
    assert (tmp_path / "out.vcf.gz.tbi").exists()
    from sniffles_tpu.io.bgzf import decompress_all
    text = decompress_all(str(out)).decode()
    assert text.startswith("##fileformat=VCFv4.2")
    assert "SVTYPE=BND" in text
