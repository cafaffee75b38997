"""End-to-end coverage of the remaining run modes: force calling
(genotype_vcf), phasing (HP/PS), population SNF, and read tracing."""
import gzip
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
    with open(vcf_path) as f:
        return [l.rstrip("\n").split("\t") for l in f if not l.startswith("#")]


def test_genotype_vcf_force_calling(tmp_path):
    bam, fasta = write_dataset(
        str(tmp_path), ref_len=150_000, depth=24, read_len=10_000, seed=6,
        svs=[PlantedSV(pos=40_000, svtype="DEL", svlen=150),
             PlantedSV(pos=90_000, svtype="INS", svlen=120)])
    out = tmp_path / "calls.vcf"
    res = run_cli(["--input", bam, "--vcf", str(out), "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr
    n_calls = len(read_calls(out))
    assert n_calls == 2

    # force-calling the produced VCF re-genotypes every input line in order
    gt_out = tmp_path / "genotyped.vcf"
    res = run_cli(["--input", bam, "--genotype-vcf", str(out), "--vcf", str(gt_out),
                   "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr
    lines = read_calls(gt_out)
    assert len(lines) == n_calls
    for line in lines:
        gt = line[-1].split(":")[0]
        assert gt.startswith("1/1"), line

    # unmatched SV (nothing there in the BAM) gets 0/0 with coverage
    fake = tmp_path / "fake.vcf"
    with open(out) as f, open(fake, "w") as g:
        for line in f:
            if line.startswith("#"):
                g.write(line)
        g.write("chr1\t20000\tfake1\tN\t<DEL>\t60\tPASS\t"
                "SVTYPE=DEL;SVLEN=-500;END=20500\tGT:GQ:DR:DV\t1/1:60:0:30\n")
    gt_out2 = tmp_path / "genotyped2.vcf"
    res = run_cli(["--input", bam, "--genotype-vcf", str(fake), "--vcf", str(gt_out2),
                   "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr
    lines = read_calls(gt_out2)
    assert len(lines) == 1
    gt, gq, dr, dv = lines[0][-1].split(":")[:4]
    assert gt == "0/0" and int(dr) > 0 and dv == "0", lines[0]


def test_phased_calls(tmp_path):
    bam, fasta = write_dataset(
        str(tmp_path), ref_len=150_000, depth=30, read_len=10_000, seed=7, phased=True,
        svs=[PlantedSV(pos=70_000, svtype="DEL", svlen=200, vaf=0.5)])
    out = tmp_path / "out.vcf"
    res = run_cli(["--input", bam, "--vcf", str(out), "--threads", "0", "--phase"], tmp_path)
    assert res.returncode == 0, res.stderr
    calls = read_calls(out)
    assert len(calls) == 1
    call = calls[0]
    assert "PHASE=" in call[7]
    phase_info = [f for f in call[7].split(";") if f.startswith("PHASE=")][0]
    hp, ps, hp_supp, ps_supp, hp_filt, ps_filt = phase_info[6:].split(",")
    assert hp == "1" and ps == "1000" and hp_filt == "PASS" and ps_filt == "PASS"
    # phased het genotype: 1|0 (haplotype 1 carries the variant)
    assert call[8].endswith(":PS")
    assert call[-1].split(":")[0] == "1|0", call


def test_population_snf_and_annotation(tmp_path):
    bam, fasta = write_dataset(
        str(tmp_path), ref_len=150_000, depth=24, read_len=10_000, seed=8,
        svs=[PlantedSV(pos=60_000, svtype="DEL", svlen=180)])
    s1 = tmp_path / "s1.snf"
    s2 = tmp_path / "s2.snf"
    for s, sid in [(s1, "A"), (s2, "B")]:
        res = run_cli(["--input", bam, "--snf", str(s), "--sample-id", sid,
                       "--threads", "0"], tmp_path)
        assert res.returncode == 0, res.stderr

    # combine while creating a population SNF
    psnf = tmp_path / "pop.snf"
    out = tmp_path / "multi.vcf"
    res = run_cli(["--input", str(s1), str(s2), "--vcf", str(out), "--threads", "0",
                   "--dev-population-snf", str(psnf)], tmp_path)
    assert res.returncode == 0, res.stderr
    assert psnf.exists() and psnf.stat().st_size > 0
    assert len(read_calls(out)) == 1

    # now annotate a fresh combine run against the population SNF
    out2 = tmp_path / "multi2.vcf"
    res = run_cli(["--input", str(s1), str(s2), "--vcf", str(out2), "--threads", "0",
                   "--combine-population", str(psnf)], tmp_path)
    assert res.returncode == 0, res.stderr
    calls = read_calls(out2)
    assert len(calls) == 1
    assert "POPULATION_AF=1.000" in calls[0][7]
    assert "POPULATION_SIZE=2" in calls[0][7]


def test_dev_trace_read(tmp_path):
    bam, fasta = write_dataset(
        str(tmp_path), ref_len=120_000, depth=20, read_len=10_000, seed=9,
        svs=[PlantedSV(pos=60_000, svtype="DEL", svlen=150)])
    out = tmp_path / "out.vcf"
    # pick a read that spans the SV
    res = run_cli(["--input", bam, "--vcf", str(out), "--threads", "0",
                   "--dev-trace-read", "read000110"], tmp_path)
    assert res.returncode == 0, res.stderr
    assert "[DEV_TRACE_READ] [0b/4]" in res.stdout
    assert "[DEV_TRACE_READ] [1/4]" in res.stdout
    assert "[DEV_TRACE_READ] [2/4]" in res.stdout
    assert "[DEV_TRACE_READ] [3/4]" in res.stdout
    assert "[DEV_TRACE_READ] [4/4]" in res.stdout


def test_dev_output_candidates(tmp_path):
    bam, fasta = write_dataset(
        str(tmp_path), ref_len=120_000, depth=20, read_len=10_000, seed=10,
        svs=[PlantedSV(pos=60_000, svtype="DEL", svlen=150)])
    out = tmp_path / "out.vcf"
    csv = tmp_path / "cands.csv"
    res = run_cli(["--input", bam, "--vcf", str(out), "--threads", "0",
                   "--dev-output-candidates", str(csv)], tmp_path)
    assert res.returncode == 0, res.stderr
    assert csv.exists()
    lines = csv.read_text().strip().split("\n")
    assert lines[0].startswith("svtype,orientation_start")
    assert any(l.startswith("DEL,+") for l in lines[1:])


def test_population_annotation_multi_contig(tmp_path):
    """Inline tasks share the config; the population SNF handle must only
    be opened once (regression: second task crashed on the opened object)."""
    bam, fasta = write_dataset(
        str(tmp_path), ref_len=150_000, depth=24, read_len=10_000, seed=40,
        svs=[PlantedSV(pos=60_000, svtype="DEL", svlen=180)],
        n_contigs=2, contig_len=1_000_000)
    s1, s2 = tmp_path / "a.snf", tmp_path / "b.snf"
    for s, sid in [(s1, "A"), (s2, "B")]:
        res = run_cli(["--input", bam, "--snf", str(s), "--sample-id", sid,
                       "--threads", "0"], tmp_path)
        assert res.returncode == 0, res.stderr
    psnf = tmp_path / "pop.snf"
    res = run_cli(["--input", str(s1), str(s2), "--vcf", str(tmp_path / "m.vcf"),
                   "--threads", "0", "--dev-population-snf", str(psnf)], tmp_path)
    assert res.returncode == 0, res.stderr
    out = tmp_path / "m2.vcf"
    res = run_cli(["--input", str(s1), str(s2), "--vcf", str(out), "--threads", "0",
                   "--combine-population", str(psnf)], tmp_path)
    assert res.returncode == 0, res.stderr + res.stdout
    calls = read_calls(out)
    assert len(calls) == 2
    assert all("POPULATION_AF" in c[7] for c in calls)


def test_combine_bnd_length_screen_matches_reference(tmp_path):
    """Multi-sample combine drops BND groups whose stored svlen is 0
    (all for_bnd-sourced translocations) — reference sv.py:470-471
    applies the length screen to every type, and the real reference
    emits 0 records for an hg008-SNF self-combine (verified against it
    directly). --dev-combine-keep-bnd opts out of the quirk."""
    bam = "/root/reference/src/tests/data/hg008.bam"
    if not os.path.exists(bam):
        pytest.skip("reference fixtures not mounted")
    res = run_cli(["--input", bam, "--snf", "a.snf", "--sample-id", "A",
                   "--vcf", "a.vcf", "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr
    assert len(read_calls(tmp_path / "a.vcf")) == 4  # single-sample keeps BNDs

    res = run_cli(["--input", "a.snf", "a.snf", "--vcf", "m.vcf",
                   "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr
    assert len(read_calls(tmp_path / "m.vcf")) == 0  # reference parity

    res = run_cli(["--input", "a.snf", "a.snf", "--vcf", "mk.vcf",
                   "--dev-combine-keep-bnd", "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr
    assert len(read_calls(tmp_path / "mk.vcf")) == 4  # opt-out keeps them


def test_force_calling_bnd_same_strand_difference(tmp_path):
    """Force-calling a VCF containing same-strand inter-contig BNDs:
    the reference cannot re-extract same-strand breakend leads
    (leadprov.py:83-84 bails) so it regenotypes its own calls 0/0;
    this framework keeps those leads (documented difference #2) and
    genotypes them from the supporting reads. Opposite-strand BNDs are
    byte-identical between both tools (covered by the differential
    suite); this pins the intended divergence."""
    bam = "/root/reference/src/tests/data/hg008.bam"
    if not os.path.exists(bam):
        pytest.skip("reference fixtures not mounted")
    res = run_cli(["--input", bam, "--vcf", "calls.vcf", "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr
    res = run_cli(["--input", bam, "--genotype-vcf", "calls.vcf",
                   "--vcf", "gt.vcf", "--threads", "0"], tmp_path)
    assert res.returncode == 0, res.stderr
    gts = {c[1]: c[9].split(":")[0] for c in read_calls(tmp_path / "gt.vcf")}
    # same-strand pair (red cases): real genotypes, not 0/0
    assert gts["28481424"] == "1/1"
    assert gts["95812869"] == "1/1"
    # opposite-strand pair unchanged
    assert gts["23272628"] == "1/1"
    assert gts["21493610"] == "1/1"
