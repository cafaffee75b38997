"""Differential e2e: run the REAL reference Sniffles2 (/root/reference/src,
executed via tools/run_reference.py with the tools/refshim pysam/edlib/spoa
facades over our own I/O stack) and this implementation on the same
inputs, and require byte-identical VCF records (BASELINE.json acceptance:
bit-identical VCF on the reference's test BAMs).

Two documented reference bugs are normalized before comparison:

1. Symbolic-ALT IUPAC corruption (reference vcf.py:341-342): with a
   reference FASTA and non-symbolic output, the reference translates
   ambiguity codes in the WHOLE alt string, turning "<DUP>" into
   "<NUP>", "<INV>"/"<INS>" into "<INN>", "<DEL>" into "<NEL>". We keep
   symbolic alts intact (sniffles_tpu/io/vcf.py:323-328, consistent with
   the reference's own issue-#501 regression test), so corrupted
   symbols in reference output are mapped back via the record's SVTYPE.

2. Same-strand inter-contig BNDs (reference leadprov.py:83-84 bails on
   SA strand == read strand): records we emit for such junctions are
   allowed as EXTRAS (they are real translocation breakends covered by
   tests/test_bnd_leads.py; docs/migration.md "Known intended
   differences" #2). Every record the reference emits must still match
   ours exactly.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"
HG008 = os.path.join(REF_SRC, "tests/data/hg008.bam")
HG002 = os.path.join(REF_SRC, "tests/data/hg002.bam")

pytestmark = pytest.mark.skipif(not os.path.exists(REF_SRC),
                                reason="reference checkout not available")


def run_ours(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                         capture_output=True, text=True, env=env, cwd=str(cwd),
                         timeout=600)
    assert res.returncode == 0, res.stderr + res.stdout
    return res


def run_reference(args, cwd):
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_reference.py")] + args,
        capture_output=True, text=True, cwd=str(cwd), timeout=600)
    assert res.returncode == 0, res.stderr + res.stdout
    return res


def read_records(vcf_path, normalize_ref_bugs=False):
    """Record lines (no headers), optionally normalizing reference bug #1.

    RNAMES lists are always re-sorted before comparison: the reference
    emits them in Python-set order, which varies with PYTHONHASHSEED
    between runs (reference sv.py:555); ours are sorted at source.
    """
    out = []
    with open(vcf_path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            line = line.rstrip("\n")
            fields = line.split("\t")
            info = fields[7].split(";")
            changed = False
            for i, entry in enumerate(info):
                if entry.startswith("RNAMES="):
                    info[i] = "RNAMES=" + ",".join(sorted(entry[7:].split(",")))
                    changed = True
            if changed:
                fields[7] = ";".join(info)
            if normalize_ref_bugs:
                alt = fields[4]
                if alt.startswith("<") and "N" in alt:
                    svtype = None
                    for entry in info:
                        if entry.startswith("SVTYPE="):
                            svtype = entry[7:]
                    corrupt = ("<" + svtype + ">").translate(
                        str.maketrans("RYSWKMBDHV", "N" * 10))
                    if alt == corrupt:
                        fields[4] = "<" + svtype + ">"
                        changed = True
            if changed:
                line = "\t".join(fields)
            out.append(line)
    return out


def is_intercontig_bnd(record):
    fields = record.split("\t")
    info = fields[7]
    if "SVTYPE=BND" not in info:
        return False
    chr2 = [e[5:] for e in info.split(";") if e.startswith("CHR2=")]
    return bool(chr2) and chr2[0] != fields[0]


def assert_differential_match(ref_vcf, our_vcf):
    ref_records = read_records(ref_vcf, normalize_ref_bugs=True)
    our_records = read_records(our_vcf)
    ours_set = set(our_records)
    missing = [r for r in ref_records if r not in ours_set]
    assert not missing, "reference records missing from ours:\n" + "\n".join(missing)
    extras = [r for r in our_records if r not in set(ref_records)]
    bad_extras = [r for r in extras if not is_intercontig_bnd(r)]
    assert not bad_extras, ("extra records beyond documented same-strand "
                            "inter-contig BNDs:\n" + "\n".join(bad_extras))


def make_mixed_dataset(tmpdir, seed=3, depth=24, low_vaf=False):
    sys.path.insert(0, REPO)
    from sniffles_tpu.sim import write_dataset, PlantedSV
    rng = np.random.default_rng(7 + seed)
    svs = []
    pos = 8000
    i = 0
    while pos < 180_000:
        svtype = ["INS", "DEL", "DUP", "INV"][i % 4]
        svlen = int(rng.integers(60, 900))
        vaf = (0.12 if i % 2 else 0.3) if low_vaf else (0.5 if i % 2 else 1.0)
        svs.append(PlantedSV(pos=pos, svtype=svtype, svlen=svlen, vaf=vaf))
        pos += int(rng.integers(3500, 6000))
        i += 1
    return write_dataset(str(tmpdir), ref_len=200_000, svs=svs, depth=depth,
                         seed=seed, n_contigs=2)


def test_differential_hg008(tmp_path):
    run_reference(["--input", HG008, "--vcf", "ref.vcf", "--threads", "0"], tmp_path)
    run_ours(["--input", HG008, "--vcf", "ours.vcf", "--threads", "0"], tmp_path)
    assert_differential_match(tmp_path / "ref.vcf", tmp_path / "ours.vcf")
    # the shared hg008 BNDs must actually be there (not vacuous)
    assert len(read_records(tmp_path / "ref.vcf")) >= 2


def test_differential_hg008_phase_mosaic_arms(tmp_path):
    """The GIAB hg008 extract through the --phase and --mosaic flag
    arms of BOTH tools: byte-parity on real reads under the non-default
    QC cascades (VERDICT r4 item 8 — flag arms on real GIAB data, not
    only simulations)."""
    for arm, name in ((["--phase"], "phase"), (["--mosaic"], "mosaic")):
        run_reference(["--input", HG008, "--vcf", f"ref_{name}.vcf",
                       "--threads", "0", *arm], tmp_path)
        run_ours(["--input", HG008, "--vcf", f"ours_{name}.vcf",
                  "--threads", "0", *arm], tmp_path)
        assert_differential_match(tmp_path / f"ref_{name}.vcf",
                                  tmp_path / f"ours_{name}.vcf")


def test_differential_hg002_no_qc_arms(tmp_path):
    """The single-read hg002 extract with --no-qc (its one candidate is
    below the default support threshold) through plain, --phase and
    --mosaic arms: byte-parity including the emitted support-1 call."""
    for arm, name in (([], "plain"), (["--phase"], "phase"),
                      (["--mosaic"], "mosaic")):
        run_reference(["--input", HG002, "--vcf", f"ref_{name}.vcf",
                       "--threads", "0", "--no-qc", *arm], tmp_path)
        run_ours(["--input", HG002, "--vcf", f"ours_{name}.vcf",
                  "--threads", "0", "--no-qc", *arm], tmp_path)
        assert_differential_match(tmp_path / f"ref_{name}.vcf",
                                  tmp_path / f"ours_{name}.vcf")


def test_differential_sim_mixed(tmp_path):
    """Mixed INS/DEL/DUP/INV, het+hom, with reference FASTA (DEL sequence
    resolution + INS consensus + anchor-base prefixing all active)."""
    bam, fasta = make_mixed_dataset(tmp_path)
    run_reference(["--input", bam, "--vcf", "ref.vcf", "--reference", fasta,
                   "--threads", "0"], tmp_path)
    run_ours(["--input", bam, "--vcf", "ours.vcf", "--reference", fasta,
              "--threads", "0"], tmp_path)
    ref_records = read_records(tmp_path / "ref.vcf")
    assert len(ref_records) >= 50  # the comparison must cover a real callset
    assert_differential_match(tmp_path / "ref.vcf", tmp_path / "ours.vcf")


def test_differential_sim_mosaic(tmp_path):
    """--mosaic arm of the QC cascade (VAF-window filters)."""
    bam, fasta = make_mixed_dataset(tmp_path, seed=11, depth=40, low_vaf=True)
    run_reference(["--input", bam, "--vcf", "ref.vcf", "--reference", fasta,
                   "--mosaic", "--threads", "0"], tmp_path)
    run_ours(["--input", bam, "--vcf", "ours.vcf", "--reference", fasta,
              "--mosaic", "--threads", "0"], tmp_path)
    assert_differential_match(tmp_path / "ref.vcf", tmp_path / "ours.vcf")


def test_differential_genotype_vcf(tmp_path):
    """Force-calling: genotype the reference's own callset with both tools;
    the rewritten VCF lines must match byte-for-byte."""
    bam, fasta = make_mixed_dataset(tmp_path)
    # base callset from OUR caller: reference-written VCFs carry the
    # corrupted symbolic alts (bug #1) straight into force-call output
    run_ours(["--input", bam, "--vcf", "base.vcf", "--reference", fasta,
              "--threads", "0"], tmp_path)
    run_reference(["--input", bam, "--genotype-vcf", "base.vcf",
                   "--vcf", "ref_gt.vcf", "--threads", "0"], tmp_path)
    run_ours(["--input", bam, "--genotype-vcf", "base.vcf",
              "--vcf", "our_gt.vcf", "--threads", "0"], tmp_path)
    ref_records = read_records(tmp_path / "ref_gt.vcf", normalize_ref_bugs=True)
    our_records = read_records(tmp_path / "our_gt.vcf")
    assert ref_records == our_records
    assert len(ref_records) >= 50


@pytest.fixture(scope="module")
def sweep_dataset(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("sweep")
    bam, fasta = make_mixed_dataset(tmpdir)
    tr_bed = os.path.join(str(tmpdir), "tr.bed")
    with open(tr_bed, "w") as f:
        f.write("chr1\t15000\t30000\nchr1\t60000\t90000\n")
    return bam, fasta, tr_bed


@pytest.mark.parametrize("flags", [
    ["--phase"],
    ["--minsvlen", "200"],
    ["--symbolic"],
    ["--no-qc"],
    ["--output-rnames"],
    ["--qc-coverage", "5", "--qc-stdev-abs-max", "100"],
    ["--minsupport", "auto"],
    ["--qc-nm", "--qc-nm-mult", "1.1"],
    ["--detect-large-ins", "False"],
    ["--cluster-binsize", "50"],
], ids=lambda f: " ".join(f))
def test_differential_flag_sweep(sweep_dataset, tmp_path, flags):
    """Flag-surface differential: each combination must produce the same
    records from both tools (modulo the two documented reference bugs)."""
    bam, fasta, tr_bed = sweep_dataset
    args = ["--input", bam, "--reference", fasta, "--threads", "0"] + flags
    run_reference(args + ["--vcf", "ref.vcf"], tmp_path)
    run_ours(args + ["--vcf", "ours.vcf"], tmp_path)
    assert_differential_match(tmp_path / "ref.vcf", tmp_path / "ours.vcf")


def test_differential_tandem_repeats(sweep_dataset, tmp_path):
    """--tandem-repeats changes the cluster merge criteria (cluster_repeat_h,
    merge-all inside TRs); both tools must agree with a TR bed loaded."""
    bam, fasta, tr_bed = sweep_dataset
    args = ["--input", bam, "--reference", fasta, "--threads", "0",
            "--tandem-repeats", tr_bed]
    run_reference(args + ["--vcf", "ref.vcf"], tmp_path)
    run_ours(args + ["--vcf", "ours.vcf"], tmp_path)
    assert_differential_match(tmp_path / "ref.vcf", tmp_path / "ours.vcf")


def test_differential_population_snf(tmp_path):
    """Population flow: both tools write a population SNF during combine
    (--dev-population-snf) and both annotate AFs from one
    (--combine-population), crosswise: ours annotates from the
    reference-written population SNF and vice versa."""
    for name, seed, depth in (("s1", 3, 24), ("s2", 21, 30), ("s3", 33, 24)):
        (tmp_path / name).mkdir(exist_ok=True)
        bam, _ = make_mixed_dataset(tmp_path / name, seed=seed, depth=depth)
        run_ours(["--input", bam, "--snf", f"{name}.snf", "--sample-id", name,
                  "--threads", "0"], tmp_path)
    snfs = ["s1.snf", "s2.snf", "s3.snf"]
    # 1. write population SNFs with both tools
    run_reference(["--input"] + snfs + ["--vcf", "ref_pop_build.vcf",
                   "--dev-population-snf", "ref_pop.snf", "--threads", "0"], tmp_path)
    run_ours(["--input"] + snfs + ["--vcf", "our_pop_build.vcf",
              "--dev-population-snf", "our_pop.snf", "--threads", "0"], tmp_path)
    assert read_records(tmp_path / "ref_pop_build.vcf", normalize_ref_bugs=True) \
        == read_records(tmp_path / "our_pop_build.vcf")
    # 2. crosswise AF annotation: each tool reads the OTHER's population SNF.
    # Reference runs with --threads 1: its inline mode shares one config
    # across tasks, and CombineTask.execute (parallel.py:455) replaces
    # config.combine_population with the opened PopulationSNF, so the
    # second task crashes re-opening it (we guard with an isinstance
    # check, pipeline/tasks.py:463).
    run_reference(["--input"] + snfs + ["--vcf", "ref_annot.vcf",
                   "--combine-population", "our_pop.snf", "--threads", "1"], tmp_path)
    run_ours(["--input"] + snfs + ["--vcf", "our_annot.vcf",
              "--combine-population", "ref_pop.snf", "--threads", "0"], tmp_path)
    ref_records = read_records(tmp_path / "ref_annot.vcf", normalize_ref_bugs=True)
    our_records = read_records(tmp_path / "our_annot.vcf")
    assert len(ref_records) >= 40
    assert ref_records == our_records
    assert any("POPULATION_AF" in r or "SUPP_VEC" in r for r in ref_records)


def test_differential_combine_tmpfile_spill(tmp_path):
    """>20 samples triggers the CombineResultTmpFile part-VCF spill path
    (reference result.py:164-242); both tools must emit the same records."""
    (tmp_path / "base").mkdir(exist_ok=True)
    bam, _ = make_mixed_dataset(tmp_path / "base", seed=3)
    snfs = []
    for i in range(22):
        name = f"t{i:02d}.snf"
        run_ours(["--input", bam, "--snf", name, "--sample-id", f"t{i:02d}",
                  "--threads", "0"], tmp_path)
        snfs.append(name)
    run_reference(["--input"] + snfs + ["--vcf", "ref_multi.vcf",
                   "--threads", "0"], tmp_path)
    run_ours(["--input"] + snfs + ["--vcf", "our_multi.vcf",
              "--threads", "0"], tmp_path)
    ref_records = read_records(tmp_path / "ref_multi.vcf", normalize_ref_bugs=True)
    our_records = read_records(tmp_path / "our_multi.vcf")
    assert len(ref_records) >= 40
    # 22 genotype columns + SUPP_VEC present
    assert all(len(r.split("\t")) == 9 + 22 for r in ref_records)
    assert ref_records == our_records


def test_differential_combine(tmp_path):
    """Multi-sample combine: SNFs written by our caller, merged by both
    tools (reference reads them through its own snf.py + stdlib pickle)."""
    (tmp_path / "s1").mkdir(exist_ok=True)
    (tmp_path / "s2").mkdir(exist_ok=True)
    bam1, fasta = make_mixed_dataset(tmp_path / "s1", seed=3)
    bam2, _ = make_mixed_dataset(tmp_path / "s2", seed=21, depth=30)
    run_ours(["--input", bam1, "--snf", "s1.snf", "--threads", "0"], tmp_path)
    run_ours(["--input", bam2, "--snf", "s2.snf", "--threads", "0"], tmp_path)
    run_reference(["--input", "s1.snf", "s2.snf", "--vcf", "ref_multi.vcf",
                   "--threads", "0"], tmp_path)
    run_ours(["--input", "s1.snf", "s2.snf", "--vcf", "our_multi.vcf",
              "--threads", "0"], tmp_path)
    ref_records = read_records(tmp_path / "ref_multi.vcf", normalize_ref_bugs=True)
    our_records = read_records(tmp_path / "our_multi.vcf")
    assert len(ref_records) >= 40
    assert ref_records == our_records
