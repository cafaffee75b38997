"""Flag battery: rarely-used option combinations must run cleanly end to
end (parse + runtime paths like --dev-filter, --symbolic, --output-rnames)."""
import os
import subprocess
import sys

import pytest

from sniffles_tpu.sim import PlantedSV, write_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("flags")
    bam, fasta = write_dataset(
        str(tmp), ref_len=150_000, depth=20, read_len=10_000, seed=30,
        svs=[PlantedSV(pos=50_000, svtype="DEL", svlen=150),
             PlantedSV(pos=100_000, svtype="INS", svlen=120)])
    return tmp, bam, fasta


def run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=str(cwd), timeout=600)


FLAG_SETS = [
    ["--symbolic"],
    ["--output-rnames"],
    ["--no-consensus"],
    ["--no-sort"],
    ["--dev-filter", "--no-qc"],
    ["--qc-strand", "True"],
    ["--qc-stdev", "False"],
    ["--minsupport", "auto"],
    ["--minsvlen", "100"],
    ["--mapq", "0", "--min-alignment-length", "0"],
    ["--max-del-seq-len", "10"],
    ["--cluster-binsize", "50", "--cluster-merge-pos", "50"],
    ["--dev-no-resplit"],
    ["--detect-large-ins", "False"],
    ["--mosaic", "--mosaic-include-germline"],
    ["--dev-dump-clusters"],
    ["--quiet"],
    ["--phase", "--phase-conflict-threshold", "0.2"],
]


@pytest.mark.parametrize("flags", FLAG_SETS, ids=[" ".join(f) for f in FLAG_SETS])
def test_flag_combo_runs(dataset, flags, tmp_path):
    tmp, bam, fasta = dataset
    out = tmp_path / "out.vcf"
    res = run_cli(["--input", bam, "--vcf", str(out), "--threads", "0",
                   "--reference", fasta] + flags, tmp_path)
    assert res.returncode == 0, (flags, res.stderr, res.stdout)
    assert out.exists()
    header_seen = False
    for line in open(out):
        if line.startswith("#CHROM"):
            header_seen = True
    assert header_seen


def test_symbolic_output(dataset, tmp_path):
    tmp, bam, fasta = dataset
    out = tmp_path / "sym.vcf"
    res = run_cli(["--input", bam, "--vcf", str(out), "--threads", "0",
                   "--reference", fasta, "--symbolic"], tmp_path)
    assert res.returncode == 0
    calls = [l.split("\t") for l in open(out) if not l.startswith("#")]
    assert calls
    for c in calls:
        assert c[4] in ("<DEL>", "<INS>", "<DUP>", "<INV>") or c[4].startswith("<")
        assert c[3] == "N"


def test_output_rnames(dataset, tmp_path):
    tmp, bam, fasta = dataset
    out = tmp_path / "rn.vcf"
    res = run_cli(["--input", bam, "--vcf", str(out), "--threads", "0",
                   "--output-rnames"], tmp_path)
    assert res.returncode == 0
    calls = [l for l in open(out) if not l.startswith("#")]
    assert calls and all("RNAMES=" in c for c in calls)
    assert "read" in calls[0].split("RNAMES=")[1]
