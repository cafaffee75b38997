"""Tabix writer + reader round trip on bgzipped VCF output."""
import os
import subprocess
import sys

from sniffles_tpu.sim import PlantedSV, write_dataset
from sniffles_tpu.io.tabix import TabixFile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tabix_roundtrip(tmp_path):
    svs = [PlantedSV(pos=p, svtype="DEL" if i % 2 else "INS", svlen=100 + i)
           for i, p in enumerate(range(40_000, 400_000, 40_000))]
    bam, fasta = write_dataset(str(tmp_path), ref_len=450_000, depth=20,
                               read_len=10_000, seed=15, svs=svs)
    out = tmp_path / "out.vcf.gz"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run([sys.executable, "-m", "sniffles_tpu.cli", "--input", bam,
                          "--vcf", str(out), "--threads", "0"],
                         capture_output=True, text=True, env=env, cwd=str(tmp_path),
                         timeout=600)
    assert res.returncode == 0, res.stderr
    assert out.exists() and (tmp_path / "out.vcf.gz.tbi").exists()

    tbx = TabixFile(str(out))
    assert tbx.contigs == ["chr1"]

    # whole-contig query returns all records
    all_lines = list(tbx.fetch("chr1", 0, 450_000))
    assert len(all_lines) == len(svs)

    # point query around one SV
    lines = list(tbx.fetch("chr1", 119_000, 121_000))
    assert len(lines) == 1
    assert lines[0].split("\t")[1] == "120000"

    # empty window
    assert list(tbx.fetch("chr1", 10, 20)) == []
    # unknown contig
    assert list(tbx.fetch("chrUn", 0, 1000)) == []
