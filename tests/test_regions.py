"""--regions / --region parsing and end-to-end region restriction
(ports reference src/tests/test_regions.py + adds the e2e coverage the
reference lacks)."""
import logging
import os
import subprocess
import sys
from unittest.mock import patch, mock_open

import pytest

from sniffles_tpu.config import SnifflesConfig
from sniffles_tpu.region import Region
from sniffles_tpu.sim import PlantedSV, write_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = ('--input', 'input.bam', '--vcf', 'out.vcf')


def test_good_file():
    data = """
# comment line is ok
chr1\t100\t200\n
chr1\t500\t600\n
chr3\t500\t600\n
        """
    with patch("builtins.open", mock_open(read_data=data)) as mock_file:
        config = SnifflesConfig(*COMMON, '--regions', 'regions.bed')

    assert config.regions_by_contig == {
        'chr1': [Region('chr1', 100, 200), Region('chr1', 500, 600)],
        'chr3': [Region('chr3', 500, 600)],
    }
    mock_file.assert_called_with("regions.bed", "r")


def test_contig_conflict():
    with pytest.raises(SystemExit):
        SnifflesConfig(*COMMON, '--regions', 'regions.bed', '-c', 'chr6')


def test_file_not_found():
    with pytest.raises(FileNotFoundError):
        SnifflesConfig(*COMMON, '--regions', 'does_not_exist.bed')


def test_file_invalid_lines(caplog):
    data = """
... <- invalid line
chr1\t100\t200\n  valid line

"""
    with caplog.at_level(logging.WARNING):
        with patch("builtins.open", mock_open(read_data=data)):
            config = SnifflesConfig(*COMMON, '--regions', 'regions.bed')
    assert config.regions_by_contig == {'chr1': [Region('chr1', 100, 200)]}


def test_region_strings():
    config = SnifflesConfig(*COMMON, '--region', 'chr1:1000-2000',
                            '--region', 'chr2:5-50')
    assert config.regions_by_contig == {
        'chr1': [Region('chr1', 1000, 2000)],
        'chr2': [Region('chr2', 5, 50)],
    }


def run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=str(cwd), timeout=600)


def test_regions_restrict_calling(tmp_path):
    """Only SVs inside the regions BED are called."""
    bam, fasta = write_dataset(
        str(tmp_path), ref_len=200_000, depth=20, read_len=10_000, seed=14,
        svs=[PlantedSV(pos=50_000, svtype="DEL", svlen=150),
             PlantedSV(pos=150_000, svtype="INS", svlen=120)])
    bed = tmp_path / "regions.bed"
    bed.write_text("chr1\t30000\t80000\n")
    out = tmp_path / "out.vcf"
    res = run_cli(["--input", bam, "--vcf", str(out), "--threads", "0",
                   "--regions", str(bed)], tmp_path)
    assert res.returncode == 0, res.stderr
    calls = [l.split("\t") for l in open(out) if not l.startswith("#")]
    assert len(calls) == 1
    assert calls[0][1] == "50000"
