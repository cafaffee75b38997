"""
BND lead extraction against GIAB truth breakends, over
{primary, supplementary} x {forward, reverse} reads; ports the
reference integration tests (reference: src/tests/test_bnd_leads.py)
on top of the built-in BAM decoder.
"""
from dataclasses import dataclass

import pytest

from sniffles_tpu.io.bam import AlignmentFile
from sniffles_tpu.leads import Lead

HG008 = "/root/reference/src/tests/data/hg008.bam"
HG002 = "/root/reference/src/tests/data/hg002.bam"


@dataclass
class Case:
    name: str
    bam: str
    contig: str
    pos: int
    qname: str
    supplementary: bool
    reverse: bool
    # expected lead
    exp_contig: str
    exp_ref_start: int
    exp_mate_contig: str
    exp_mate_ref_start: int
    exp_is_first: bool
    exp_is_reverse: bool


# Truth: chr1 23272628 SV_1 G G]chr5:52747359]  (orange)
ORANGE = dict(exp_contig='chr1', exp_ref_start=23_272_628, exp_mate_contig='chr5',
              exp_mate_ref_start=52_747_359, exp_is_first=True, exp_is_reverse=True)
# Truth: chr18 21493610 SV_136 T [chr20:25499120[T  (green)
GREEN = dict(exp_contig='chr18', exp_ref_start=21_493_610, exp_mate_contig='chr20',
             exp_mate_ref_start=25_499_120, exp_is_first=False, exp_is_reverse=False)
# Truth: chr18 28481423 SV_138 C C[chrX:95812869[  (red, left side)
RED_L = dict(exp_contig='chr18', exp_ref_start=28_481_424, exp_mate_contig='chrX',
             exp_mate_ref_start=95_812_869, exp_is_first=True, exp_is_reverse=False)
# Truth: chrX 95812869 SV_204 G ]chr18:28481423]G  (red, right side)
RED_R = dict(exp_contig='chrX', exp_ref_start=95_812_869, exp_mate_contig='chr18',
             exp_mate_ref_start=28_481_424, exp_is_first=False, exp_is_reverse=True)

CASES = [
    Case('orange_prim_fwd', HG008, 'chr1', 23_272_628, 'fcdb7746-5405-4548-9d72-3a0c81903e1c', False, False, **ORANGE),
    Case('orange_prim_rev', HG008, 'chr1', 23_272_628, '4c68b01d-b732-49f3-9e4a-6f1594ac5f0a', False, True, **ORANGE),
    Case('orange_supp_fwd', HG008, 'chr1', 23_272_628, '5089c480-4eae-4c61-87f8-7278dea0daaa', True, False, **ORANGE),
    Case('orange_supp_rev', HG008, 'chr1', 23_272_628, '5647a0ed-80f2-4c6f-bbe4-937d95ac327b', True, True, **ORANGE),
    Case('green_prim_fwd', HG008, 'chr18', 21_493_610, '7c40fcdd-2d5a-4302-aead-a5ed5bd452a3', False, False, **GREEN),
    Case('green_prim_rev', HG008, 'chr18', 21_493_610, '7297cbb7-714c-4586-998a-017051004b25', False, True, **GREEN),
    Case('green_supp_fwd', HG008, 'chr18', 21_493_610, '42353033-1bbd-4a0c-84dc-cbd6068295f3', True, False, **GREEN),
    Case('green_supp_rev', HG008, 'chr18', 21_493_610, '90398957-a526-49ad-be1b-2665c1b8189e', True, True, **GREEN),
    Case('redl_prim_fwd', HG008, 'chr18', 28_481_423, '49485b61-facf-4f8b-81ab-4ff0f1241ec8', False, False, **RED_L),
    Case('redl_prim_rev', HG008, 'chr18', 28_481_423, '48d9d042-886f-41e5-916c-77a52bd75f29', False, True, **RED_L),
    Case('redl_supp_fwd', HG008, 'chr18', 28_481_423, '04920d3b-9413-4c38-9394-9a888bb7f6cb', True, False, **RED_L),
    Case('redl_supp_rev', HG008, 'chr18', 28_481_423, '4812c8e2-daa8-440c-be1f-7bb15f87b99a', True, True, **RED_L),
    Case('redr_prim_fwd', HG008, 'chrX', 95_812_869, '04920d3b-9413-4c38-9394-9a888bb7f6cb', False, False, **RED_R),
    Case('redr_prim_rev', HG008, 'chrX', 95_812_869, '4812c8e2-daa8-440c-be1f-7bb15f87b99a', False, True, **RED_R),
    Case('redr_supp_fwd', HG008, 'chrX', 95_812_869, '49485b61-facf-4f8b-81ab-4ff0f1241ec8', True, False, **RED_R),
    Case('redr_supp_rev', HG008, 'chrX', 95_812_869, '48d9d042-886f-41e5-916c-77a52bd75f29', True, True, **RED_R),
    Case('hg002_prim_fwd', HG002, 'chr1', 72_346_157, '1a370ebb-0928-48e1-b8d3-ae8473e35654', False, False,
         exp_contig='chr1', exp_ref_start=72_346_157, exp_mate_contig='chr1',
         exp_mate_ref_start=72_300_641, exp_is_first=False, exp_is_reverse=True),
]

_bams: dict[str, AlignmentFile] = {}


def _get_read(bam_path: str, contig: str, pos: int, qname: str):
    if bam_path not in _bams:
        _bams[bam_path] = AlignmentFile(bam_path, require_index=True)
    bam = _bams[bam_path]
    # pysam-style region strings are 1-based; the equivalent 0-based window
    # is [pos-1, pos+1) (reference: test_bnd_leads.py:34 uses f'{contig}:{pos}-{pos+1}')
    for read in bam.fetch(contig, pos - 1, pos + 1):
        if read.query_name == qname:
            return read
    raise ValueError(f'Read {qname} not found in region {contig}:{pos}')


@pytest.mark.parametrize("case", CASES, ids=[c.name for c in CASES])
def test_bnd_lead(case: Case):
    read = _get_read(case.bam, case.contig, case.pos, case.qname)
    assert read.is_supplementary == case.supplementary
    assert read.is_reverse == case.reverse

    lead = Lead.for_bnd(0, read)
    assert lead is not None
    assert lead.contig == case.exp_contig
    assert lead.ref_start == case.exp_ref_start
    assert lead.bnd_info.mate_contig == case.exp_mate_contig
    assert lead.bnd_info.mate_ref_start == case.exp_mate_ref_start
    assert lead.bnd_info.is_first == case.exp_is_first
    assert lead.bnd_info.is_reverse == case.exp_is_reverse


# --------------------------------------------------------------------------
# End-to-end truth check on the real GIAB extracts: the FULL pipeline
# (decode -> leads -> clustering -> calling -> QC -> VCF) must emit
# exactly the truth breakends at exact coordinates — an accuracy anchor
# on real reads, complementing the simulation-based F1 harness.

def _cli_records(bam, tmp_path, extra=()):
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["SNIFFLES_TPU_FORCE_CPU"] = "1"
    out = tmp_path / "out.vcf"
    r = subprocess.run([sys.executable, "-m", "sniffles_tpu.cli", "--input", bam,
                        "--vcf", str(out), "--threads", "0",
                        "--allow-overwrite", *extra],
                       capture_output=True, text=True, env=env, cwd=str(tmp_path),
                       timeout=600)
    assert r.returncode == 0, r.stderr
    recs = []
    for line in open(out):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        recs.append((f[0], int(f[1]), f[4]))
    return recs


def test_hg008_e2e_truth_breakends(tmp_path):
    """GIAB hg008 extract -> the four truth translocation breakends,
    each at the exact truth coordinate with the exact mate syntax, and
    nothing else."""
    recs = _cli_records(HG008, tmp_path)
    assert sorted(recs) == sorted([
        ("chr1", 23_272_628, "N]chr5:52747359]"),
        ("chr18", 21_493_610, "[chr20:25499120[N"),
        ("chr18", 28_481_424, "N[chrX:95812869["),
        ("chrX", 95_812_869, "]chr18:28481424]N"),
    ])


def test_hg008_e2e_truth_genotypes(tmp_path):
    """Genotype-level anchor on the hg008 extract with the FULL default
    QC cascade on: every truth breakend genotypes 1/1 (all 4 reads at
    each junction carry the split), GQ 11 from the binomial model with
    DR=0/DV=4, PRECISE (stdev 0), VAF 1.0, strand +-, and PASS —
    asserting the whole decode -> leads -> cluster -> call -> QC ->
    genotype -> phase chain on real GIAB reads, not just positions
    (reference truth source: src/tests/test_bnd_leads.py fixtures)."""
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["SNIFFLES_TPU_FORCE_CPU"] = "1"
    out = tmp_path / "out.vcf"
    r = subprocess.run([sys.executable, "-m", "sniffles_tpu.cli", "--input",
                        HG008, "--vcf", str(out), "--threads", "0",
                        "--allow-overwrite"],
                       capture_output=True, text=True, env=env,
                       cwd=str(tmp_path), timeout=600)
    assert r.returncode == 0, r.stderr
    rows = {}
    for line in open(out):
        if line.startswith("#"):
            continue
        f = line.rstrip("\n").split("\t")
        info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
        rows[(f[0], int(f[1]))] = (f[6], f[8], f[9], info)
    assert set(rows) == {("chr1", 23_272_628), ("chr18", 21_493_610),
                         ("chr18", 28_481_424), ("chrX", 95_812_869)}
    for key, (filt, fmt, sample, info) in rows.items():
        assert filt == "PASS", key
        assert fmt == "GT:GQ:DR:DV:PS"
        assert sample == "1/1:11:0:4:.", (key, sample)
        assert info["SUPPORT"] == "4"
        assert info["STDEV_POS"] == "0.000"
        assert info["VAF"] == "1.000"
        assert info["STRAND"] == "+-"


def test_hg002_e2e_truth_breakend(tmp_path):
    """GIAB hg002 extract (a single read): its intra-chr1 junction
    72,300,641 <-> 72,346,157 surfaces with --no-qc (support 1 is below
    the default support threshold) as the colinear-split DEL spanning
    exactly the truth junction — byte-parity with the real reference is
    separately pinned by the differential suite."""
    assert _cli_records(HG002, tmp_path) == []
    recs = _cli_records(HG002, tmp_path, extra=("--no-qc",))
    assert ("chr1", 72_300_641, "<DEL>") in recs
