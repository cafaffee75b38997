"""Write-direction SNF interop: SNF files written by this tool must be
loadable by reference Sniffles2's stdlib unpickler (reference:
snf.py:116-119 unserialize_block, sniffles:408-427 header validation).

The reference caller itself cannot run here (no pysam), but its data
model imports with a tiny pysam/edlib stub — so these tests unpickle
our SNF blocks in a clean subprocess where only the REAL reference
modules at /root/reference/src resolve the class paths, exactly as a
reference combine run would.
"""
import gzip
import json
import os
import pickle
import subprocess
import sys

import pytest

REF_SRC = "/root/reference/src"
REF_BAM = os.path.join(REF_SRC, "tests/data/hg008.bam")

# runs in a subprocess with NO sniffles_tpu on the path: class paths in
# the pickle stream must resolve through the reference package alone
_REFERENCE_LOADER = r"""
import gzip, json, pickle, sys, types

snf_path = sys.argv[1]

pysam = types.ModuleType("pysam")
class _Stub:  # noqa: E701 - attribute-only stand-in
    pass
for _n in ("AlignedSegment", "AlignmentFile", "FastaFile", "VariantFile"):
    setattr(pysam, _n, _Stub)
for _i, _n in enumerate(("CMATCH", "CINS", "CDEL", "CREF_SKIP", "CSOFT_CLIP",
                         "CHARD_CLIP", "CPAD", "CEQUAL", "CDIFF", "CBACK")):
    setattr(pysam, _n, _i)
sys.modules["pysam"] = pysam
sys.modules["edlib"] = types.ModuleType("edlib")
sys.path.insert(0, %r)

import sniffles.sv  # the real reference module

with open(snf_path, "rb") as f:
    header_line = f.readline()
    header = json.loads(header_line)
    base = len(header_line)
    out = {
        "snf_format_version": header["config"]["snf_format_version"],
        "snf_block_size": header["config"]["snf_block_size"],
        "build": header["config"]["build"],
        "reqc": header["config"]["build"].partition("-")[0] < "2.5.3",
        "candidates": [],
    }
    for contig, blocks in header["index"].items():
        for block_id, spans in blocks.items():
            for off, length in spans:
                f.seek(base + off)
                data = gzip.decompress(f.read(length))
                block = pickle.loads(data)
                for svtype, cands in block.items():
                    if svtype == "_COVERAGE":
                        continue
                    for c in cands:
                        assert type(c) is sniffles.sv.SVCall, type(c)
                        assert type(c).__module__ == "sniffles.sv"
                        out["candidates"].append({
                            "contig": c.contig, "pos": c.pos,
                            "svtype": c.svtype, "svlen": c.svlen,
                            "support": c.support, "alt": c.alt,
                            "genotypes": {str(k): list(v) for k, v in
                                          (c.genotypes or {}).items()},
                        })
print(json.dumps(out))
""" % (REF_SRC,)


@pytest.fixture(scope="module")
def our_snf(tmp_path_factory):
    """Call hg008.bam with --snf through the production CLI."""
    d = tmp_path_factory.mktemp("refinterop")
    vcf = str(d / "out.vcf")
    snf = str(d / "out.snf")
    from sniffles_tpu.cli import main
    argv_backup = sys.argv
    sys.argv = ["sniffles", "--input", REF_BAM, "--vcf", vcf, "--snf", snf,
                "--threads", "0", "--no-progress"]
    try:
        main()
    finally:
        sys.argv = argv_backup
    return snf


def _load_with_reference(snf_path):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # sniffles_tpu must NOT be importable
    res = subprocess.run([sys.executable, "-c", _REFERENCE_LOADER, snf_path],
                         capture_output=True, text=True, env=env,
                         cwd="/tmp", timeout=120)
    assert res.returncode == 0, res.stderr
    return json.loads(res.stdout)


def test_reference_unpickles_our_blocks(our_snf):
    out = _load_with_reference(our_snf)
    assert out["candidates"], "no candidates stored"
    # every candidate materialized as the genuine reference SVCall class
    bnds = [c for c in out["candidates"] if c["svtype"] == "BND"]
    assert len(bnds) >= 4


def test_reference_header_validation_passes(our_snf):
    """The exact checks reference combine applies before accepting an
    SNF input (reference: sniffles:408-427, snf.py:68-81)."""
    out = _load_with_reference(our_snf)
    assert out["snf_format_version"] == "S2_rc4"
    assert out["snf_block_size"] == 10 ** 5
    # current-generation build: must NOT trigger the reference's
    # auto re-QC for pre-2.5.3 files
    assert out["reqc"] is False


def test_reference_load_matches_our_load(our_snf):
    """Field-level agreement between the reference's view of our SNF
    and our own reader."""
    out = _load_with_reference(our_snf)
    from sniffles_tpu.config import SnifflesConfig
    from sniffles_tpu.io.snf import SNFile
    SnifflesConfig.GLOBAL = SnifflesConfig(
        "--input", REF_BAM, "--vcf", "x.vcf")
    ours = []
    snf_in = SNFile.open(our_snf)
    for contig, blocks in snf_in.index.items():
        for block_id in blocks:
            for block in snf_in.read_blocks(contig, int(block_id)) or []:
                for svtype, cands in block.items():
                    if svtype == "_COVERAGE":
                        continue
                    ours.extend(cands)
    theirs = sorted(out["candidates"], key=lambda c: (c["contig"], c["pos"]))
    ours = sorted(ours, key=lambda c: (c.contig, c.pos))
    assert len(theirs) == len(ours)
    for t, o in zip(theirs, ours):
        assert (t["contig"], t["pos"], t["svtype"], t["svlen"], t["support"],
                t["alt"]) == (o.contig, o.pos, o.svtype, o.svlen, o.support,
                              o.alt)
