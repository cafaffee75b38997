"""
Cross-compatibility with reference-written SNF files: a .snf produced by
the reference implementation's own classes (pickled sniffles.sv.SVCall
blocks, reference header layout, snf.py:91-224) must combine cleanly in
sniffles-tpu.
"""
import gzip
import json
import os
import pickle
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE_SRC),
                                reason="reference source not mounted")


def build_reference_snf(path: str, contig: str = "chr1", sample_id: str = "REF_SAMPLE"):
    """Write an SNF using the REFERENCE's own classes and layout."""
    sys.path.insert(0, REFERENCE_SRC)
    try:
        import sniffles.sv as ref_sv  # noqa: the reference package (no pysam needed here)

        def make_call(pos, svlen, svtype, alt, sid):
            return ref_sv.SVCall(
                contig=contig, pos=pos, id=f"{svtype}.{sid}", ref="N", alt=alt,
                qual=55, filter="PASS", info={"SUPPORT_LONG": 0}, svtype=svtype,
                svlen=svlen, end=pos + abs(svlen) if svtype == "DEL" else pos,
                genotypes={0: (1, 1, 60, 0, 22, (None, None))},
                precise=True, support=22, rnames=None, qc=True, nm=-1,
                postprocess=None, fwd=11, rev=11,
                coverage_upstream=22, coverage_start=22, coverage_center=22,
                coverage_end=22, coverage_downstream=22)

        block_size = 10 ** 5
        blocks = {}
        for pos, svlen, svtype, alt in [
            (60_000, -180, "DEL", "<DEL>"),
            (130_000, 150, "INS", "A" * 150),
        ]:
            bidx = pos // block_size * block_size
            blk = blocks.setdefault(bidx, {t: [] for t in ref_sv.TYPES})
            blk.setdefault("_COVERAGE", {})
            blk["_COVERAGE"].update({bidx + i * 500: 22 for i in range(block_size // 500)})
            blk[svtype].append(make_call(pos, svlen, svtype, alt, len(blk[svtype])))

        payload = b""
        index = {}
        offset = 0
        for bidx in sorted(blocks):
            data = gzip.compress(pickle.dumps(blocks[bidx]))
            index[str(bidx)] = [(offset, len(data))]
            payload += data
            offset += len(data)

        header = {
            "config": {
                "build": "2.8.1-dev",
                "snf_format_version": "S2_rc4",
                "snf_block_size": block_size,
                "sample_id": sample_id,
                "contig_lengths": [[contig, 1_000_000]],
            },
            "index": {contig: index},
            "snf_candidate_count": 2,
        }
        with open(path, "wb") as f:
            f.write((json.dumps(header) + "\n").encode())
            f.write(payload)
    finally:
        sys.path.remove(REFERENCE_SRC)
        for mod in [m for m in sys.modules if m == "sniffles" or m.startswith("sniffles.")]:
            del sys.modules[mod]


def run_cli(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=str(cwd), timeout=600)


def test_combine_reference_written_snfs(tmp_path):
    s1 = tmp_path / "ref1.snf"
    s2 = tmp_path / "ref2.snf"
    build_reference_snf(str(s1), sample_id="REF_A")
    build_reference_snf(str(s2), sample_id="REF_B")

    out = tmp_path / "multi.vcf"
    res = run_cli(["--input", str(s1), str(s2), "--vcf", str(out), "--threads", "0"],
                  tmp_path)
    assert res.returncode == 0, res.stderr + res.stdout

    with open(out) as f:
        lines = [l.rstrip("\n").split("\t") for l in f if not l.startswith("#")]
        f.seek(0)
        header = [l for l in f if l.startswith("#CHROM")][0]
    assert header.rstrip().split("\t")[9:] == ["REF_A", "REF_B"]
    assert len(lines) == 2
    types = sorted("SVTYPE=DEL" in l[7] or "SVTYPE=INS" in l[7] for l in lines)
    by_type = {("DEL" if "SVTYPE=DEL" in l[7] else "INS"): l for l in lines}
    assert set(by_type) == {"DEL", "INS"}
    # VCF pos emits the 0-based SV pos directly: "VCF requires the index of
    # the base before the SV, so we are fine without offsetting" (vcf.py:217)
    assert by_type["DEL"][1] == "60000"
    for l in lines:
        for gt_col in l[9:]:
            assert gt_col.split(":")[0] == "1/1"
