"""Truth-based end-to-end test of the local-assembly rescue: a planted
INS/DEL on a simulated BAM, a deliberately imprecise filtered call, and
LocalAsm.assembly (graph POA consensus + consensus-vs-reference MSA +
gap scan) must recover the true position and sequence
(reference: local_asm.py:254-304; accuracy standard per VERDICT r1 #8)."""
import numpy as np
import pytest

from sniffles_tpu.config import SnifflesConfig
from sniffles_tpu.io.bam import AlignmentFile
from sniffles_tpu.local_asm import LocalAsm
from sniffles_tpu.ops.edit_distance import edit_distance
from sniffles_tpu.sim import PlantedSV, random_seq, write_dataset
from sniffles_tpu.svcall import SVCall


def _make_call(contig, pos, svtype, svlen, rnames):
    end = pos + 1 if svtype == "INS" else pos + abs(svlen)
    return SVCall(contig=contig, pos=pos, id=f"{svtype}.test", ref="N",
                  alt=f"<{svtype}>", qual=50, filter="SUPPORT_MIN", info={},
                  svtype=svtype, svlen=svlen if svtype == "INS" else -abs(svlen),
                  end=end, genotypes={}, precise=False,
                  support=len(rnames), rnames=rnames, postprocess=None,
                  qc=False, nm=0.0, fwd=len(rnames), rev=0)


def _supporting_rnames(bam_path, contig, pos):
    bam = AlignmentFile(bam_path, "rb", require_index=True)
    names = [r.query_name for r in bam.fetch(region=f"{contig}:{pos - 2000}-{pos + 2000}")]
    return names


@pytest.mark.parametrize("svtype,svlen", [("INS", 220), ("DEL", 300)])
def test_rescue_recovers_planted_sv(tmp_path, svtype, svlen):
    rng = np.random.default_rng(31)
    true_pos = 60_000
    seq = random_seq(rng, svlen) if svtype == "INS" else ""
    sv = PlantedSV(pos=true_pos, svtype=svtype, svlen=svlen, seq=seq)
    bam, fasta = write_dataset(str(tmp_path), ref_len=120_000, depth=18,
                               read_len=10_000, seed=31, svs=[sv])

    config = SnifflesConfig("--input", bam, "--vcf", str(tmp_path / "o.vcf"),
                            "--reference", fasta)
    config.input = bam  # the CLI flattens the nargs list at mode detection
    rnames = _supporting_rnames(bam, "chr1", true_pos)
    assert len(rnames) >= 8

    # the filtered call is deliberately imprecise: off by 25bp in pos,
    # 10% in length — rescue must land on the truth anyway
    call = _make_call("chr1", true_pos + 25, svtype,
                      int(svlen * 0.9), rnames)
    rescued = LocalAsm(call).assembly(config)
    assert rescued, "assembly rescue did not fire"
    assert call.filter == "PASS" and call.qc
    assert call.info.get("LASM")
    assert abs(call.pos - true_pos) <= 25, call.pos

    if svtype == "INS":
        # solve_ins stores the recovered sequence via update via filter
        # path; recompute from the rescue: call.end == pos+1 for INS
        assert call.end == call.pos + 1


def test_rescue_ins_sequence_accuracy(tmp_path):
    """The inserted sequence recovered from the consensus-vs-reference
    gap matches the planted sequence at >= 95% identity."""
    rng = np.random.default_rng(32)
    true_pos = 55_000
    svlen = 400
    seq = random_seq(rng, svlen)
    sv = PlantedSV(pos=true_pos, svtype="INS", svlen=svlen, seq=seq)
    bam, fasta = write_dataset(str(tmp_path), ref_len=110_000, depth=18,
                               read_len=10_000, seed=32, svs=[sv])
    config = SnifflesConfig("--input", bam, "--vcf", str(tmp_path / "o.vcf"),
                            "--reference", fasta)
    config.input = bam  # the CLI flattens the nargs list at mode detection
    rnames = _supporting_rnames(bam, "chr1", true_pos)

    call = _make_call("chr1", true_pos + 15, "INS", int(svlen * 0.95), rnames)
    asm = LocalAsm(call)
    assert asm.assembly(config)
    assert abs(call.pos - true_pos) <= 20

    # re-run the solve to capture the recovered sequence directly
    # (assembly() discards it after update_sv_cand)
    from sniffles_tpu.io.fasta import FastaFile
    from sniffles_tpu.local_asm import SPOA
    from sniffles_tpu.ops.poa import poa
    bam_h = asm.open_bam(config.input, config.reference)
    fetch_region = f"chr1:{call.pos - 5000}-{call.end + 5000}"
    windows, _, msa_region = asm._harvest_windows(bam_h, fetch_region,
                                                  call.rnames, for_del=False)
    ref_seq = FastaFile(config.reference).fetch(region=msa_region)
    scores = SPOA()
    scores.set(abs(call.svlen))
    cons, _ = poa(windows[:30], genmsa=True,
                  min_coverage=round(len(windows) * 0.5))
    _, msa = poa([cons, ref_seq], genmsa=True, min_coverage=1,
                 m=scores.match, n=scores.miss, g=scores.gap_open,
                 e=scores.gap_expand, slack=abs(call.svlen) + 256)
    sv_aln, ref_aln = msa
    _, ins_seq, ok = asm.solve_ins(msa_region, sv_aln, ref_aln)
    assert ok
    ident = 1 - edit_distance(ins_seq, seq) / svlen
    assert ident >= 0.95, ident
