"""Combine at scale: block-level task scatter and the >max-inmemory
tmp-file spill path (reference: parallel.py:422-442, result.py:164-242)."""
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
                          capture_output=True, text=True, env=env, cwd=str(cwd), timeout=900)


def test_combine_task_scatter():
    """Blocks distribute across tasks; non-first tasks reprocess their
    first block without double-emitting (scatter contract)."""
    from sniffles_tpu.pipeline.tasks import CombineTask
    from sniffles_tpu.config import SnifflesConfig

    config = SnifflesConfig("--input", "x.snf", "--vcf", "y.vcf", "--threads", "4")
    config.mode = "combine"
    config.sample_ids_vcf = [(i, f"S{i}") for i in range(40)]
    task = CombineTask(id=0, contig="chr1", start=0, end=50_000_000 - 1, sv_id=0,
                       config=config)
    total_blocks = len(task.block_indices)
    assert total_blocks * 40 > CombineTask.TARGET_WORK_PER_TASK

    shards = task.scatter()
    assert len(shards) > 1
    # every original block is OWNED by exactly one shard (own range =
    # block_indices[overlap_nblocks:]); non-first shards additionally
    # carry the previous shard's last two blocks as rebuild context
    owned = []
    for i, s in enumerate(shards):
        own = s.block_indices[s.overlap_nblocks:]
        owned.extend(own)
        if i == 0:
            assert s.overlap_nblocks == 0
        else:
            prev_own = shards[i - 1].block_indices[shards[i - 1].overlap_nblocks:]
            assert s.block_indices[:s.overlap_nblocks] == prev_own[-s.overlap_nblocks:]
            assert s.suppress_tail == (i < len(shards) - 1) or not shards[i - 1].suppress_tail
    assert sorted(owned) == task.block_indices
    assert shards[-1].suppress_tail is False
    # ids are unique and ordered
    ids = [s.id for s in shards]
    assert len(set(ids)) == len(ids)


def test_combine_21_samples_tmpfile_spill(tmp_path):
    """21 inputs exceed --combine-max-inmemory-results (20): results spill
    to per-task part-VCFs and are concatenated at emit."""
    bam, fasta = write_dataset(
        str(tmp_path), ref_len=120_000, depth=24, read_len=10_000, seed=13,
        svs=[PlantedSV(pos=60_000, svtype="DEL", svlen=180)])
    snfs = []
    for i in range(21):
        s = tmp_path / f"s{i:02d}.snf"
        if i == 0:
            res = run_cli(["--input", bam, "--snf", str(s), "--sample-id", f"S{i:02d}",
                           "--threads", "0"], tmp_path)
            assert res.returncode == 0, res.stderr
        else:
            # identical sample content: just copy the first SNF
            s.write_bytes((tmp_path / "s00.snf").read_bytes())
        snfs.append(str(s))

    # use a .tsv list with explicit sample ids (copies carry S00's header id)
    tsv = tmp_path / "samples.tsv"
    tsv.write_text("".join(f"{s}\tS{i:02d}\n" for i, s in enumerate(snfs)))

    out = tmp_path / "multi.vcf"
    res = run_cli(["--input", str(tsv), "--vcf", str(out), "--threads", "0", "--no-sort"],
                  tmp_path)
    assert res.returncode == 0, res.stderr + res.stdout
    with open(out) as f:
        lines = [l for l in f if not l.startswith("#")]
    assert len(lines) == 1
    fields = lines[0].rstrip("\n").split("\t")
    assert len(fields) == 9 + 21  # all 21 samples genotyped
    gts = {f.split(":")[0] for f in fields[9:]}
    assert gts == {"1/1"}
    # sample header row covers all 21 ids
    with open(out) as f:
        header = [l for l in f if l.startswith("#CHROM")][0]
    assert header.rstrip().split("\t")[9:] == [f"S{i:02d}" for i in range(21)]


def _make_boundary_snf(path, pos, sample_label):
    """SNF with one candidate near an SNF-block boundary."""
    import gzip, json, pickle
    from sniffles_tpu import svcall as sv
    call = sv.SVCall(contig="chr1", pos=pos, id="DEL.X", ref="N", alt="<DEL>", qual=50,
                     filter="PASS", info={}, svtype="DEL", svlen=-300, end=pos + 300,
                     genotypes={0: (1, 1, 60, 0, 20, (None, None))}, precise=True,
                     support=20, rnames=None, qc=True, nm=-1, postprocess=None,
                     fwd=10, rev=10, coverage_upstream=20, coverage_start=20,
                     coverage_center=20, coverage_end=20, coverage_downstream=20)
    bidx = pos // 100000 * 100000
    blk = {t: [] for t in sv.TYPES}
    blk["_COVERAGE"] = {bidx + i * 500: 20 for i in range(200)}
    blk["DEL"].append(call)
    data = gzip.compress(pickle.dumps(blk))
    header = {"config": {"build": "0.1.0", "snf_format_version": "S2_rc4",
                         "snf_block_size": 100000, "sample_id": sample_label,
                         "contig_lengths": [["chr1", 1_000_000]]},
              "index": {"chr1": {str(bidx): [(0, len(data))]}},
              "snf_candidate_count": 1}
    with open(path, "wb") as f:
        f.write((json.dumps(header) + "\n").encode())
        f.write(data)


def test_scatter_seam_exactness(tmp_path, monkeypatch):
    """A group straddling an SNF-block boundary across samples must merge
    identically under any scatter width (two-block-overlap handoff with
    ghost suppression; the reference only sketches this in a comment,
    parallel.py:425-429, and splits the group)."""
    from sniffles_tpu.config import SnifflesConfig
    from sniffles_tpu.pipeline.tasks import CombineTask

    a = tmp_path / "a.snf"
    b = tmp_path / "b.snf"
    _make_boundary_snf(str(a), 99_990, "A")
    _make_boundary_snf(str(b), 100_010, "B")

    cfg = SnifflesConfig("--input", str(a), str(b), "--vcf", str(tmp_path / "x.vcf"),
                         "--threads", "4")
    cfg.mode = "combine"
    cfg.snf_input_info = [{"internal_id": 0, "sample_id": "A", "filename": str(a)},
                          {"internal_id": 1, "sample_id": "B", "filename": str(b)}]
    cfg.sample_ids_vcf = [(0, "A"), (1, "B")]

    def run(target):
        monkeypatch.setattr(CombineTask, "TARGET_WORK_PER_TASK", target)
        base = CombineTask(id=0, contig="chr1", start=0, end=999_999, sv_id=0, config=cfg)
        calls = []
        for t in base.scatter():
            calls.extend(t.execute().svcalls)
        return sorted((c.pos, tuple(sorted((k, v[:2]) for k, v in c.genotypes.items())))
                      for c in calls)

    single = run(10_000_000)
    assert len(single) == 1
    assert single[0][0] == 99_990
    assert dict(single[0][1]) == {0: (1, 1), 1: (1, 1)}
    for target in (20, 10, 4):
        assert run(target) == single, target
