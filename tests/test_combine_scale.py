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
    # every original block appears in exactly one shard
    seen = []
    for s in shards:
        seen.extend(s.block_indices)
    assert sorted(seen) == task.block_indices
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
