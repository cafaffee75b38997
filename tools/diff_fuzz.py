#!/usr/bin/env python3
"""Randomized differential fuzzing: simulated datasets with adversarial
SV layouts (dense/overlapping sites, mixed VAFs, random flag subsets),
run through BOTH the real reference Sniffles2 (tools/run_reference.py)
and sniffles-tpu, comparing VCF records byte-for-byte modulo the
documented reference bugs (see tests/test_reference_differential.py).

Usage: python tools/diff_fuzz.py [n_seeds] [start_seed]
Prints one line per seed; nonzero exit if any seed mismatches.
"""
import os
import random
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_reference_differential import (  # noqa: E402
    read_records, is_intercontig_bnd)


def gen_dataset(tmpdir, seed):
    import numpy as np
    from sniffles_tpu.sim import write_dataset, PlantedSV
    rng = np.random.default_rng(seed)
    rnd = random.Random(seed)
    svs = []
    pos = 6000
    while pos < 180_000:
        svtype = rnd.choice(["INS", "DEL", "DUP", "INV"])
        svlen = int(rng.integers(50, 2000))
        vaf = rnd.choice([1.0, 1.0, 0.5, 0.5, 0.3, 0.15])
        svs.append(PlantedSV(pos=pos, svtype=svtype, svlen=svlen, vaf=vaf))
        # sometimes nearly-adjacent SVs (clustering stress)
        pos += rnd.choice([600, 900, 1500]) if rnd.random() < 0.25 else int(rng.integers(2500, 6000))
    depth = rnd.choice([12, 20, 30, 45])
    bam, fasta = write_dataset(tmpdir, ref_len=200_000, svs=svs, depth=depth,
                               seed=seed, read_len=rnd.choice([8000, 12000, 20000]),
                               phased=rnd.random() < 0.4,
                               n_contigs=rnd.choice([1, 2]))
    flags = []
    if rnd.random() < 0.3:
        flags += ["--minsvlen", str(rnd.choice([35, 80, 150]))]
    if rnd.random() < 0.3:
        flags += ["--mosaic"]
    if rnd.random() < 0.3:
        flags += ["--phase"]
    if rnd.random() < 0.25:
        flags += ["--no-qc"]
    if rnd.random() < 0.25:
        flags += ["--output-rnames"]
    if rnd.random() < 0.3:
        tr = os.path.join(tmpdir, "tr.bed")
        with open(tr, "w") as f:
            f.write("chr1\t10000\t60000\nchr1\t100000\t150000\n")
        flags += ["--tandem-repeats", tr]
    if rnd.random() < 0.5:
        flags += ["--reference", fasta]
    return bam, flags


def run(cmd, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(cmd, capture_output=True, text=True, cwd=cwd,
                          env=env, timeout=600)


def _diff(tmpdir, flags, label, seed):
    ref = read_records(os.path.join(tmpdir, "ref.vcf"), normalize_ref_bugs=True)
    ours = read_records(os.path.join(tmpdir, "ours.vcf"))
    ours_set = set(ours)
    missing = [x for x in ref if x not in ours_set]
    extras = [x for x in ours if x not in set(ref)
              and not is_intercontig_bnd(x)]
    if missing or extras:
        detail = "\n".join("MISSING " + m for m in missing[:5])
        detail += "\n" + "\n".join("EXTRA " + e for e in extras[:5])
        return (f"seed {seed}: {label} MISMATCH flags={flags} "
                f"ref={len(ref)} ours={len(ours)} "
                f"missing={len(missing)} extras={len(extras)}\n{detail}")
    print(f"seed {seed}: {label} OK ({len(ref)} records, flags={flags})", flush=True)
    return None


def fuzz_seed(seed, tpu=False, mesh=False):
    with tempfile.TemporaryDirectory() as tmpdir:
        bam, flags = gen_dataset(tmpdir, seed)
        args = ["--input", bam, "--threads", "0"] + flags
        r = run([sys.executable, os.path.join(REPO, "tools", "run_reference.py")]
                + args + ["--vcf", "ref.vcf"], tmpdir)
        if r.returncode != 0:
            return f"seed {seed}: REFERENCE FAILED ({flags})\n{r.stderr[-2000:]}"
        ours_args = list(args)
        if mesh:
            ours_args += ["--tpu-call", "--tpu-mesh", "8"]
        elif tpu:
            ours_args += ["--tpu-call"]
        o = run([sys.executable, "-m", "sniffles_tpu.cli"]
                + ours_args + ["--vcf", "ours.vcf"], tmpdir)
        if o.returncode != 0:
            return f"seed {seed}: OURS FAILED ({flags})\n{o.stderr[-2000:]}"
        label = "tpu-mesh" if mesh else ("tpu-call" if tpu else "call")
        return _diff(tmpdir, flags, label, seed)


def fuzz_seed_genotype(seed):
    """Force-calling fuzz: call a dataset with the reference, then
    re-genotype its VCF with BOTH tools on the same BAM and diff the
    re-emitted records (GenotypeTask candidate matching,
    reference: parallel.py:309-366)."""
    with tempfile.TemporaryDirectory() as tmpdir:
        bam, flags = gen_dataset(tmpdir, seed)
        # base VCF from OUR caller: the reference's write_call corrupts
        # symbolic ALTs under --reference (<DUP> -> <NUP>, IUPAC cleanup
        # bug normalized elsewhere); both tools re-emit input lines
        # verbatim in genotype mode, so the input must be well-formed
        callargs = ["--input", bam, "--threads", "0"] + flags
        r = run([sys.executable, "-m", "sniffles_tpu.cli"]
                + callargs + ["--vcf", "base.vcf"], tmpdir)
        if r.returncode != 0:
            return f"seed {seed}: BASE CALL FAILED ({flags})\n{r.stderr[-2000:]}"
        gtargs = ["--input", bam, "--genotype-vcf", "base.vcf",
                  "--threads", "0"] + flags
        r = run([sys.executable, os.path.join(REPO, "tools", "run_reference.py")]
                + gtargs + ["--vcf", "ref.vcf"], tmpdir)
        if r.returncode != 0:
            return f"seed {seed}: REFERENCE GT FAILED ({flags})\n{r.stderr[-2000:]}"
        o = run([sys.executable, "-m", "sniffles_tpu.cli"]
                + gtargs + ["--vcf", "ours.vcf"], tmpdir)
        if o.returncode != 0:
            return f"seed {seed}: OURS GT FAILED ({flags})\n{o.stderr[-2000:]}"
        return _diff(tmpdir, flags, "genotype", seed)


def fuzz_seed_combine(seed):
    """Multi-sample fuzz: two independently simulated samples -> SNFs
    (written by ours) -> combine by BOTH tools, diffed byte-for-byte."""
    rnd = random.Random(seed * 31 + 7)
    with tempfile.TemporaryDirectory() as tmpdir:
        snfs = []
        for i in range(rnd.choice([2, 3])):
            sampledir = os.path.join(tmpdir, f"s{i}")
            os.makedirs(sampledir)
            bam, _ = gen_dataset(sampledir, seed + 100_000 * (i + 1))
            snf = os.path.join(tmpdir, f"s{i}.snf")
            o = run([sys.executable, "-m", "sniffles_tpu.cli", "--input", bam,
                     "--snf", snf, "--sample-id", f"s{i}", "--threads", "0"], tmpdir)
            if o.returncode != 0:
                return f"seed {seed}: SNF BUILD FAILED\n{o.stderr[-2000:]}"
            snfs.append(snf)
        flags = []
        if rnd.random() < 0.3:
            flags += ["--combine-output-filtered"]
        if rnd.random() < 0.3:
            flags += ["--combine-pctseq", "0"]
        args = ["--input", *snfs, "--threads", "0"] + flags
        r = run([sys.executable, os.path.join(REPO, "tools", "run_reference.py")]
                + args + ["--vcf", "ref.vcf"], tmpdir)
        if r.returncode != 0:
            return f"seed {seed}: REFERENCE COMBINE FAILED ({flags})\n{r.stderr[-2000:]}"
        o = run([sys.executable, "-m", "sniffles_tpu.cli"]
                + args + ["--vcf", "ours.vcf"], tmpdir)
        if o.returncode != 0:
            return f"seed {seed}: OURS COMBINE FAILED ({flags})\n{o.stderr[-2000:]}"
        return _diff(tmpdir, flags, "combine", seed)


def main():
    argv = [a for a in sys.argv[1:] if a not in ("--combine", "--tpu", "--genotype", "--mesh")]
    combine = "--combine" in sys.argv
    genotype = "--genotype" in sys.argv
    tpu = "--tpu" in sys.argv  # ours runs with --tpu-call (device clustering)
    mesh = "--mesh" in sys.argv  # ours runs with --tpu-call --tpu-mesh 8
    n = int(argv[0]) if argv else 10
    start = int(argv[1]) if len(argv) > 1 else 1000
    failures = []
    for seed in range(start, start + n):
        if combine:
            msg = fuzz_seed_combine(seed)
        elif genotype:
            msg = fuzz_seed_genotype(seed)
        else:
            msg = fuzz_seed(seed, tpu=tpu, mesh=mesh)
        if msg:
            print(msg, flush=True)
            failures.append(seed)
    if failures:
        print(f"FAILED seeds: {failures}")
        sys.exit(1)
    print(f"all {n} seeds OK")


if __name__ == "__main__":
    main()
