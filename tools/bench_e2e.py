#!/usr/bin/env python3
"""Large-scale end-to-end benchmark: simulated 30x multi-contig dataset,
sniffles-tpu vs the REAL reference Sniffles2 (via tools/run_reference.py,
same I/O stack on both sides so the comparison isolates calling compute).

Usage:
  python tools/bench_e2e.py [--dir DIR] [--contigs N] [--ref-len BP]
                            [--depth D] [--threads T] [--skip-reference]
                            [--tpu] [--keep]

Writes the dataset once into DIR (reused on reruns if present), then
times: ours (--threads T), ours inline (--threads 0), optionally
--tpu-call, and the reference (T processes). Diffs VCF record sets.
"""
import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def plant_svs(rng, ref_len):
    """A mixed SV layout roughly matching real 30x ONT SV density
    (~1 SV / 40kb) across types/sizes/VAFs."""
    from sniffles_tpu.sim import PlantedSV
    svs = []
    pos = 20_000
    i = 0
    while pos < ref_len - 25_000:
        kind = ("INS", "DEL", "INS", "DEL", "DUP", "INV")[i % 6]
        svlen = int(rng.choice((60, 120, 300, 800, 2500, 6000)))
        vaf = float(rng.choice((1.0, 1.0, 0.55, 0.55, 0.3)))
        if kind in ("DUP", "INV"):
            svlen = max(svlen, 600)
            vaf = 1.0
        svs.append(PlantedSV(pos=pos, svtype=kind, svlen=svlen, vaf=vaf))
        pos += int(rng.integers(30_000, 52_000))
        i += 1
    return svs


def build(args):
    import numpy as np
    from sniffles_tpu.sim import write_dataset

    bam = os.path.join(args.dir, "sim.bam")
    fa = os.path.join(args.dir, "ref.fa")
    if os.path.exists(bam) and os.path.exists(fa) and not args.rebuild:
        print(f"# reusing dataset {bam} ({os.path.getsize(bam)/1e6:.0f} MB)")
        return bam, fa
    os.makedirs(args.dir, exist_ok=True)
    rng = np.random.default_rng(7)
    svs = plant_svs(rng, args.ref_len)
    t0 = time.perf_counter()
    bam, fa = write_dataset(args.dir, ref_len=args.ref_len, svs=svs,
                            depth=args.depth, read_len=12_000, seed=11,
                            n_contigs=args.contigs)
    print(f"# dataset: {len(svs)} SVs/contig x {args.contigs} contigs, "
          f"{os.path.getsize(bam)/1e6:.0f} MB BAM "
          f"({time.perf_counter()-t0:.0f}s to generate)")
    return bam, fa


def run(cmd, env=None):
    t0 = time.perf_counter()
    e = dict(os.environ)
    if env:
        e.update(env)
    p = subprocess.run(cmd, capture_output=True, text=True, env=e)
    dt = time.perf_counter() - t0
    if p.returncode != 0:
        print(p.stdout[-3000:])
        print(p.stderr[-3000:])
        raise SystemExit(f"FAILED ({dt:.1f}s): {' '.join(cmd)}")
    return dt


def records(path, normalize_ref_bugs=False):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_reference_differential import read_records
    return read_records(path, normalize_ref_bugs=normalize_ref_bugs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/bench_e2e")
    ap.add_argument("--contigs", type=int, default=24)
    ap.add_argument("--ref-len", type=int, default=1_200_000)
    ap.add_argument("--depth", type=int, default=30)
    ap.add_argument("--threads", type=int, default=max(2, os.cpu_count() or 2))
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--tpu", action="store_true", help="also time --tpu-call")
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    bam, fa = build(args)
    mb = os.path.getsize(bam) / 1e6
    base = ["--input", bam, "--reference", fa, "--allow-overwrite"]

    ours = os.path.join(args.dir, "ours.vcf")
    t_ours = run([sys.executable, "-m", "sniffles_tpu", *base, "--vcf", ours,
                  "--threads", str(args.threads)])
    n_ours = len(records(ours))
    print(f"ours     --threads {args.threads}: {t_ours:6.1f}s  "
          f"({mb/t_ours:5.1f} MB/s)  {n_ours} SVs")

    inline = os.path.join(args.dir, "ours0.vcf")
    t_inl = run([sys.executable, "-m", "sniffles_tpu", *base, "--vcf", inline,
                 "--threads", "0"])
    print(f"ours     --threads 0: {t_inl:6.1f}s  ({mb/t_inl:5.1f} MB/s)  "
          f"{len(records(inline))} SVs")

    if args.tpu:
        tpu = os.path.join(args.dir, "tpu.vcf")
        t_tpu = run([sys.executable, "-m", "sniffles_tpu", *base, "--vcf", tpu,
                     "--threads", str(args.threads), "--tpu-call"])
        same = records(tpu) == records(ours)
        print(f"ours     --tpu-call:  {t_tpu:6.1f}s  ({mb/t_tpu:5.1f} MB/s)  "
              f"{len(records(tpu))} SVs  identical={same}")

    if not args.skip_reference:
        ref = os.path.join(args.dir, "ref.vcf")
        t_ref = run([sys.executable, os.path.join(HERE, "run_reference.py"),
                     *base, "--vcf", ref, "--threads", str(args.threads)])
        r_ref, r_ours = records(ref, normalize_ref_bugs=True), records(ours)
        both = set(r_ref) & set(r_ours)
        print(f"reference --threads {args.threads}: {t_ref:6.1f}s  "
              f"({mb/t_ref:5.1f} MB/s)  {len(r_ref)} SVs")
        print(f"speedup: {t_ref/t_ours:.2f}x   record overlap: "
              f"{len(both)}/{len(r_ref)} ref, {len(both)}/{len(r_ours)} ours")


if __name__ == "__main__":
    main()
