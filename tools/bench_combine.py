#!/usr/bin/env python3
"""Population-scale combine benchmark: N simulated samples -> N SNFs ->
multi-sample combine, sniffles-tpu vs the REAL reference Sniffles2
(tools/run_reference.py, same I/O stack both sides).

Each sample is an independent simulation over a shared reference with a
shared population SV layout: every sample draws its genotype per site
(hom/het/absent), so the combine path exercises real cross-sample
grouping, genotype merging, and non-included-sample coverage lookup —
the reference's parallel.py:444-566 semantics at population scale.

Usage:
  python tools/bench_combine.py [--dir DIR] [--samples N] [--ref-len BP]
                                [--depth D] [--threads T] [--skip-reference]
                                [--tpu] [--pairs N] [--build-only]
                                [--site-gap MIN,MAX] [--json-out FILE]
"""
import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def plant_population(rng, ref_len, site_gap=(30_000, 52_000)):
    """Population SV sites (pos/type/len AND the inserted sequence fixed
    across samples — carriers of one allele share its sequence, as in a
    real cohort; only genotypes vary per sample)."""
    from sniffles_tpu.sim import PlantedSV, random_seq
    sites = []
    pos = 20_000
    i = 0
    while pos < ref_len - 25_000:
        kind = ("INS", "DEL", "INS", "DEL", "DUP", "INV")[i % 6]
        svlen = int(rng.choice((60, 120, 300, 800, 2500)))
        if kind in ("DUP", "INV"):
            svlen = max(svlen, 600)
        seq = random_seq(rng, svlen) if kind == "INS" else ""
        sites.append(PlantedSV(pos=pos, svtype=kind, svlen=svlen, seq=seq))
        pos += int(rng.integers(site_gap[0], site_gap[1]))
        i += 1
    return sites


def build_sample(args_tuple):
    """Simulate one sample + call it to SNF (run in a subprocess pool)."""
    (dirpath, idx, ref_len, depth) = args_tuple[:4]
    site_gap = args_tuple[4] if len(args_tuple) > 4 else (30_000, 52_000)
    import numpy as np
    from sniffles_tpu.sim import write_dataset, PlantedSV

    name = f"s{idx:03d}"
    snf = os.path.join(dirpath, f"{name}.snf")
    if os.path.exists(snf):
        return snf
    site_rng = np.random.default_rng(7)  # shared layout
    sites = plant_population(site_rng, ref_len, site_gap)
    gt_rng = np.random.default_rng(1000 + idx)
    svs = []
    for s in sites:
        draw = gt_rng.random()
        if draw < 0.25:
            continue  # absent in this sample
        vaf = 1.0 if draw < 0.6 else 0.55
        if s.svtype in ("DUP", "INV"):
            vaf = 1.0
        svs.append(PlantedSV(pos=s.pos, svtype=s.svtype, svlen=s.svlen,
                             seq=s.seq, vaf=vaf))
    sampledir = os.path.join(dirpath, name)
    os.makedirs(sampledir, exist_ok=True)
    bam, _fa = write_dataset(sampledir, ref_len=ref_len, svs=svs, depth=depth,
                             read_len=12_000, seed=100 + idx, n_contigs=2)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.run([sys.executable, "-m", "sniffles_tpu", "--input", bam,
                        "--snf", snf, "--sample-id", name, "--threads", "0",
                        "--allow-overwrite"],
                       capture_output=True, text=True, env=env)
    if p.returncode != 0:
        raise SystemExit(f"SNF build failed for {name}:\n{p.stderr[-2000:]}")
    # the per-sample BAM is large and no longer needed
    import shutil
    shutil.rmtree(sampledir, ignore_errors=True)
    return snf


def run(cmd):
    t0 = time.perf_counter()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.run(cmd, capture_output=True, text=True, env=env)
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
    ap.add_argument("--dir", default="/tmp/bench_combine")
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--ref-len", type=int, default=1_200_000)
    ap.add_argument("--depth", type=int, default=15)
    ap.add_argument("--threads", type=int, default=max(2, os.cpu_count() or 2))
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--mesh", type=int, default=0,
                    help="also run --tpu-mesh N (byte-exact mesh segmentation)")
    ap.add_argument("--tpu", action="store_true",
                    help="host-vs-device alternating-pairs leg for the "
                         "device-owned combine greedy (--tpu-combine through "
                         "the persistent daemon)")
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--site-gap", default="30000,52000",
                    help="population site spacing MIN,MAX bp")
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()
    site_gap = tuple(int(x) for x in args.site_gap.split(","))

    os.makedirs(args.dir, exist_ok=True)
    t0 = time.perf_counter()
    from concurrent.futures import ProcessPoolExecutor
    work = [(args.dir, i, args.ref_len, args.depth, site_gap)
            for i in range(args.samples)]
    with ProcessPoolExecutor(max_workers=args.threads) as ex:
        snfs = list(ex.map(build_sample, work))
    total_mb = sum(os.path.getsize(s) for s in snfs) / 1e6
    print(f"# {len(snfs)} sample SNFs ({total_mb:.1f} MB total, "
          f"{time.perf_counter()-t0:.0f}s to build)")
    if args.build_only:
        return

    result = {"samples": len(snfs), "snf_mb": round(total_mb, 1),
              "threads": args.threads, "site_gap": list(site_gap)}
    ours = os.path.join(args.dir, "ours.vcf")
    host_cmd = [sys.executable, "-m", "sniffles_tpu", "--input", *snfs,
                "--vcf", ours, "--threads", str(args.threads),
                "--allow-overwrite"]

    if args.tpu:
        from bench import Daemon, timed_pairs
        daemon = Daemon(rundir=args.dir)
        if not daemon.start():
            raise SystemExit("device daemon failed to warm (no chip reachable?)")
        tpu_vcf = os.path.join(args.dir, "tpu.vcf")
        counters_path = os.path.join(args.dir, "combine_counters.json")
        tpu_cmd = [sys.executable, "-m", "sniffles_tpu", "--input", *snfs,
                   "--vcf", tpu_vcf, "--threads", str(args.threads),
                   "--tpu-combine", "--allow-overwrite"]
        try:
            p = timed_pairs(host_cmd, tpu_cmd,
                            {"SNIFFLES_TPU_FORCE_CPU": "1"},
                            {**daemon.env(),
                             "SNIFFLES_TPU_COUNTERS_JSON": counters_path},
                            pairs=args.pairs)
        finally:
            daemon.stop()
        r_ours = records(ours)
        identical = records(tpu_vcf) == r_ours
        result["combine_pairs"] = p
        result["combine_seconds_host"] = p["host_median"]
        result["combine_seconds_tpu"] = p["tpu_median"]
        result["tpu_records_identical"] = identical
        try:
            with open(counters_path) as f:
                result["combine_counters"] = json.load(f)
        except (OSError, ValueError):
            pass
        t_ours = p["host_median"]
        print(f"ours      --threads {args.threads}: host {p['host_median']}s "
              f"vs tpu {p['tpu_median']}s over {p['pairs']} pairs "
              f"(tpu wins {p['tpu_wins']}); {len(r_ours)} SVs "
              f"[{'byte-identical' if identical else 'DIVERGED'}]")
    else:
        t_ours = run(host_cmd)
        r_ours = records(ours)
        result["combine_seconds_host"] = round(t_ours, 2)
        print(f"ours      --threads {args.threads}: {t_ours:6.1f}s  {len(r_ours)} SVs")

    if args.mesh:
        mesh_vcf = os.path.join(args.dir, "mesh.vcf")
        t_mesh = run([sys.executable, "-m", "sniffles_tpu", "--input", *snfs,
                      "--vcf", mesh_vcf, "--threads", str(args.threads),
                      "--tpu-mesh", str(args.mesh), "--allow-overwrite"])
        r_mesh = records(mesh_vcf)
        ident = "byte-identical" if r_mesh == r_ours else "DIVERGED"
        print(f"ours mesh --tpu-mesh {args.mesh}: {t_mesh:6.1f}s  "
              f"{len(r_mesh)} SVs  [{ident} vs host]")

    if not args.skip_reference:
        ref = os.path.join(args.dir, "ref.vcf")
        t_ref = run([sys.executable, os.path.join(HERE, "run_reference.py"),
                     "--input", *snfs, "--vcf", ref,
                     "--threads", str(args.threads), "--allow-overwrite"])
        r_ref = records(ref, normalize_ref_bugs=True)
        both = set(r_ref) & set(r_ours)
        print(f"reference --threads {args.threads}: {t_ref:6.1f}s  {len(r_ref)} SVs")
        print(f"speedup: {t_ref/t_ours:.2f}x   record overlap: "
              f"{len(both)}/{len(r_ref)} ref, {len(both)}/{len(r_ours)} ours")
        result["combine_seconds_reference"] = round(t_ref, 2)
        result["vs_reference"] = round(t_ref / t_ours, 2)
        result["record_overlap"] = [len(both), len(r_ref), len(r_ours)]

    line = json.dumps(result)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
