"""Whole-task device combine greedy (ops/combine_greedy grid kernel +
parallel/combine_device_greedy packer/replay): the per-(task, svtype)
dispatch must reproduce the host's flush-by-flush sequential greedy
EXACTLY through the real SVGroup objects, with flagged or oversized
segments replayed by the live host greedy (reference:
cluster.py:356-390, parallel.py:444-566)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from sniffles_tpu import cluster as cl  # noqa: E402
from sniffles_tpu import svcall as sv  # noqa: E402
from sniffles_tpu.config import SnifflesConfig  # noqa: E402
from sniffles_tpu.parallel import combine_device_greedy as cdg  # noqa: E402


def make_config(**kw):
    config = SnifflesConfig("--input", "x.bam", "--vcf", "y.vcf")
    for k, v in kw.items():
        setattr(config, k, v)
    return config


def cand(pos, svlen, svtype="DEL", alt="<DEL>", support=10, sample=0, cid=0):
    return sv.SVCall(contig="chr1", pos=pos, id=f"c{cid}", ref="N", alt=alt,
                     qual=50, filter="PASS", info={}, svtype=svtype,
                     svlen=svlen, end=pos + abs(svlen),
                     genotypes={0: (1, 1, 60, 0, 20, (None, None))},
                     precise=True, support=support, rnames=None, qc=True,
                     nm=-1, postprocess=None, fwd=5, rev=5,
                     coverage_upstream=20, coverage_start=20,
                     coverage_center=20, coverage_end=20,
                     coverage_downstream=20, sample_internal_id=sample)


def groups_shape(groups):
    return [(sorted(c.id for c in g.candidates),
             round(g.pos_mean, 9), round(abs(g.len_mean), 9))
            for g in groups]


def run_device_task(svtype, flushes, config, counters=None):
    counters = counters if counters is not None else {}
    ctx = cdg.pack_task_assignments(svtype, flushes, config,
                                    counters=counters, device=None)
    assert ctx is not None
    keep = []
    ed_cache = {} if (svtype == "INS" and config.combine_pctseq) else None
    for _ in flushes:
        keep = cdg.replay_flush_task(ctx, keep, config, ed_cache)
    return keep, counters


def run_host_task(svtype, flushes, config):
    keep = []
    for batch, _, _ in flushes:
        ed_cache = {} if (svtype == "INS" and config.combine_pctseq) else None
        keep = cl.resolve_block_groups(
            svtype, sorted(batch, key=lambda c: c.support, reverse=True),
            keep, config, ed_cache)
    return keep


def random_flushes(rng, svtype="DEL", n_sites=6, site_span=400_000,
                   per_site=(4, 30), alt_pool=None):
    sites = sorted(int(rng.integers(0, site_span)) for _ in range(n_sites))
    cands = []
    cid = 0
    for sp in sites:
        sl = int(rng.integers(50, 900))
        for _ in range(int(rng.integers(*per_site))):
            alt = ("<DEL>" if svtype != "INS"
                   else (alt_pool[int(rng.integers(0, len(alt_pool)))]
                         if alt_pool else "A" * sl))
            cands.append(cand(sp + int(rng.integers(-40, 41)),
                              max(20, sl + int(rng.integers(-10, 11)))
                              * (-1 if svtype == "DEL" else 1),
                              svtype=svtype, alt=alt,
                              support=int(rng.integers(3, 40)),
                              sample=int(rng.integers(0, 64)), cid=cid))
            cid += 1
    rng.shuffle(cands)
    cands.sort(key=lambda c: c.pos)
    flushes = []
    k = 0
    while k < len(cands):
        step = int(rng.integers(5, 25))
        batch = cands[k:k + step]
        flushes.append((batch, batch[-1].pos // 100 * 100, 100 * len(batch)))
        k += step
    return flushes


def test_fuzz_matches_host_del():
    for seed in range(20):
        rng = np.random.default_rng(3000 + seed)
        config = make_config()
        flushes = random_flushes(rng)
        dev, counters = run_device_task("DEL", flushes, config)
        host = run_host_task("DEL", flushes, config)
        assert groups_shape(dev) == groups_shape(host), seed
        assert counters.get("combine_greedy_dispatches") == 1


def test_fuzz_matches_host_ins_identity_gate():
    rng0 = np.random.default_rng(99)
    shared = "".join(rng0.choice(list("ACGT"), size=300))
    near = shared[:290] + "ACGTACGTAC"          # ~3% divergent: passes 0.7
    far = "".join(rng0.choice(list("ACGT"), size=300))  # fails the gate
    for seed in range(12):
        rng = np.random.default_rng(4000 + seed)
        config = make_config()
        flushes = random_flushes(rng, svtype="INS", per_site=(4, 16),
                                 alt_pool=[shared, near, far])
        dev, counters = run_device_task("INS", flushes, config)
        host = run_host_task("INS", flushes, config)
        assert groups_shape(dev) == groups_shape(host), seed


def test_many_distinct_alts_flags_segment_to_host():
    """>TASK_ED_HEADS distinct mutually-failing alts in one segment:
    later groups' heads are not tabulated, the kernel raises ed_miss for
    the segment, and the host replay reproduces the exact grouping."""
    rng = np.random.default_rng(5)
    config = make_config()
    alts = ["".join(rng.choice(list("ACGT"), size=200)) for _ in range(12)]
    cands = [cand(1000 + i, 200, svtype="INS", alt=alts[i % 12],
                  support=40 - i, cid=i) for i in range(24)]
    flushes = [(cands, 1000, 2400)]
    dev, counters = run_device_task("INS", flushes, config)
    host = run_host_task("INS", flushes, config)
    assert groups_shape(dev) == groups_shape(host)
    assert counters.get("combine_greedy_flagged_segments", 0) >= 1


def test_oversized_segment_prefiltered_to_host():
    from sniffles_tpu.ops._greedy_consts import SEG_LMAX
    config = make_config()
    cands = [cand(5000 + (i % 7), -300, support=5, cid=i)
             for i in range(SEG_LMAX + 10)]
    other = [cand(90_000 + i, -200, support=5, cid=10_000 + i)
             for i in range(6)]
    flushes = [(cands, 5000, 100), (other, 90_000, 600)]
    dev, counters = run_device_task("DEL", flushes, config)
    host = run_host_task("DEL", flushes, config)
    assert groups_shape(dev) == groups_shape(host)
    assert counters.get("combine_greedy_host_segments", 0) >= 1


def test_nonuniform_non_ins_alts_stay_exact():
    """DEL candidates with DIFFERING alt strings in one segment: the
    host's identity gate computes a real edit distance there; the
    kernel has no table for non-INS types, flags the segment, and the
    host replay keeps it exact."""
    config = make_config(dev_combine_greedy_min=1)
    a = "T" * 180
    b = "G" * 180          # 100% divergent: the 0.7 gate REJECTS merge
    cands = [cand(2000, -180, alt=a, support=30, cid=0),
             cand(2004, -180, alt=b, support=20, cid=1),
             cand(2008, -180, alt=a, support=10, cid=2)]
    flushes = [(cands, 2000, 300)]
    dev, counters = run_device_task("DEL", flushes, config)
    host = run_host_task("DEL", flushes, config)
    assert groups_shape(dev) == groups_shape(host)
    assert len(dev) == 2  # the divergent alt really did split


def test_group_size_overflow_flags_to_host():
    from sniffles_tpu.ops._greedy_consts import NMAX
    config = make_config()
    n = NMAX + 40
    cands = [cand(3000 + (i % 3), -250, support=5, sample=i % 250, cid=i)
             for i in range(n)]
    flushes = [(cands, 3000, 100)]
    dev, counters = run_device_task("DEL", flushes, config)
    host = run_host_task("DEL", flushes, config)
    assert groups_shape(dev) == groups_shape(host)
    assert counters.get("combine_greedy_flagged_segments", 0) >= 1


def test_binsize_nondefault_and_small_cmm():
    for cm, cmm in ((250, 1000), (100, 400), (50, 120)):
        rng = np.random.default_rng(cm + cmm)
        config = make_config(combine_match=cm, combine_match_max=cmm)
        flushes = random_flushes(rng, n_sites=5)
        dev, _ = run_device_task("DEL", flushes, config)
        host = run_host_task("DEL", flushes, config)
        assert groups_shape(dev) == groups_shape(host), (cm, cmm)
