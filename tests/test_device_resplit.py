"""Device svlen-histogram resplit (ops/clustering.resplit_child_ids +
per-child stats in call_task_packed): multi-child clusters must consume
device statistics (fb_resplit == 0) with values host-exact per child
(reference: cluster.py:125-161 resplit, sv.py:497-598 call_from).

The host sweep's ``i = max(0, i-2) + 1`` backtracking is provably
redundant for resplit (merges always keep the higher bin's key), so the
device's adjacent-occupied-bin predicate is the exact partition; these
tests pin that equivalence on adversarial bin layouts.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from sniffles_tpu import svcall as sv  # noqa: E402
from sniffles_tpu import util  # noqa: E402
from sniffles_tpu.config import SnifflesConfig  # noqa: E402
from sniffles_tpu.leads import Lead, LeadProvider  # noqa: E402
from sniffles_tpu.parallel.device_call import device_clusters  # noqa: E402


@pytest.fixture
def config():
    cfg = SnifflesConfig("--input", "x.bam", "--vcf", "y.vcf")
    cfg.tpu_call = True
    return cfg


def _provider_with_resplit(config, rng, n_sites, lens_per_site=2,
                           frag_sites=0):
    """Each site holds one positional cluster whose leads carry SEVERAL
    well-separated svlen modes -> the svlen-histogram resplit must split
    it into one child per mode. frag_sites additionally plant a read
    with two fragments (merge_inner fold inside a resplit parent)."""
    provider = LeadProvider(config, 0, "chr1")
    binsize = config.cluster_binsize
    read_no = [0]

    def add(svtype, pos, svlen, qname=None):
        if qname is None:
            qname = f"r{read_no[0]}"
            read_no[0] += 1
        ld = Lead(read_id=read_no[0], read_qname=qname, contig="chr1",
                  ref_start=pos, ref_end=pos + max(-svlen, 0),
                  qry_start=100, qry_end=100 + max(svlen, 0),
                  strand="+" if rng.random() < 0.7 else "-",
                  mapq=int(rng.integers(20, 60)), nm=0.0, source="INLINE",
                  svtype=svtype, svlen=svlen)
        provider.record_lead(ld, pos // binsize * binsize)
        return qname

    for i in range(n_sites):
        c = 20_000 + i * 9_000
        svtype = ("INS", "DEL", "DUP", "INV")[i % 4]
        sign = -1 if svtype == "DEL" else 1
        modes = [int(v) for v in
                 rng.choice([80, 300, 900, 2500], size=lens_per_site,
                            replace=False)]
        for mode in modes:
            for _ in range(int(rng.integers(4, 8))):
                add(svtype, int(c + rng.integers(-12, 13)),
                    sign * (mode + int(rng.integers(-4, 5))))
        if i < frag_sites and svtype in ("INS", "DEL"):
            q = add(svtype, int(c), sign * modes[0])
            add(svtype, int(c + 5), sign * (modes[0] // 2), qname=q)
    provider.start = 0
    provider.end = 1_000_000
    return provider


def test_multi_child_clusters_consume_device_stats(config):
    rng = np.random.default_rng(41)
    provider = _provider_with_resplit(config, rng, n_sites=16,
                                      lens_per_site=3, frag_sites=4)
    counters = {}
    children = list(device_clusters(provider, config, None, counters=counters))
    assert counters["clusters_total"] == 16
    # every parent resplit into several children...
    assert counters["children_total"] >= 2 * counters["clusters_total"]
    # ...and ALL children consumed device stats: no resplit fallback left
    assert counters.get("fb_resplit", 0) == 0
    assert counters.get("fb_multi_fragment", 0) == 0
    assert counters.get("fb_support_collision", 0) == 0
    assert counters["engine_consumed"] == counters["children_total"]

    # per-child engine values are host-exact
    for child in children:
        eng = getattr(child, "engine", None)
        assert eng is not None
        leads = child.leads
        assert eng["svlen_center"] == util.center(ld.svlen for ld in leads)
        assert eng["raw_pos_center"] == util.center(ld.ref_start for ld in leads)
        assert eng["support"] == len({ld.read_qname for ld in leads})
        assert eng["lead_count"] == len(leads)
        assert eng["fwd"] == sum(ld.strand == "+" for ld in leads)
        assert eng["rev"] == len(leads) - eng["fwd"]
        assert eng["qual"] == int(util.mean(ld.mapq for ld in leads))


def test_resplit_calls_identical_with_and_without_engine(config):
    """call_from over device children with engine == without (the full
    downstream contract, per child)."""
    rng = np.random.default_rng(42)
    provider = _provider_with_resplit(config, rng, n_sites=12,
                                      lens_per_site=2, frag_sites=3)

    class T:
        sv_id = 0
        id = 0

    with_eng, without_eng = [], []
    for child in device_clusters(provider, config, None):
        for svc in sv.call_from(child, config, True, T()):
            with_eng.append((svc.svtype, svc.pos, svc.svlen, svc.end, svc.qual,
                             svc.support, svc.fwd, svc.rev))
        if hasattr(child, "engine"):
            del child.engine
        for svc in sv.call_from(child, config, True, T()):
            without_eng.append((svc.svtype, svc.pos, svc.svlen, svc.end,
                                svc.qual, svc.support, svc.fwd, svc.rev))
    assert with_eng and with_eng == without_eng


def test_resplit_fuzz_partition_matches_host(config):
    """Randomized svlen layouts (chained bins, near-threshold gaps,
    repeats): the device child partition must equal the host resplit's
    on every seed, and consumption must be total whenever no ambiguity
    flag fires."""
    for seed in range(25):
        rng = np.random.default_rng(1000 + seed)
        provider = LeadProvider(config, 0, "chr1")
        binsize = config.cluster_binsize
        rno = [0]

        def add(svtype, pos, svlen):
            rno[0] += 1
            ld = Lead(read_id=rno[0], read_qname=f"s{seed}r{rno[0]}",
                      contig="chr1", ref_start=pos, ref_end=pos,
                      qry_start=0, qry_end=0, strand="+", mapq=40, nm=0.0,
                      source="INLINE", svtype=svtype, svlen=svlen)
            provider.record_lead(ld, pos // binsize * binsize)

        for i in range(8):
            c = 20_000 + i * 9_000
            svtype = ("INS", "DEL")[i % 2]
            sign = -1 if svtype == "DEL" else 1
            # chained bins: random walk of svlen values whose adjacent
            # gaps straddle the merge threshold from both sides
            v = int(rng.integers(60, 200))
            for _ in range(int(rng.integers(6, 16))):
                add(svtype, int(c + rng.integers(-10, 11)), sign * v)
                step = int(rng.choice([0, 10, 25, 45, 60, 150, 400]))
                v += step
        provider.start = 0
        provider.end = 1_000_000

        counters = {}
        dev_children = [
            (c.svtype, c.id, tuple(sorted(ld.read_qname for ld in c.leads)))
            for c in device_clusters(provider, config, None,
                                     counters=counters)]
        # host path over the same leads
        from sniffles_tpu import cluster as cl
        host_children = []
        for svtype in ("INS", "DEL"):
            for c in cl.resolve(svtype, provider, config, None):
                host_children.append(
                    (c.svtype, tuple(sorted(ld.read_qname for ld in c.leads))))
        assert sorted((t, m) for t, _, m in dev_children) \
            == sorted(host_children), f"seed {seed}"
        assert counters.get("fb_resplit", 0) == 0, (seed, counters)
        assert counters["engine_consumed"] == counters["children_total"], \
            (seed, counters)


def test_resplit_threshold_tie_stays_host_exact(config):
    """gap == lo*cluster_merge_len exactly (a float32-ambiguous pair):
    output must equal the host path regardless of whether the kernel's
    ambiguity flag forces the host fallback or the f32 decision happens
    to agree."""
    provider = LeadProvider(config, 0, "chr1")
    binsize = config.cluster_binsize
    for i, svlen in enumerate([1000] * 5 + [1220] * 5):
        # bins 1000 and 1220: gap 220 vs threshold 1000*0.22 = 220.0...
        ld = Lead(read_id=i, read_qname=f"t{i}", contig="chr1",
                  ref_start=30_000 + i, ref_end=0, qry_start=0, qry_end=0,
                  strand="+", mapq=40, nm=0.0, source="INLINE",
                  svtype="INS", svlen=svlen)
        provider.record_lead(ld, ld.ref_start // binsize * binsize)
    provider.start = 0
    provider.end = 1_000_000

    dev = [(c.svtype, tuple(sorted(ld.read_qname for ld in c.leads)))
           for c in device_clusters(provider, config, None)]
    from sniffles_tpu import cluster as cl
    host = [(c.svtype, tuple(sorted(ld.read_qname for ld in c.leads)))
            for c in cl.resolve("INS", provider, config, None)]
    assert sorted(dev) == sorted(host)
