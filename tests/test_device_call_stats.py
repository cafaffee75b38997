"""The fused --tpu-call step (ops/clustering.call_task_packed +
parallel/device_call.device_clusters): device-computed per-cluster
statistics must be host-exact for single-fragment clusters and the
production call path must consume them without changing output
(reference: sv.py:497-598 call_from)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sniffles_tpu import cluster as cl  # noqa: E402
from sniffles_tpu import svcall as sv  # noqa: E402
from sniffles_tpu import util  # noqa: E402
from sniffles_tpu.config import SnifflesConfig  # noqa: E402
from sniffles_tpu.leads import Lead, LeadProvider  # noqa: E402
from sniffles_tpu.ops.clustering import SVTYPE_NAMES  # noqa: E402
from sniffles_tpu.parallel.device_call import device_clusters  # noqa: E402


def _provider(config, rng, n_sites, frag_reads=0):
    """Random separated clusters; frag_reads reads contribute TWO leads
    to their cluster (merge_inner targets -> engine stats must be
    withheld there)."""
    provider = LeadProvider(config, 0, "chr1")
    binsize = config.cluster_binsize
    read_no = [0]

    def add(svtype, pos, svlen, qname=None):
        if qname is None:
            qname = f"r{read_no[0]}"
            read_no[0] += 1
        ld = Lead(read_id=read_no[0], read_qname=qname, contig="chr1",
                  ref_start=pos, ref_end=pos, qry_start=0, qry_end=0,
                  strand="+" if rng.random() < 0.7 else "-",
                  mapq=int(rng.integers(20, 60)), nm=0.0, source="INLINE",
                  svtype=svtype, svlen=svlen)
        provider.record_lead(ld, pos // binsize * binsize)
        return qname

    centers = 20_000 + np.arange(n_sites) * 9_000
    for i, c in enumerate(centers):
        svtype = ("INS", "DEL", "DUP", "INV")[i % 4]
        base_len = int(rng.integers(60, 900)) * (-1 if svtype == "DEL" else 1)
        for _ in range(int(rng.integers(4, 9))):
            add(svtype, int(c + rng.integers(-12, 13)),
                base_len + int(rng.integers(-3, 4)))
        if i < frag_reads and svtype in ("INS", "DEL"):
            # one read with two nearby fragments in this cluster
            q = add(svtype, int(c), base_len)
            add(svtype, int(c + 5), base_len // 2, qname=q)
    provider.start = 0
    provider.end = 1_000_000
    return provider


@pytest.fixture
def config():
    cfg = SnifflesConfig("--input", "x.bam", "--vcf", "y.vcf")
    cfg.tpu_call = True
    return cfg


def test_engine_stats_match_host_exact(config):
    rng = np.random.default_rng(21)
    provider = _provider(config, rng, n_sites=24, frag_reads=6)
    clusters = list(device_clusters(provider, config, None))
    assert clusters

    n_with_engine = 0
    for cluster in clusters:
        eng = getattr(cluster, "engine", None)
        if eng is None:
            continue
        n_with_engine += 1
        leads = cluster.leads
        assert eng["svlen_center"] == util.center(ld.svlen for ld in leads)
        assert eng["raw_pos_center"] == util.center(ld.ref_start for ld in leads)
        assert eng["support"] == len({ld.read_qname for ld in leads})
        assert eng["lead_count"] == len(leads)
        assert eng["fwd"] == sum(ld.strand == "+" for ld in leads)
        assert eng["rev"] == len(leads) - eng["fwd"]
        assert eng["qual"] == int(util.mean(ld.mapq for ld in leads))
    # most clusters are single-fragment -> engine stats attached
    assert n_with_engine >= len(clusters) // 2


def test_engine_stats_withheld_for_fragmented_reads(config):
    """Clusters where a read contributes >1 lead (merge_inner changes the
    lead multiset) must NOT carry engine stats."""
    rng = np.random.default_rng(22)
    provider = _provider(config, rng, n_sites=8, frag_reads=8)
    for cluster in device_clusters(provider, config, None):
        leads_by_read = {}
        for ld in cluster.leads:
            leads_by_read[ld.read_qname] = leads_by_read.get(ld.read_qname, 0) + 1
        # NB: device_clusters runs merge_inner AFTER attaching engine
        # stats, so fragmented reads appear merged here; detect them via
        # the attach condition instead: engine implies pre-merge
        # single-fragmentness, which implies the merge changed nothing
        if getattr(cluster, "engine", None) is not None:
            eng = cluster.engine
            assert eng["lead_count"] == len(cluster.leads)
            assert eng["support"] == len({ld.read_qname for ld in cluster.leads})


def test_call_from_consumes_engine_stats(config):
    """call_from output with engine stats == without (centers, qual,
    strands all identical), on the same clusters."""
    rng = np.random.default_rng(23)
    provider = _provider(config, rng, n_sites=16, frag_reads=4)

    class T:
        sv_id = 0
        id = 0

    with_eng, without_eng = [], []
    for cluster in device_clusters(provider, config, None):
        for svc in sv.call_from(cluster, config, True, T()):
            with_eng.append((svc.svtype, svc.pos, svc.svlen, svc.end, svc.qual,
                             svc.support, svc.fwd, svc.rev))
        if hasattr(cluster, "engine"):
            del cluster.engine
        for svc in sv.call_from(cluster, config, True, T()):
            without_eng.append((svc.svtype, svc.pos, svc.svlen, svc.end, svc.qual,
                                svc.support, svc.fwd, svc.rev))
    assert with_eng and with_eng == without_eng


def test_fused_multi_task_dispatch_matches_single(config):
    """The device service fuses same-shape call_task requests into one
    vmapped dispatch; each slice must equal the single-task kernel."""
    from sniffles_tpu.ops.clustering import call_task_packed, batched_call_task
    from sniffles_tpu.parallel.device_call import (compress_call_response,
                                                   pack_task_batch, pad_packed)
    from sniffles_tpu.parallel.device_service import (DeviceServer,
                                                      DeviceRequest)

    rng = np.random.default_rng(33)
    packs = []
    for s in range(3):
        provider = _provider(config, rng, n_sites=10, frag_reads=2)
        packs.append(pack_task_batch(provider, config, None))
    singles = []
    for pk in packs:
        padded = pad_packed(pk[0])
        flat = np.asarray(call_task_packed(jnp.asarray(padded), **pk[1]))
        singles.append(compress_call_response(flat, padded.shape[1]))

    server = DeviceServer()
    got = {}
    batch = [(DeviceRequest(kind="call_task", payload=p[0], meta=p[1],
                            req_id=i), None) for i, p in enumerate(packs)]
    batch = [(req, (lambda i: (lambda resp: got.__setitem__(i, resp)))(i))
             for i, (req, _) in enumerate(batch)]
    finish = server._start_fused(batch)
    assert finish is not None
    finish()

    assert sorted(got) == [0, 1, 2]
    for i in range(3):
        assert got[i].error is None
        assert got[i].payload["nc"] == singles[i]["nc"]
        assert got[i].payload["slots"] == singles[i]["slots"]
        np.testing.assert_array_equal(got[i].payload["elems"],
                                      singles[i]["elems"])
        np.testing.assert_array_equal(got[i].payload["stats"],
                                      singles[i]["stats"])


def test_fold_matches_host_merge_inner(config):
    """The device merge_inner fold (ops/clustering.merge_inner_fold):
    clusters with genuinely fragmented reads must consume device stats
    (fb_multi_fragment == 0) with values equal to the host's post-merge
    computations, across the fold's decision surface: same-strand near
    fragments (merge), far-in-query fragments (no merge), strand-flip
    fragments (no merge), and tandem-repeat clusters (threshold -1,
    unconditional merge)."""
    provider = LeadProvider(config, 0, "chr1")
    binsize = config.cluster_binsize
    no = [0]

    def add(pos, svlen, qname, strand="+", svtype="DEL", qs=0, qe=0):
        ld = Lead(read_id=no[0], read_qname=qname, contig="chr1",
                  ref_start=pos, ref_end=pos, qry_start=qs, qry_end=qe,
                  strand=strand, mapq=40, nm=0.0, source="INLINE",
                  svtype=svtype, svlen=svlen)
        provider.record_lead(ld, pos // binsize * binsize)
        no[0] += 1

    # A: near same-strand DEL fragments -> host merges (-120 + -60)
    for k in range(4):
        add(20_000 + k, -200, f"a{k}")
    add(20_002, -120, "afrag")
    add(20_040, -60, "afrag")
    # B: fragments far apart in QUERY -> no merge (near fails)
    for k in range(4):
        add(40_000 + k, -300, f"b{k}")
    add(40_002, -290, "bfrag", qs=0, qe=0)
    add(40_030, -285, "bfrag", qs=500, qe=510)
    # C: strand flip between fragments -> no merge
    for k in range(4):
        add(60_000 + k, -250, f"c{k}")
    add(60_002, -245, "cfrag", strand="+")
    add(60_030, -240, "cfrag", strand="-")
    # D: INS fragments, near -> merge (110 + 100)
    for k in range(4):
        add(80_000 + k, 200, f"d{k}", svtype="INS")
    add(80_001, 110, "dfrag", svtype="INS")
    add(80_030, 100, "dfrag", svtype="INS")
    # E: tandem-repeat cluster -> threshold -1 merges even far/flip
    for k in range(4):
        add(100_000 + k, -400, f"e{k}")
    add(100_002, -250, "efrag", strand="+", qs=0)
    add(100_060, -150, "efrag", strand="-", qs=900)
    provider.start = 0
    provider.end = 1_000_000
    tr = [(99_000, 101_000)]

    counters = {}
    clusters = list(device_clusters(provider, config, tr, counters=counters))
    assert counters.get("fb_multi_fragment", 0) == 0
    assert counters.get("engine_consumed", 0) == len(clusters) == 5

    merged_svlens = {}
    for cluster in clusters:
        eng = cluster.engine
        leads = cluster.leads
        assert eng["lead_count"] == len(leads)
        assert eng["svlen_center"] == util.center(ld.svlen for ld in leads)
        assert eng["raw_pos_center"] == util.center(ld.ref_start for ld in leads)
        assert eng["support"] == len({ld.read_qname for ld in leads})
        assert eng["fwd"] == sum(ld.strand == "+" for ld in leads)
        assert eng["qual"] == int(util.mean(ld.mapq for ld in leads))
        for ld in leads:
            if ld.read_qname.endswith("frag"):
                merged_svlens.setdefault(ld.read_qname, []).append(ld.svlen)

    # the host merges actually happened where expected (and only there)
    assert merged_svlens["afrag"] == [-180]        # merged
    assert sorted(merged_svlens["bfrag"]) == [-290, -285]  # query-far: kept apart
    assert sorted(merged_svlens["cfrag"]) == [-245, -240]  # strand flip: kept apart
    assert merged_svlens["dfrag"] == [210]         # merged
    assert merged_svlens["efrag"] == [-400]        # repeat: unconditional merge


def test_rebuild_groups_matches_dict_loop():
    """The vectorized group rebuild must reproduce the per-element dict
    loop it replaced exactly: ascending cluster id, element order
    preserved within a cluster; and the child-stats unpack must bucket
    child columns by parent in ascending child order."""
    from sniffles_tpu.parallel.device_call import (_children_by_parent,
                                                  _rebuild_groups)

    rng = np.random.default_rng(5)
    for trial in range(25):
        n = int(rng.integers(1, 400))
        k = int(rng.integers(1, 40))
        cids = rng.integers(0, k, n).astype(np.int64)
        ridx = rng.permutation(n).astype(np.int64)

        got = _rebuild_groups(cids, ridx)

        groups = {}
        for cid, li in zip(cids.tolist(), ridx.tolist()):
            groups.setdefault(cid, []).append(li)
        want = [(cid, groups[cid]) for cid in sorted(groups)]
        assert got == want, trial
    assert _rebuild_groups(np.array([], dtype=np.int64),
                           np.array([], dtype=np.int64)) == []

    # child stats: columns in ascending child-id order, keyed by parent
    stats = np.zeros((21, 8), dtype=np.int64)
    stats[:18] = np.arange(18)[:, None] * 100 + np.arange(8)[None, :]
    stats[18] = [0, 0, 1, 2, 2, 2, 5, 5]       # parent per child
    stats[19] = [0, 0, 0, 1, 1, 1, 0, 0]       # parent-2 children uncertain
    by_parent = _children_by_parent(stats, 8)
    assert sorted(by_parent) == [0, 1, 2, 5]
    assert [len(v) for _, v in sorted(by_parent.items())] == [2, 1, 3, 2]
    # first child of parent 0 carries column 0, in row order
    st0, unc0 = by_parent[0][0]
    assert st0 == tuple(np.arange(18) * 100) and unc0 is False
    assert all(unc for _, unc in by_parent[2])
    assert not any(unc for _, unc in by_parent[5])


def test_qname_hash_deterministic():
    """Read-id hashes must be salt-free (stable across processes and
    PYTHONHASHSEED) and never hit the INT32_MAX invalid sentinel."""
    import zlib

    from sniffles_tpu.parallel.device_call import qname_hash31

    names = [f"read/{i}/ccs" for i in range(200)] + ["", "x" * 300]
    got = qname_hash31(names)
    want = [min(zlib.crc32(n.encode()) & 0x7FFFFFFF, 0x7FFFFFFE) for n in names]
    assert got.tolist() == want
    assert got.dtype == np.int32
    assert int(got.max()) < 2 ** 31 - 1
    # stable on re-evaluation (and across interpreter salts by design)
    assert qname_hash31(names).tolist() == want


def test_support_collision_falls_back_to_host(config, monkeypatch):
    """A forced read-name hash collision must trip the support gate: the
    device undercounts unique reads, so engine stats are withheld and the
    host statistics path takes over (output unchanged by construction)."""
    from sniffles_tpu.parallel import device_call

    rng = np.random.default_rng(31)
    # DUP clusters: not merge_inner-foldable, so a collision leaves the
    # fold verification intact and ONLY the support count diverges
    provider = LeadProvider(config, 0, "chr1")
    binsize = config.cluster_binsize
    for site in range(6):
        c = 20_000 + site * 9_000
        for r in range(5):
            ld = Lead(read_id=r, read_qname=f"dup{site}_{r}", contig="chr1",
                      ref_start=int(c + rng.integers(-10, 11)), ref_end=0,
                      qry_start=0, qry_end=0, strand="+",
                      mapq=40, nm=0.0, source="SPLIT",
                      svtype="DUP", svlen=600)
            provider.record_lead(ld, ld.ref_start // binsize * binsize)
    provider.start = 0
    provider.end = 1_000_000

    counters = {}
    baseline = [(c.svtype, sorted(ld.read_qname for ld in c.leads),
                 getattr(c, "engine", None) is not None)
                for c in device_clusters(provider, config, None,
                                         counters=counters)]
    assert any(has_eng for *_, has_eng in baseline)
    assert counters.get("fb_support_collision", 0) == 0

    monkeypatch.setattr(
        device_call, "qname_hash31",
        lambda names: np.full(len(names), 7, dtype=np.int32))
    counters2 = {}
    collided = [(c.svtype, sorted(ld.read_qname for ld in c.leads),
                 getattr(c, "engine", None) is not None)
                for c in device_clusters(provider, config, None,
                                         counters=counters2)]
    assert counters2.get("fb_support_collision", 0) >= 1
    # same clusters, but no engine stats consumed anywhere
    assert [b[:2] for b in baseline] == [c[:2] for c in collided]
    assert not any(has_eng for *_, has_eng in collided)
