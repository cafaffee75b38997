"""Function-level differential tests against the REAL reference modules.

The reference package at /root/reference/src imports cleanly with the
tools/refshim pysam/edlib/spoa facades, so the actual reference
implementations of the calling semantics (robust statistics, split
classification, cluster resolution, QC cascade, genotyper) run here
IN-PROCESS next to ours. These tests drive both with identical randomized
inputs — thousands of cases, far denser than any e2e dataset reaches —
and require identical outputs.

The reference classes and ours are distinct types (sniffles.* vs
sniffles_tpu.*); each side gets its own object graph built from the same
random spec.
"""
import os
import random
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"
if REPO not in sys.path:
    sys.path.insert(0, REPO)
# NOTE: REF_SRC/refshim must NOT be put on sys.path at module level:
# pytest imports this file at collection time, and with the real
# reference package importable, pickling of our data-model classes
# (whose __module__ is aliased to "sniffles.*" for SNF interop,
# compat.py) resolves to the reference classes in OTHER test modules.
# The R fixture adds and removes the paths around this module's tests.

pytestmark = pytest.mark.skipif(not os.path.exists(REF_SRC),
                                reason="reference checkout not available")

import sniffles_tpu.util as our_util            # noqa: E402
import sniffles_tpu.cluster as our_cluster      # noqa: E402
import sniffles_tpu.svcall as our_sv            # noqa: E402
import sniffles_tpu.postprocess as our_pp       # noqa: E402
from sniffles_tpu.config import SnifflesConfig as OurConfig    # noqa: E402
from sniffles_tpu.leads import Lead as OurLead                 # noqa: E402

BASE_ARGS = ("--input", "input.bam", "--vcf", "out.vcf")


@pytest.fixture(scope="module")
def R():
    """Import the REAL reference package for the duration of this module
    only, then purge it. Our data-model classes carry
    __module__ == "sniffles.sv" for SNF pickle interop (compat.py), so
    while the genuine package is importable, pickling OUR objects
    in-process resolves to the reference classes and fails — other test
    modules must not see it (it must not be imported at collection time
    either, which is why this is a fixture, not module-level imports)."""
    import types
    paths = [os.path.join(REPO, "tools", "refshim"), REF_SRC]
    for p in paths:
        if p not in sys.path:
            sys.path.insert(0, p)
    saved = {m: sys.modules[m] for m in list(sys.modules)
             if m == "sniffles" or m.startswith("sniffles.")}
    for m in saved:
        del sys.modules[m]
    try:
        import sniffles.util as ref_util
        import sniffles.cluster as ref_cluster
        import sniffles.sv as ref_sv
        import sniffles.postprocessing as ref_pp
        from sniffles.config import SnifflesConfig as RefConfig
        from sniffles.leadprov import Lead as RefLead
        yield types.SimpleNamespace(
            util=ref_util, cluster=ref_cluster, sv=ref_sv, pp=ref_pp,
            Config=RefConfig, Lead=RefLead)
    finally:
        for m in [m for m in sys.modules
                  if m == "sniffles" or m.startswith("sniffles.")]:
            del sys.modules[m]
        sys.modules.update(saved)
        for p in paths:
            if p in sys.path:
                sys.path.remove(p)


@pytest.fixture(scope="module")
def configs(R):
    return R.Config(*BASE_ARGS), OurConfig(*BASE_ARGS)


@pytest.fixture(scope="module")
def mosaic_configs(R):
    args = BASE_ARGS + ("--mosaic",)
    return R.Config(*args), OurConfig(*args)


# ---------------------------------------------------------------- util


def test_robust_statistics_match(R):
    rnd = random.Random(1)
    for case in range(600):
        n = rnd.randint(1, 40)
        # duplicate-heavy ranges stress the mode filtering
        span = rnd.choice([3, 10, 1000])
        nums = [rnd.randint(0, span) for _ in range(n)]
        for fname in ("median_modes", "median_noavg", "median_or_mode",
                      "trim", "most_common", "most_common_top", "median"):
            r = getattr(R.util, fname)(list(nums))
            o = getattr(our_util, fname)(list(nums))
            assert r == o, (fname, nums)
        assert R.util.stdev(nums) == pytest.approx(our_util.stdev(nums))
        assert R.util.mean(nums) == pytest.approx(our_util.mean(nums))


# ------------------------------------------------- split classification


def _random_chain(rnd):
    """Random split-alignment chain spec for one read."""
    n = rnd.randint(2, 5)
    contigs = ["chr1"] * n
    if rnd.random() < 0.3:  # inter-contig splits
        for i in range(1, n):
            if rnd.random() < 0.4:
                contigs[i] = "chr9"
    specs = []
    qpos = rnd.randint(0, 3000)
    for i in range(n):
        qlen = rnd.randint(200, 4000)
        ref_start = rnd.randint(0, 500_000)
        specs.append(dict(
            contig=contigs[i],
            ref_start=ref_start,
            ref_end=ref_start + qlen + rnd.randint(-150, 150),
            qry_start=qpos,
            qry_end=qpos + qlen,
            strand=rnd.choice("+-"),
            mapq=rnd.randint(20, 60),
        ))
        qpos += qlen + rnd.randint(-300, 2500)
    rnd.shuffle(specs)
    return specs


def _leads_from_specs(cls, specs):
    return [cls(read_id=7, read_qname="r7", contig=s["contig"],
                ref_start=s["ref_start"], ref_end=s["ref_end"],
                qry_start=s["qry_start"], qry_end=s["qry_end"],
                strand=s["strand"], mapq=s["mapq"], nm=0.0,
                source="SPLIT_SUP", svtype="", svlen=None, seq=None,
                read_len=20_000)
            for s in specs]


class _ReadStub:
    query_name = "r7"
    query_sequence = "ACGT" * 20_000  # sliced for INS seq caching


def test_classify_splits_match(R, configs):
    ref_cfg, our_cfg = configs
    rnd = random.Random(2)
    for case in range(800):
        specs = _random_chain(rnd)
        ref_leads = _leads_from_specs(R.Lead, specs)
        our_leads = _leads_from_specs(OurLead, specs)
        R.sv.classify_splits(_ReadStub(), ref_leads, ref_cfg, "chr1")
        our_sv.classify_splits(_ReadStub(), our_leads, our_cfg, "chr1")
        ref_out = [ld.svtypes_starts_lens for ld in ref_leads]
        our_out = [ld.svtypes_starts_lens for ld in our_leads]
        assert ref_out == our_out, (case, specs)


# ------------------------------------------------------ cluster.resolve


class _Provider:
    def __init__(self, contig, start, leadtab, leadhapcount):
        self.contig = contig
        self.start = start
        self.leadtab = leadtab
        self.leadhapcount = leadhapcount


def _random_leadtab(rnd, cls, svtype, binsize):
    """Dense random leadtab for one svtype: clusters of leads in nearby
    bins, adversarial spacing for the adaptive merge sweep."""
    leadtab = {}
    hap = {}
    pos = rnd.randint(0, 2000)
    n_groups = rnd.randint(1, 8)
    rid = 0
    for g in range(n_groups):
        group_len = rnd.choice([60, 100, 400, 1200])
        n_leads = rnd.randint(1, 12)
        spread = rnd.choice([5, 40, 250])
        for _ in range(n_leads):
            p = pos + rnd.randint(0, spread)
            svlen = max(35, int(group_len * (1 + rnd.uniform(-0.3, 0.3))))
            seed = int(p / binsize) * binsize
            ld = cls(read_id=rid, read_qname=f"r{rid}", contig="chr1",
                     ref_start=p, ref_end=p + (svlen if svtype != "INS" else 0),
                     qry_start=100, qry_end=100 + svlen,
                     strand=rnd.choice("+-"), mapq=rnd.randint(20, 60),
                     nm=0.0, source="INLINE", svtype=svtype, svlen=svlen,
                     seq=None)
            leadtab.setdefault(seed, []).append(ld)
            entry = hap.setdefault(seed, [0, 0, 0])
            entry[rnd.randint(0, 2)] += 1
            rid += 1
        pos += rnd.choice([150, 400, 900, 3000])
    return leadtab, {k: tuple(v) for k, v in hap.items()}


def _cluster_shape(clusters):
    out = []
    for c in clusters:
        out.append((c.svtype, c.seed,
                    tuple(sorted((ld.read_qname, ld.ref_start, ld.svlen)
                                 for ld in c.leads))))
    return sorted(out)


@pytest.mark.parametrize("svtype", ["INS", "DEL", "DUP", "INV"])
def test_cluster_resolve_match(R, configs, svtype):
    ref_cfg, our_cfg = configs
    rnd = random.Random(hash(svtype) & 0xFFFF)
    binsize = ref_cfg.cluster_binsize
    for case in range(120):
        seed_state = rnd.getstate()
        leadtab_r, hap = _random_leadtab(rnd, R.Lead, svtype, binsize)
        rnd.setstate(seed_state)
        leadtab_o, hap_o = _random_leadtab(rnd, OurLead, svtype, binsize)
        assert hap == hap_o
        tr = None
        if rnd.random() < 0.4:
            tr = sorted((rnd.randint(0, 4000), rnd.randint(4000, 9000))
                        for _ in range(rnd.randint(1, 3)))
        prov_r = _Provider("chr1", 0, {svtype: leadtab_r},
                           {svtype: hap, "REF": {}})
        prov_o = _Provider("chr1", 0, {svtype: leadtab_o},
                           {svtype: hap, "REF": {}})
        ref_clusters = list(R.cluster.resolve(svtype, prov_r, ref_cfg, tr))
        our_clusters = list(our_cluster.resolve(svtype, prov_o, our_cfg, tr))
        assert _cluster_shape(ref_clusters) == _cluster_shape(our_clusters), \
            (svtype, case)


# ------------------------------------------------------- QC + genotyper


def _call_spec(rnd):
    svtype = rnd.choice(["INS", "DEL", "DUP", "INV"])
    svlen = rnd.choice([-1, 1]) * rnd.randint(35, 60_000) \
        if svtype == "DEL" else rnd.randint(35, 60_000)
    if svtype == "DEL":
        svlen = -abs(svlen)
    pos = rnd.randint(1000, 900_000)
    support = rnd.randint(0, 60)
    cov = [rnd.randint(0, 60) for _ in range(5)]
    return dict(
        svtype=svtype, svlen=svlen, pos=pos, end=pos + abs(svlen),
        support=support,
        coverage_upstream=cov[0], coverage_start=cov[1],
        coverage_center=cov[2], coverage_end=cov[3],
        coverage_downstream=cov[4],
        stdev_pos=rnd.uniform(0, 120), stdev_len=rnd.uniform(0, 120),
        qual=rnd.randint(0, 60), nm=rnd.uniform(0, 0.4),
        fwd=rnd.randint(0, 30), rev=rnd.randint(0, 30),
        support_inline=rnd.randint(0, 20), support_long=rnd.randint(0, 10),
        support_sa=rnd.randint(0, 10),
        cluster_seed=rnd.randint(0, 1 << 30),
    )


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _mk_cluster_stub(rnd_state, spec):
    """Attribute-level stand-in for the postprocess cluster (QC reads
    .leads[*].strand/qry_start/read_len/hap/phase_set/seq and .sa_counts;
    reference postprocessing.py:34,259,357,530-581,627)."""
    rnd = random.Random(rnd_state)
    leads = []
    for i in range(rnd.randint(2, 10)):
        leads.append(_NS(strand=rnd.choice("+-"),
                         qry_start=rnd.randint(0, 15_000),
                         read_len=rnd.randint(5_000, 30_000),
                         read_id=i, hap="0", phase_set=None,
                         seq=None))
    sa = rnd.randint(0, 6)
    return _NS(leads=leads, sa_counts=(sa, sa / float(len(leads))))


def _mk_call(mod, spec):
    info = {"STDEV_POS": spec["stdev_pos"], "STDEV_LEN": spec["stdev_len"],
            "SUPPORT_INLINE": spec["support_inline"],
            "SUPPORT_LONG": spec["support_long"],
            "SUPPORT_SA": spec["support_sa"]}
    call = mod.SVCall(
        contig="chr1", pos=spec["pos"], id="X.1", ref="N",
        alt=f"<{spec['svtype']}>", qual=spec["qual"], filter="PASS",
        info=dict(info), svtype=spec["svtype"], svlen=spec["svlen"],
        end=spec["end"], genotypes={}, precise=True,
        support=spec["support"], rnames=None, qc=True, nm=spec["nm"],
        postprocess=_NS(cluster=_mk_cluster_stub(spec["cluster_seed"], spec)))
    call.fwd = spec["fwd"]
    call.rev = spec["rev"]
    call.coverage_upstream = spec["coverage_upstream"]
    call.coverage_start = spec["coverage_start"]
    call.coverage_center = spec["coverage_center"]
    call.coverage_end = spec["coverage_end"]
    call.coverage_downstream = spec["coverage_downstream"]
    return call


def _qc_result(call):
    return (call.qc, call.filter, call.genotypes.get(0), call.qual,
            {k: v for k, v in sorted(call.info.items())})


@pytest.mark.parametrize("mode", ["germline", "mosaic"])
def test_qc_and_genotyper_match(R, configs, mosaic_configs, mode):
    ref_cfg, our_cfg = configs if mode == "germline" else mosaic_configs
    rnd = random.Random(4 if mode == "germline" else 5)
    avg_cov = 30.0
    for case in range(1000):
        spec = _call_spec(rnd)
        ref_call = _mk_call(R.sv, spec)
        our_call = _mk_call(our_sv, spec)

        r_qc = R.pp.qc_sv(ref_call, ref_cfg)
        o_qc = our_pp.qc_sv(our_call, our_cfg)
        assert r_qc == o_qc, (mode, case, spec)

        R.pp.genotype_sv(ref_call, ref_cfg)
        our_pp.genotype_sv(our_call, our_cfg)

        # per-task regional NM statistic: the reference mutates it onto the
        # shared config (leadprov.py:577-578); ours passes it explicitly
        nm_thr = rnd.uniform(0.05, 0.4)
        ref_cfg.qc_nm_threshold = nm_thr
        r_post = R.pp.qc_sv_post_annotate(ref_call, ref_cfg, avg_cov)
        o_post = our_pp.qc_sv_post_annotate(our_call, our_cfg, avg_cov,
                                            nm_threshold=nm_thr)
        assert r_post == o_post, (mode, case, spec)
        assert _qc_result(ref_call) == _qc_result(our_call), (mode, case, spec)
