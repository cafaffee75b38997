"""Vectorized genotyping vs the exact host Genotyper over a parameter grid."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sniffles_tpu.genotype import GENOTYPER_BY_TYPE, Genotyper  # noqa: E402
from sniffles_tpu.svcall import SVCall  # noqa: E402
from sniffles_tpu.ops.genotype_batch import genotype_batch  # noqa: E402
from sniffles_tpu.ops.clustering import SVTYPE_CODES, SVTYPE_NAMES  # noqa: E402


class Cfg:
    genotype_error = 0.05
    genotype_ploidy = 2
    genotype_min_z_score = 5
    mosaic = False
    pass_only = False
    long_ins_length = 2500
    long_ins_rescale_base = 1.66
    long_ins_rescale_mult = 0.33
    detect_large_ins = True
    dev_min_dup_vaf = 1 / 6.0


def host_genotype(svtype, svlen, support, cov):
    call = SVCall(contig='c', pos=1000, id='x', ref='N', alt='<X>', qual=30, filter='PASS',
                  info={}, svtype=svtype, svlen=svlen, end=1000 + abs(svlen), genotypes={},
                  precise=True, support=support, rnames=None, qc=True, nm=-1,
                  postprocess=None, fwd=1, rev=1,
                  coverage_upstream=cov, coverage_start=cov, coverage_center=cov,
                  coverage_end=cov, coverage_downstream=cov)
    GENOTYPER_BY_TYPE.get(svtype, Genotyper)(call, Cfg(), (None, None)).calculate()
    return call


@pytest.mark.parametrize("svtype", ["INS", "DEL", "DUP", "INV"])
def test_genotype_batch_matches_host(svtype):
    cases = [(s, c) for s in (1, 3, 5, 10, 20, 35, 60, 200, 300)
             for c in (5, 10, 30, 60, 250, 400)]
    svlen = 120 if svtype != "DEL" else -120

    n = len(cases)
    supports = jnp.asarray([s for s, c in cases], dtype=jnp.int32)
    covs = jnp.asarray([c for s, c in cases], dtype=jnp.float32)
    params = {
        "genotype_error": 0.05, "ploidy": 2.0, "normalization_target": 250.0,
        "long_ins_length": 2500.0, "rescale_base": 1.66, "rescale_mult": 0.33,
    }
    out = genotype_batch(
        jnp.full(n, SVTYPE_CODES[svtype], dtype=jnp.int32),
        jnp.full(n, svlen, dtype=jnp.int32),
        supports,
        covs, covs, covs, covs, covs,
        support_sa=jnp.zeros(n, dtype=jnp.int32),
        params=params)

    for i, (s, c) in enumerate(cases):
        host = host_genotype(svtype, svlen, s, c)
        a, b, gq, dr, dv, _ = host.genotypes[0]
        assert int(np.asarray(out["gt_a"])[i]) == a, (svtype, s, c, "gt_a")
        assert int(np.asarray(out["gt_b"])[i]) == b, (svtype, s, c, "gt_b")
        assert int(np.asarray(out["dr"])[i]) == dr, (svtype, s, c, "dr")
        assert int(np.asarray(out["dv"])[i]) == dv, (svtype, s, c, "dv")
        # GQ in log space matches the linear-space host within 1 unit
        # (clamped to [0, 60])
        assert abs(int(np.asarray(out["gq"])[i]) - gq) <= 1, (svtype, s, c, "gq",
                                                              int(np.asarray(out["gq"])[i]), gq)
        assert abs(float(np.asarray(out["af"])[i]) - host.get_info("VAF")) < 1e-4


def test_long_ins_rescale():
    params = {
        "genotype_error": 0.05, "ploidy": 2.0, "normalization_target": 250.0,
        "long_ins_length": 2500.0, "rescale_base": 1.66, "rescale_mult": 0.33,
    }
    cov = jnp.asarray([30.0])
    out = genotype_batch(
        jnp.asarray([SVTYPE_CODES["INS"]], dtype=jnp.int32),
        jnp.asarray([5000], dtype=jnp.int32),
        jnp.asarray([10], dtype=jnp.int32),
        cov, cov, cov, cov, cov,
        support_sa=jnp.zeros(1, dtype=jnp.int32), params=params)
    host = host_genotype("INS", 5000, 10, 30)
    assert int(np.asarray(out["dv"])[0]) == host.genotypes[0][4]


def test_engine_del_support_sa_flows_from_signatures():
    """call_pipeline_step feeds per-cluster split-read counts into the
    DEL genotyper (reference: sv.py:580-581 SUPPORT_SA + genotyping.py
    DeletionGenotyper) instead of the round-1 support_sa=0 stub."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sniffles_tpu.parallel.engine import call_pipeline_step, default_params

    n = 1024
    base = {
        "pos": np.zeros(n, dtype=np.int32),
        "svlen": np.zeros(n, dtype=np.int32),
        "svtype": np.zeros(n, dtype=np.int32),
        "read_id": np.zeros(n, dtype=np.int32),
        "strand": np.ones(n, dtype=np.int32),
        "mapq": np.full(n, 60, dtype=np.int32),
        "nm": np.zeros(n, dtype=np.float32),
        "repeat": np.zeros(n, dtype=bool),
        "sa": np.zeros(n, dtype=bool),
        "valid": np.zeros(n, dtype=bool),
    }
    # one DEL cluster, 6 supporting reads
    for i in range(6):
        base["pos"][i] = 50_000 + i
        base["svlen"][i] = -300
        base["svtype"][i] = 1
        base["read_id"][i] = i + 1
        base["valid"][i] = True
    coverage = jnp.full((100_000,), 30, dtype=jnp.int32)
    params = default_params()

    def run(sa_flags):
        sig = dict(base)
        sig["sa"] = sa_flags
        out = call_pipeline_step({k: jnp.asarray(v) for k, v in sig.items()},
                                 coverage, params)
        out = {k: np.asarray(v) for k, v in out.items()}
        i = int(np.nonzero(out["cluster_valid"])[0][0])
        return out["dr"][i], out["dv"][i]

    no_sa = run(np.zeros(n, dtype=bool))
    with_sa = np.zeros(n, dtype=bool)
    with_sa[:6] = True
    sa = run(with_sa)
    # DEL coverage blends in support_sa (genotype_batch): DR must differ
    assert sa != no_sa, (sa, no_sa)
