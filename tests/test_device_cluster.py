"""
Device clustering pipeline vs the exact host pipeline on synthetic,
well-separated clusters (where the reference's sequential sweep and the
device relaxation must agree).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sniffles_tpu.signatures import synthetic_batch  # noqa: E402
from sniffles_tpu.parallel.engine import call_pipeline_step, default_params  # noqa: E402
from sniffles_tpu.ops.clustering import SVTYPE_NAMES  # noqa: E402


def run_host(batch, config):
    from sniffles_tpu import cluster as cl, svcall as sv
    from sniffles_tpu.leads import Lead, LeadProvider

    provider = LeadProvider(config, 0, "chr1")
    binsize = config.cluster_binsize
    for i in range(batch.count):
        ld = Lead(read_id=int(batch.read_id[i]), read_qname=str(batch.read_id[i]),
                  contig="chr1", ref_start=int(batch.pos[i]), ref_end=int(batch.pos[i]),
                  qry_start=0, qry_end=0, strand="+" if batch.strand[i] > 0 else "-",
                  mapq=int(batch.mapq[i]), nm=float(batch.nm[i]), source="INLINE",
                  svtype=SVTYPE_NAMES[batch.svtype[i]], svlen=int(batch.svlen[i]))
        provider.record_lead(ld, int(ld.ref_start / binsize) * binsize)
    provider.start = 0
    provider.end = 1_000_000

    class T:
        sv_id = 0
        id = 0

    calls = []
    for svtype in sv.ALL_TYPES:
        for svcluster in cl.resolve(svtype, provider, config, None):
            for svc in sv.call_from(svcluster, config, True, T()):
                calls.append(svc)
    return calls


@pytest.fixture(scope="module")
def config():
    from sniffles_tpu.config import SnifflesConfig
    return SnifflesConfig("--input", "x.bam", "--vcf", "y.vcf")


def test_device_matches_host_on_separated_clusters(config):
    batch = synthetic_batch(3000, 50, seed=5, genome_span=5_000_000, batch_size=4096)
    host_calls = run_host(batch, config)

    sig = {k: jnp.asarray(v) for k, v in batch.as_dict().items()}
    coverage = jnp.full((5_200_000,), 30, dtype=jnp.int32)
    out = call_pipeline_step(sig, coverage, default_params(config))

    ncl = int(out["n_clusters"])
    dev = {}
    for i in range(ncl):
        key = (SVTYPE_NAMES[int(np.asarray(out["svtype"])[i])],
               int(np.asarray(out["pos"])[i]))
        dev[key] = {
            "svlen": int(np.asarray(out["svlen"])[i]),
            "support": int(np.asarray(out["support"])[i]),
            "stdev_pos": float(np.asarray(out["stdev_pos"])[i]),
            "stdev_len": float(np.asarray(out["stdev_len"])[i]),
            "end": int(np.asarray(out["end"])[i]),
            "qual": int(np.asarray(out["qual"])[i]),
        }

    assert len(host_calls) > 30
    exact = 0
    for call in host_calls:
        key = (call.svtype, call.pos)
        if key not in dev:
            continue
        d = dev[key]
        # cluster membership at bin boundaries may differ by a lead or two
        # between the sequential backtracking sweep and the parallel
        # relaxation; exact-match rate over well-separated clusters must
        # stay high
        if (d["svlen"] == call.svlen and d["support"] == call.support
                and d["end"] == call.end and d["qual"] == call.qual
                and abs(d["stdev_pos"] - call.get_info("STDEV_POS")) < 1e-2
                and abs(d["stdev_len"] - call.get_info("STDEV_LEN")) < 1e-2):
            exact += 1
        else:
            # even non-exact clusters must agree on the call center
            assert abs(d["svlen"] - call.svlen) <= 5, (key, d, call.svlen)
            assert abs(d["support"] - call.support) <= 3, (key, d, call.support)
    assert exact >= len(host_calls) * 0.9, (exact, len(host_calls))


def test_device_cluster_count_reasonable(config):
    batch = synthetic_batch(2000, 40, seed=9, genome_span=8_000_000, batch_size=2048)
    sig = {k: jnp.asarray(v) for k, v in batch.as_dict().items()}
    coverage = jnp.full((8_200_000,), 30, dtype=jnp.int32)
    out = call_pipeline_step(sig, coverage, default_params(config))
    ncl = int(out["n_clusters"])
    assert 40 <= ncl <= 48  # all true sites found, few spurious splits
