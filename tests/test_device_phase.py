"""Device phase-vote tallies (ops/clustering.phase_tallies +
postprocess._phase_from_tallies): the --tpu-call engine's per-cluster
hp/ps tallies must reproduce the host phase vote EXACTLY wherever the
fast path engages, and must flag (-> exact host fallback) the cases
counts cannot decide (mixed reads, tied non-null phase-set modes).
Reference: postprocessing.py:626-654."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from sniffles_tpu.config import SnifflesConfig  # noqa: E402
from sniffles_tpu.leads import Lead, LeadProvider  # noqa: E402
from sniffles_tpu.parallel.device_call import device_clusters  # noqa: E402
from sniffles_tpu.postprocess import _phase_from_tallies, _vote  # noqa: E402
from sniffles_tpu.sim import PlantedSV, write_dataset  # noqa: E402


@pytest.fixture
def config():
    cfg = SnifflesConfig("--input", "x.bam", "--vcf", "y.vcf")
    cfg.tpu_call = True
    return cfg


def _add(provider, config, pos, svlen, qname, hap, ps, svtype="DEL"):
    ld = Lead(read_id=hash(qname) & 0xFFFF, read_qname=qname, contig="chr1",
              ref_start=pos, ref_end=pos, qry_start=0, qry_end=0,
              strand="+", mapq=40, nm=0.0, source="INLINE",
              svtype=svtype, svlen=svlen, hap=hap, phase_set=ps)
    provider.record_lead(ld, pos // config.cluster_binsize * config.cluster_binsize)


SCENARIOS = [
    # (name, [(hap, ps) per read], expect_fast_path)
    ("unanimous", [("1", "1000")] * 5, True),
    ("below_threshold_conflict", [("1", "1000")] * 19 + [("2", "1000")], True),
    ("above_threshold_conflict", [("1", "1000")] * 3 + [("2", "1000")], True),
    ("hap_tie_string_break", [("1", "1000")] * 2 + [("2", "1000")] * 2, True),
    ("unphased_default", [("0", "NULL")] * 5, True),
    ("ps_mix_unique_mode", [("1", "1000")] * 3 + [("1", "2000")], True),
    ("ps_tie_fallback", [("1", "1000")] * 2 + [("1", "2000")] * 2, False),
    ("null_vs_mode_tie", [("1", "NULL")] * 2 + [("1", "1000")] * 2, True),
]


def test_tallies_reproduce_host_vote(config):
    provider = LeadProvider(config, 0, "chr1")
    pos0 = 20_000
    for i, (name, reads, _) in enumerate(SCENARIOS):
        for j, (hap, ps) in enumerate(reads):
            _add(provider, config, pos0 + i * 9_000 + j, -200,
                 f"{name}.{j}", hap, ps)
    provider.start, provider.end = 0, 1_000_000

    made = list(device_clusters(provider, config, None))
    assert len(made) == len(SCENARIOS)
    made.sort(key=lambda c: c.seed)

    for (name, reads, expect_fast), cluster in zip(SCENARIOS, made):
        eng = getattr(cluster, "engine", None)
        assert eng is not None and eng.get("phase") is not None, name
        got = _phase_from_tallies(eng["phase"], config.phase_conflict_threshold)
        by_read = {ld.read_id: (ld.hap, ld.phase_set) for ld in cluster.leads}
        want_hp = _vote([h for h, _ in by_read.values()],
                        config.phase_conflict_threshold)
        want_ps = _vote([p for _, p in by_read.values()],
                        config.phase_conflict_threshold)
        if expect_fast:
            assert got is not None, name
            assert got[0] == want_hp, (name, got[0], want_hp)
            assert got[1] == want_ps, (name, got[1], want_ps)
        else:
            assert got is None, name   # counts cannot decide -> host vote


def test_mixed_read_forces_fallback(config):
    """A read whose leads disagree on hap must flag `mixed` (the host's
    last-lead-wins semantics need the actual lead order)."""
    provider = LeadProvider(config, 0, "chr1")
    for j in range(4):
        _add(provider, config, 20_000 + j, -200, f"r{j}", "1", "1000")
    # same read, two leads, differing hap — force distinct read ids off:
    ld1 = Lead(read_id=99, read_qname="mix", contig="chr1", ref_start=20_004,
               ref_end=20_004, qry_start=0, qry_end=0, strand="+", mapq=40,
               nm=0.0, source="INLINE", svtype="DEL", svlen=-200,
               hap="1", phase_set="1000")
    ld2 = Lead(read_id=99, read_qname="mix", contig="chr1", ref_start=20_008,
               ref_end=20_008, qry_start=900, qry_end=900, strand="+", mapq=40,
               nm=0.0, source="INLINE", svtype="DEL", svlen=-200,
               hap="2", phase_set="1000")
    binsize = config.cluster_binsize
    provider.record_lead(ld1, 20_004 // binsize * binsize)
    provider.record_lead(ld2, 20_008 // binsize * binsize)
    provider.start, provider.end = 0, 1_000_000

    made = list(device_clusters(provider, config, None))
    assert len(made) == 1
    ph = made[0].engine["phase"] if made[0].engine else None
    if ph is not None:
        assert _phase_from_tallies(ph, 0.1) is None  # mixed flag set


def test_phased_dataset_byte_identical(tmp_path):
    """Full pipeline on a PHASED simulated dataset (HP/PS tags): the
    --tpu-call output (device stats + phase tallies consumed) must be
    byte-identical to the host path, with the phase fast path engaged."""
    import subprocess, sys, os
    svs = [PlantedSV(pos=p, svtype=t, svlen=ln, vaf=v)
           for p, t, ln, v in [(30_000, "DEL", 120, 1.0), (60_000, "INS", 150, 0.5),
                               (90_000, "DEL", 500, 0.5), (120_000, "INS", 80, 1.0)]]
    bam, _ = write_dataset(str(tmp_path), ref_len=160_000, depth=24,
                           read_len=12_000, seed=7, svs=svs, phased=True)
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["SNIFFLES_TPU_FORCE_CPU"] = "1"

    def run(extra, out):
        r = subprocess.run([sys.executable, "-m", "sniffles_tpu.cli", "--input", bam,
                            "--vcf", str(out), "--threads", "0", "--phase"] + extra,
                           capture_output=True, text=True, env=env, timeout=600)
        assert r.returncode == 0, r.stderr
        with open(out) as f:
            return [l for l in f if not l.startswith("#")]

    host = run([], tmp_path / "host.vcf")
    dev = run(["--tpu-call"], tmp_path / "dev.vcf")
    assert host and len(host) == len(dev)
    for h, d in zip(host, dev):
        hf, df = h.split("\t"), d.split("\t")
        assert hf[:3] == df[:3] and hf[3:] == df[3:]
    # phased INFO actually present (the vote ran)
    assert any("PHASE=" in l for l in dev)
