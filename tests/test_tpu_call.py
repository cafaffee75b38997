"""--tpu-call: device clustering in the production call path must match
the host path on separated SVs."""
import os
import subprocess
import sys

import pytest

from sniffles_tpu.sim import PlantedSV, write_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd, env_extra=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # subprocess must also pin the CPU platform (axon sitecustomize)
    env["SNIFFLES_TPU_FORCE_CPU"] = "1"
    if env_extra:
        env.update(env_extra)
    return subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=str(cwd), timeout=600)


def read_calls(vcf_path):
    with open(vcf_path) as f:
        return [l.rstrip("\n").split("\t") for l in f if not l.startswith("#")]


def test_tpu_call_matches_host(tmp_path):
    svs = [PlantedSV(pos=p, svtype=t, svlen=ln)
           for p, t, ln in [(30_000, "DEL", 120), (60_000, "INS", 150),
                            (90_000, "DEL", 500), (120_000, "INS", 80),
                            (150_000, "DEL", 2000)]]
    bam, fasta = write_dataset(str(tmp_path), ref_len=200_000, depth=24,
                               read_len=12_000, seed=11, svs=svs)
    host_out = tmp_path / "host.vcf"
    dev_out = tmp_path / "dev.vcf"
    r1 = run_cli(["--input", bam, "--vcf", str(host_out), "--threads", "0"], tmp_path)
    assert r1.returncode == 0, r1.stderr
    r2 = run_cli(["--input", bam, "--vcf", str(dev_out), "--threads", "0", "--tpu-call"],
                 tmp_path)
    assert r2.returncode == 0, r2.stderr

    host_calls = read_calls(host_out)
    dev_calls = read_calls(dev_out)
    assert len(host_calls) == len(dev_calls) == 5
    # identical core fields (pos/ref/alt/filter/info/genotype); IDs differ
    # (device cluster ids are numbered differently)
    for h, d in zip(host_calls, dev_calls):
        assert h[0] == d[0] and h[1] == d[1]
        assert h[3] == d[3] and h[4] == d[4]
        assert h[6] == d[6]
        assert h[9] == d[9]


def test_tpu_call_threaded_device_service_matches_host(tmp_path):
    """--threads N --tpu-call: workers ship packed signature batches to the
    parent-owned device service; output must equal the host path."""
    svs = [PlantedSV(pos=p, svtype=t, svlen=ln)
           for p, t, ln in [(30_000, "DEL", 120), (60_000, "INS", 150),
                            (90_000, "DEL", 500), (120_000, "INS", 80),
                            (150_000, "DEL", 2000)]]
    bam, fasta = write_dataset(str(tmp_path), ref_len=200_000, depth=24,
                               read_len=12_000, seed=11, svs=svs)
    host_out = tmp_path / "host.vcf"
    dev_out = tmp_path / "dev.vcf"
    r1 = run_cli(["--input", bam, "--vcf", str(host_out), "--threads", "2"], tmp_path)
    assert r1.returncode == 0, r1.stderr
    env_extra = {"SNIFFLES_TPU_REQUIRE_DEVICE": "1"}
    r2 = run_cli(["--input", bam, "--vcf", str(dev_out), "--threads", "2", "--tpu-call"],
                 tmp_path, env_extra=env_extra)
    assert r2.returncode == 0, r2.stderr
    assert "falling back" not in r2.stderr

    host_calls = read_calls(host_out)
    dev_calls = read_calls(dev_out)
    assert len(host_calls) == len(dev_calls) == 5
    for h, d in zip(host_calls, dev_calls):
        assert h[0] == d[0] and h[1] == d[1]
        assert h[3] == d[3] and h[4] == d[4]
        assert h[6] == d[6]
        assert h[9] == d[9]


def test_tpu_call_bnd_matches_host(tmp_path):
    """BND stage-1 clustering on device + host mate resplit reproduces the
    host path on the GIAB breakend fixture."""
    HG008 = "/root/reference/src/tests/data/hg008.bam"
    host_out = tmp_path / "host.vcf"
    dev_out = tmp_path / "dev.vcf"
    r1 = run_cli(["--input", HG008, "--vcf", str(host_out), "--threads", "0"], tmp_path)
    assert r1.returncode == 0, r1.stderr
    r2 = run_cli(["--input", HG008, "--vcf", str(dev_out), "--threads", "0",
                  "--tpu-call"], tmp_path)
    assert r2.returncode == 0, r2.stderr

    host_calls = read_calls(host_out)
    dev_calls = read_calls(dev_out)
    assert len(host_calls) == len(dev_calls) == 4
    for h, d in zip(host_calls, dev_calls):
        assert (h[0], h[1], h[4], h[6], h[9]) == (d[0], d[1], d[4], d[6], d[9])


def test_tpu_combine_matches_host(tmp_path):
    """--tpu-combine: device candidate grouping in the production combine
    path must match the host greedy assignment."""
    import numpy as np
    rng = np.random.default_rng(60)
    svs = [PlantedSV(pos=p, svtype="DEL" if i % 2 else "INS",
                     svlen=int(rng.integers(80, 1500)), vaf=1.0 if i % 3 else 0.5)
           for i, p in enumerate(range(30_000, 950_000, 35_000))]
    bam, fasta = write_dataset(str(tmp_path), ref_len=1_000_000, depth=24,
                               read_len=10_000, seed=60, svs=svs)
    snfs = []
    for i in range(3):
        s = tmp_path / f"s{i}.snf"
        r = run_cli(["--input", bam, "--snf", str(s), "--sample-id", f"S{i}",
                     "--threads", "0"], tmp_path)
        assert r.returncode == 0, r.stderr
        snfs.append(str(s))

    host_out = tmp_path / "host.vcf"
    dev_out = tmp_path / "dev.vcf"
    r = run_cli(["--input"] + snfs + ["--vcf", str(host_out), "--threads", "0"], tmp_path)
    assert r.returncode == 0, r.stderr
    r = run_cli(["--input"] + snfs + ["--vcf", str(dev_out), "--threads", "0",
                 "--tpu-combine"], tmp_path)
    assert r.returncode == 0, r.stderr

    host = read_calls(host_out)
    dev = read_calls(dev_out)
    assert len(host) == len(dev) > 20
    hk = [(c[0], c[1], c[4], c[6], tuple(c[9:12])) for c in host]
    dk = [(c[0], c[1], c[4], c[6], tuple(c[9:12])) for c in dev]
    assert sorted(hk) == sorted(dk)


def test_device_hedge_timeout_falls_back_to_host(tmp_path):
    """Hedged dispatch: when the device response misses the hedge
    deadline, the task runs the exact host sweep (identical output) and
    counts the hedge fallback; REQUIRE_DEVICE disables the hedge."""
    import threading

    import pytest

    from sniffles_tpu.config import SnifflesConfig
    from sniffles_tpu.parallel.device_call import device_clusters, pack_task_batch

    class StalledClient:
        """Device proxy that never answers inside the hedge window."""
        def post(self, kind, payload, meta):
            return 1

        def wait(self, req_id, timeout=None):
            assert timeout is not None and timeout <= 0.2
            raise TimeoutError("no response within hedge")

        def discard(self, req_id):
            self.discarded = True

    cfg = SnifflesConfig("--input", "x.bam", "--vcf", "y.vcf",
                         "--dev-device-hedge-s", "0.2")
    cfg.tpu_call = True

    from sniffles_tpu.leads import Lead, LeadProvider
    provider = LeadProvider(cfg, 0, "chr1")
    for j in range(6):
        ld = Lead(read_id=j, read_qname=f"r{j}", contig="chr1",
                  ref_start=20_000 + j, ref_end=20_000 + j, qry_start=0,
                  qry_end=0, strand="+", mapq=40, nm=0.0, source="INLINE",
                  svtype="DEL", svlen=-200)
        provider.record_lead(ld, 20_000 // cfg.cluster_binsize * cfg.cluster_binsize)
    provider.start, provider.end = 0, 1_000_000

    client = StalledClient()
    with pytest.raises(RuntimeError, match="hedge deadline"):
        list(device_clusters(provider, cfg, None, device=client))
    assert getattr(client, "discarded", False), "stalled request not discarded"


def test_degraded_breaker_uses_fast_hedge(tmp_path):
    """Circuit breaker: with the client reporting a degraded round trip,
    the wait uses the fail-fast hedge (0.05s) instead of the full one."""
    import pytest

    from sniffles_tpu.config import SnifflesConfig
    from sniffles_tpu.leads import Lead, LeadProvider
    from sniffles_tpu.parallel.device_call import device_clusters

    class DegradedClient:
        def degraded(self, threshold=0.4):
            return True

        def post(self, kind, payload, meta):
            return 7

        def wait(self, req_id, timeout=None):
            assert timeout == 0.05, f"breaker did not tighten hedge: {timeout}"
            raise TimeoutError("still slow")

        def discard(self, req_id):
            pass

    cfg = SnifflesConfig("--input", "x.bam", "--vcf", "y.vcf")
    cfg.tpu_call = True
    provider = LeadProvider(cfg, 0, "chr1")
    for j in range(5):
        ld = Lead(read_id=j, read_qname=f"r{j}", contig="chr1",
                  ref_start=20_000 + j, ref_end=20_000 + j, qry_start=0,
                  qry_end=0, strand="+", mapq=40, nm=0.0, source="INLINE",
                  svtype="DEL", svlen=-200)
        provider.record_lead(ld, 20_000 // cfg.cluster_binsize * cfg.cluster_binsize)
    provider.start, provider.end = 0, 1_000_000

    with pytest.raises(RuntimeError, match="hedge deadline"):
        list(device_clusters(provider, cfg, None, device=DegradedClient()))


def test_latency_tracking_closes_breaker():
    """DaemonClient records post->delivery latency; a fast response
    closes the breaker a slow one opened."""
    from sniffles_tpu.parallel.device_service import DeviceClient, DeviceResponse

    class NullConn:
        def send(self, msg):
            pass

    c = DeviceClient(NullConn())
    rid = c.post("call_task", None, {})
    import time
    c._post_t[rid] -= 1.0              # pretend the post was 1s ago
    c.deliver(DeviceResponse(payload=None, req_id=rid))
    assert c.degraded()
    rid2 = c.post("call_task", None, {})
    c.deliver(DeviceResponse(payload=None, req_id=rid2))
    assert not c.degraded()
