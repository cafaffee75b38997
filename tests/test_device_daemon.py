"""Device daemon (parallel/device_daemon.py): claim-once serving over a
Unix socket. CPU-platform coverage of the full loop — warmup, ping,
CLI runs through the socket (including device-by-default gating),
request fusion, shutdown, and the idle timeout."""
import os
import subprocess
import sys
import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from sniffles_tpu.sim import PlantedSV, write_dataset  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _daemon_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["SNIFFLES_TPU_FORCE_CPU"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.fixture
def daemon(tmp_path):
    sock = str(tmp_path / "daemon.sock")
    proc = subprocess.Popen(
        [sys.executable, "-m", "sniffles_tpu.parallel.device_daemon",
         "--socket", sock, "--idle-timeout", "300", "--no-warm-compile"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=_daemon_env())
    deadline = time.monotonic() + 60
    while not os.path.exists(sock) and time.monotonic() < deadline:
        time.sleep(0.1)
    assert os.path.exists(sock), "daemon socket never appeared"
    yield sock
    proc.terminate()
    proc.wait(10)


def test_daemon_ping_and_kernel(daemon):
    from sniffles_tpu.parallel.device_daemon import DaemonClient
    from sniffles_tpu.parallel.device_service import standard_call_meta
    from sniffles_tpu.config import SnifflesConfig

    client = DaemonClient(daemon)
    assert client.ping(timeout=300)

    config = SnifflesConfig("--input", "x.bam", "--vcf", "y.vcf")
    meta = standard_call_meta(config)
    packed = np.zeros((15, 8192), dtype=np.int32)
    packed[0, :4] = [1000, 1010, 5000, 5020]
    packed[1, :4] = [100, 100, -200, -200]
    packed[2, :4] = [0, 0, 1, 1]
    packed[3, :4] = np.arange(4)
    packed[5, :4] = 1
    packed[8, :4] = [1, 2, 3, 4]
    # responses travel wire-compact (device_call.compress_call_response)
    out = client.call_task(packed, meta)
    assert out["elems"].shape[0] == 2 and out["stats"].shape[0] == 20
    assert len(set(out["elems"][0].tolist())) == 2  # one INS + one DEL cluster
    assert out["nc"] == 2                           # n_clusters in the header

    # concurrent posts from one client resolve by req_id
    ids = [client.post("call_task", packed, meta) for _ in range(3)]
    for rid in ids:
        r = client.wait(rid)
        assert r["elems"].shape[0] == 2 and r["stats"].shape[0] == 20
    client.close()


def test_cli_device_by_default_through_daemon(daemon, tmp_path):
    """A bare CLI run (no --tpu-call) with the daemon socket configured
    takes the device path and emits records identical to --no-tpu."""
    svs = [PlantedSV(pos=p, svtype=t, svlen=ln)
           for p, t, ln in [(30_000, "DEL", 120), (60_000, "INS", 150),
                            (90_000, "DEL", 500)]]
    bam, _ = write_dataset(str(tmp_path), ref_len=120_000, depth=24,
                           read_len=12_000, seed=11, svs=svs)
    # pre-compile the production kernel shape through the daemon (the
    # test daemon skips warm compiles; under CPU contention a lazy
    # compile inside the CLI's request window can outlast its timeout
    # and silently fall back to the host path)
    from sniffles_tpu.config import SnifflesConfig
    from sniffles_tpu.parallel.device_daemon import DaemonClient
    from sniffles_tpu.parallel.device_service import standard_call_meta
    warm_client = DaemonClient(daemon)
    warm_packed = np.zeros((15, 8192), dtype=np.int32)
    warm_meta = standard_call_meta(SnifflesConfig("--input", "x.bam",
                                                  "--vcf", "y.vcf"))
    assert warm_client.call_task(warm_packed, warm_meta)["nc"] == 0
    warm_client.close()

    env = _daemon_env()
    # device-by-default requires a TPU-class platform name; the kernels
    # still execute on CPU via FORCE_CPU's platform pin inside the daemon
    env["JAX_PLATFORMS"] = "tpu,cpu"
    env["SNIFFLES_TPU_DEVICE_SOCKET"] = daemon
    del env["SNIFFLES_TPU_FORCE_CPU"]

    host_out = tmp_path / "host.vcf"
    dev_out = tmp_path / "dev.vcf"
    r1 = subprocess.run([sys.executable, "-m", "sniffles_tpu.cli", "--input", bam,
                         "--vcf", str(host_out), "--threads", "0", "--no-tpu"],
                        capture_output=True, text=True, env=env, timeout=600)
    assert r1.returncode == 0, r1.stderr
    r2 = subprocess.run([sys.executable, "-m", "sniffles_tpu.cli", "--input", bam,
                         "--vcf", str(dev_out), "--threads", "0",
                         "--dev-debug-log"],
                        capture_output=True, text=True, env=env, timeout=600)
    assert r2.returncode == 0, r2.stderr
    assert "device engine stats consumed by" in (r2.stdout + r2.stderr), \
        "bare run did not take the device path"

    def records(p):
        with open(p) as f:
            return [l for l in f if not l.startswith("#")]

    assert records(host_out) == records(dev_out)


def test_daemon_idle_timeout(tmp_path):
    sock = str(tmp_path / "idle.sock")
    proc = subprocess.Popen(
        [sys.executable, "-m", "sniffles_tpu.parallel.device_daemon",
         "--socket", sock, "--idle-timeout", "2", "--no-warm-compile"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=_daemon_env())
    try:
        deadline = time.monotonic() + 60
        while not os.path.exists(sock) and time.monotonic() < deadline:
            time.sleep(0.1)
        assert os.path.exists(sock)
        proc.wait(60)
        assert proc.returncode == 0
        assert not os.path.exists(sock), "socket not cleaned up on idle exit"
    finally:
        if proc.poll() is None:
            proc.terminate()
            proc.wait(10)


def test_daemon_shutdown_request(tmp_path):
    from sniffles_tpu.parallel.device_daemon import DaemonClient
    sock = str(tmp_path / "shut.sock")
    proc = subprocess.Popen(
        [sys.executable, "-m", "sniffles_tpu.parallel.device_daemon",
         "--socket", sock, "--idle-timeout", "300", "--no-warm-compile"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=_daemon_env())
    try:
        deadline = time.monotonic() + 60
        while not os.path.exists(sock) and time.monotonic() < deadline:
            time.sleep(0.1)
        client = DaemonClient(sock)
        client.shutdown()
        proc.wait(30)
        assert proc.returncode == 0
    finally:
        if proc.poll() is None:
            proc.terminate()
            proc.wait(10)


def test_nondefault_config_compiles_on_side_thread():
    """A call_task with a NON-warm kernel config (e.g. --cluster-binsize
    50) must compile on a side thread and still answer correctly — and a
    second same-config request must reuse the executable (one compile
    event total), so one run's non-default flags never stall other
    clients' queued requests behind the dispatcher."""
    import threading

    from sniffles_tpu.config import SnifflesConfig
    from sniffles_tpu.parallel.device_service import (DeviceServer, DeviceRequest,
                                                      standard_call_meta)

    server = DeviceServer()
    cfg = SnifflesConfig("--input", "x.bam", "--vcf", "y.vcf")
    server.warm_async(cfg)

    def roundtrip(kind, payload, meta, req_id):
        box = {}
        ev = threading.Event()
        server.submit(DeviceRequest(kind=kind, payload=payload, meta=meta,
                                    req_id=req_id),
                      lambda r: (box.setdefault("r", r), ev.set()))
        assert ev.wait(300)
        return box["r"]

    assert roundtrip("noop", None, {}, 0).error is None  # warm finished

    meta = standard_call_meta(cfg)
    meta["binsize"] = 50   # non-warm config
    packed = np.zeros((15, 8192), dtype=np.int32)
    packed[0, :4] = [1000, 1010, 5000, 5020]
    packed[1, :4] = [100, 100, -200, -200]
    packed[2, :4] = [0, 0, 1, 1]
    packed[3, :4] = np.arange(4)
    packed[5, :4] = 1
    packed[8, :4] = [1, 2, 3, 4]

    r1 = roundtrip("call_task", packed, meta, 1)
    assert r1.error is None
    assert r1.payload["nc"] == 2
    assert server.counters["midrun_compiles"] == 1

    r2 = roundtrip("call_task", packed, meta, 2)
    assert r2.error is None
    assert server.counters["midrun_compiles"] == 1  # executable reused
    # the default config stayed warm throughout
    r3 = roundtrip("call_task", packed, standard_call_meta(cfg), 3)
    assert r3.error is None
    assert server.counters["midrun_compiles"] == 1
