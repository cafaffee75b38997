"""End-to-end --tpu-call on the REAL chip: the device clustering path
must produce a byte-identical VCF body to the host path, with zero
silent fallbacks (SNIFFLES_TPU_REQUIRE_DEVICE makes any device-path
error fatal instead of degrading to the host sweep).

This is the production acceptance for the device call pipeline
(reference per-task compute: /root/reference/src/sniffles/parallel.py:90-201).
"""
import os
import subprocess
import sys

from sniffles_tpu.sim import PlantedSV, write_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd, on_chip: bool):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if on_chip:
        env.pop("SNIFFLES_TPU_FORCE_CPU", None)
        env["SNIFFLES_TPU_REQUIRE_DEVICE"] = "1"
    else:
        env["SNIFFLES_TPU_FORCE_CPU"] = "1"
    return subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=str(cwd),
                          timeout=1200)


def vcf_body(path):
    with open(path) as f:
        return [line for line in f if not line.startswith("##")]


def test_chip_tpu_call_byte_identical_hg008(tmp_path, hg008_bam):
    host_out = tmp_path / "host.vcf"
    dev_out = tmp_path / "dev.vcf"
    r1 = run_cli(["--input", hg008_bam, "--vcf", str(host_out), "--threads", "0"],
                 tmp_path, on_chip=False)
    assert r1.returncode == 0, r1.stderr
    r2 = run_cli(["--input", hg008_bam, "--vcf", str(dev_out), "--threads", "0",
                  "--tpu-call"], tmp_path, on_chip=True)
    assert r2.returncode == 0, r2.stderr
    assert "falling back" not in r2.stderr
    assert vcf_body(host_out) == vcf_body(dev_out)


def test_chip_tpu_call_threaded_byte_identical(tmp_path):
    """--threads 2 --tpu-call on the chip: forked workers ship packed
    signature batches to the parent-owned TPU client. Also asserts the
    engine-stat consumption fraction: every non-BND cluster on this
    dataset must take device-computed calling statistics (BND mate
    geometry is deliberately host-side, VERDICT r2 carve-out)."""
    svs = [PlantedSV(pos=p, svtype=t, svlen=ln)
           for p, t, ln in [(30_000, "DEL", 120), (60_000, "INS", 150),
                            (90_000, "DEL", 500), (120_000, "INS", 80),
                            (150_000, "DEL", 2000)]]
    bam, _ = write_dataset(str(tmp_path), ref_len=200_000, depth=24,
                           read_len=12_000, seed=11, svs=svs)
    host_out = tmp_path / "host.vcf"
    dev_out = tmp_path / "dev.vcf"
    r1 = run_cli(["--input", bam, "--vcf", str(host_out), "--threads", "2"],
                 tmp_path, on_chip=False)
    assert r1.returncode == 0, r1.stderr
    r2 = run_cli(["--input", bam, "--vcf", str(dev_out), "--threads", "2",
                  "--tpu-call", "--dev-debug-log"], tmp_path, on_chip=True)
    assert r2.returncode == 0, r2.stderr
    assert "falling back" not in r2.stderr
    assert vcf_body(host_out) == vcf_body(dev_out)

    # consumption-fraction counters ride the --dev-debug-log output
    # (children_total excludes BND by construction)
    import re
    consumed = total = 0
    for m in re.finditer(r"device engine stats consumed by (\d+)/(\d+) children",
                         r2.stdout + r2.stderr):
        consumed += int(m.group(1))
        total += int(m.group(2))
    assert total > 0, "no consumption counters in debug log"
    assert consumed / total >= 0.8, (consumed, total)


def test_chip_bare_run_uses_device_via_daemon(tmp_path):
    """Device-by-default: with a warm device daemon present, a BARE run
    (no --tpu-call) must take the device path (consumption counters
    present) and stay byte-identical to --no-tpu."""
    import re
    import subprocess as sp
    import time

    from sniffles_tpu.parallel.device_daemon import DaemonClient

    svs = [PlantedSV(pos=p, svtype=t, svlen=ln)
           for p, t, ln in [(30_000, "DEL", 120), (60_000, "INS", 150),
                            (90_000, "DEL", 500)]]
    bam, _ = write_dataset(str(tmp_path), ref_len=120_000, depth=24,
                           read_len=12_000, seed=11, svs=svs)
    sock = str(tmp_path / "daemon.sock")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("SNIFFLES_TPU_FORCE_CPU", None)
    daemon = sp.Popen([sys.executable, "-m", "sniffles_tpu.parallel.device_daemon",
                       "--socket", sock, "--idle-timeout", "300"],
                      stdout=sp.DEVNULL, stderr=sp.DEVNULL, env=env)
    try:
        deadline = time.monotonic() + 60
        while not os.path.exists(sock) and time.monotonic() < deadline:
            time.sleep(0.2)
        client = DaemonClient(sock)
        assert client.ping(timeout=900), "daemon failed to warm"

        host_out = tmp_path / "host.vcf"
        dev_out = tmp_path / "dev.vcf"
        r1 = run_cli(["--input", bam, "--vcf", str(host_out), "--threads", "0",
                      "--no-tpu"], tmp_path, on_chip=False)
        assert r1.returncode == 0, r1.stderr
        env2 = {"SNIFFLES_TPU_DEVICE_SOCKET": sock}
        e = dict(os.environ)
        e["PYTHONPATH"] = REPO + os.pathsep + e.get("PYTHONPATH", "")
        e.pop("SNIFFLES_TPU_FORCE_CPU", None)
        e.update(env2)
        r2 = sp.run([sys.executable, "-m", "sniffles_tpu.cli",
                     "--input", bam, "--vcf", str(dev_out), "--threads", "0",
                     "--dev-debug-log"],
                    capture_output=True, text=True, env=e, cwd=str(tmp_path),
                    timeout=1200)
        assert r2.returncode == 0, r2.stderr
        assert re.search(r"device engine stats consumed by \d+/\d+",
                         r2.stdout + r2.stderr), "bare run did not use the device"
        assert vcf_body(host_out) == vcf_body(dev_out)
        client.shutdown()
        client.close()
    finally:
        daemon.terminate()
        daemon.wait(10)
