"""Device-by-default gating: a bare run turns --tpu-call on exactly when
a TPU-class JAX platform is configured AND a device daemon socket is
reachable; --no-tpu always wins (config.py _tpu_device_default)."""
import os

from sniffles_tpu.config import SnifflesConfig


def _cfg(*extra):
    return SnifflesConfig("--input", "x.bam", "--vcf", "y.vcf", *extra)


def test_default_off_without_daemon(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.delenv("SNIFFLES_TPU_DEVICE_SOCKET", raising=False)
    monkeypatch.delenv("SNIFFLES_TPU_FORCE_CPU", raising=False)
    assert _cfg().tpu_call is False


def test_default_on_with_daemon_socket(monkeypatch, tmp_path):
    sock = tmp_path / "d.sock"
    sock.touch()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("SNIFFLES_TPU_DEVICE_SOCKET", str(sock))
    monkeypatch.delenv("SNIFFLES_TPU_FORCE_CPU", raising=False)
    assert _cfg().tpu_call is True


def test_no_tpu_wins(monkeypatch, tmp_path):
    sock = tmp_path / "d.sock"
    sock.touch()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("SNIFFLES_TPU_DEVICE_SOCKET", str(sock))
    monkeypatch.delenv("SNIFFLES_TPU_FORCE_CPU", raising=False)
    cfg = _cfg("--no-tpu")
    assert cfg.tpu_call is False and cfg.tpu_combine is False


def test_cpu_platform_stays_off(monkeypatch, tmp_path):
    sock = tmp_path / "d.sock"
    sock.touch()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("SNIFFLES_TPU_DEVICE_SOCKET", str(sock))
    assert _cfg().tpu_call is False


def test_force_cpu_stays_off(monkeypatch, tmp_path):
    sock = tmp_path / "d.sock"
    sock.touch()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("SNIFFLES_TPU_DEVICE_SOCKET", str(sock))
    monkeypatch.setenv("SNIFFLES_TPU_FORCE_CPU", "1")
    assert _cfg().tpu_call is False


def test_explicit_tpu_call_without_daemon(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("SNIFFLES_TPU_DEVICE_SOCKET", raising=False)
    assert _cfg("--tpu-call").tpu_call is True
