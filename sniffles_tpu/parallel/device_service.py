"""
Parent-owned device service: lets forked host workers use the TPU
without ever touching JAX themselves.

A TPU client must not be forked, so with ``--threads N`` the runtime
splits device work across the process boundary (the design promised in
pipeline/runtime.py): workers decode BAM and build signature tensors,
then ship each packed batch to the parent over their existing task
pipe as a DeviceRequest; the parent lazily initializes the JAX client
(strictly after all workers have been forked) and answers with a
DeviceResponse.  One round trip per task — transfer latency over a
tunneled chip is per-message, so the protocol is one request per
task-sized batch, not per cluster.

Reference mapping: this replaces nothing in the reference (which is
CPU-only, parallel.py:585-807); it is the TPU-native equivalent of its
worker pool feeding a shared accelerator.
"""
from __future__ import annotations

import logging
import threading
from dataclasses import dataclass, field

import numpy as np

log = logging.getLogger(__name__)

# True once any DeviceServer has initialized the JAX client in this
# process. fork() is only unsafe after that point (an imported-but-idle
# jax module is fine to fork); the runtime switches recycled workers to
# spawn when this is set.
JAX_CLIENT_LIVE = False


@dataclass
class DeviceRequest:
    """Worker -> parent: run one device kernel on a batch."""
    kind: str                 # "cluster_assign" | "call_task" | "ed_batch"
    payload: object           # packed ndarray, or a list of string pairs
    meta: dict = field(default_factory=dict)   # static kernel params


@dataclass
class DeviceResponse:
    """Parent -> worker: kernel result (or error text)."""
    payload: np.ndarray = None
    error: str = None


class DeviceServer:
    """Parent-side kernel dispatcher. JAX is initialized on the first
    request, which the caller guarantees happens after worker fork."""

    def __init__(self):
        self._kernels = {}

    def handle(self, request: DeviceRequest) -> DeviceResponse:
        try:
            return DeviceResponse(payload=self._dispatch(request))
        except Exception as e:  # noqa: BLE001 - errors cross the pipe as text
            log.warning("device service request failed", exc_info=True)
            return DeviceResponse(error=f"{type(e).__name__}: {e}")

    def _dispatch(self, request: DeviceRequest) -> np.ndarray:
        global JAX_CLIENT_LIVE
        JAX_CLIENT_LIVE = True
        if request.kind == "cluster_assign":
            import jax.numpy as jnp
            from sniffles_tpu.ops.clustering import cluster_assign_packed
            return np.asarray(cluster_assign_packed(
                jnp.asarray(request.payload), **request.meta))
        if request.kind == "call_task":
            import jax.numpy as jnp
            from sniffles_tpu.ops.clustering import call_task_packed
            return np.asarray(call_task_packed(
                jnp.asarray(request.payload), **request.meta))
        if request.kind == "ed_batch":
            # payload: list of (a, b) string pairs (combine identity gate)
            from sniffles_tpu.ops.edit_distance_jax import edit_distance_batch
            return np.asarray(edit_distance_batch(request.payload))
        raise ValueError(f"unknown device request kind: {request.kind}")


class DeviceClient:
    """Worker-side proxy. Sends a DeviceRequest on the worker's task
    pipe and blocks until the receive thread delivers the response."""

    TIMEOUT = 600  # seconds; first-compile over a tunneled chip can be slow

    def __init__(self, conn):
        self._conn = conn
        self._event = threading.Event()
        self._response: DeviceResponse = None

    def deliver(self, response: DeviceResponse) -> None:
        """Called from the worker's pipe receive thread."""
        self._response = response
        self._event.set()

    def request(self, kind: str, payload: np.ndarray, meta: dict) -> np.ndarray:
        self._event.clear()
        self._response = None
        self._conn.send(DeviceRequest(kind=kind, payload=payload, meta=meta))
        if not self._event.wait(self.TIMEOUT):
            raise TimeoutError(f"device service did not answer a {kind} request "
                               f"within {self.TIMEOUT}s")
        if self._response.error is not None:
            raise RuntimeError(f"device service error: {self._response.error}")
        return self._response.payload

    def cluster_assign(self, packed: np.ndarray, meta: dict) -> np.ndarray:
        return self.request("cluster_assign", packed, meta)

    def call_task(self, packed: np.ndarray, meta: dict) -> np.ndarray:
        return self.request("call_task", packed, meta)
