"""
Parent-owned device service: lets forked host workers use the TPU
without ever touching JAX themselves.

A TPU client must not be forked, so with ``--threads N`` the runtime
splits device work across the process boundary (the design promised in
pipeline/runtime.py): workers decode BAM and build signature tensors,
then ship each packed batch to the parent over their existing task
pipe as a DeviceRequest; the parent owns the JAX client (initialized
strictly after all workers have been forked) and answers with a
DeviceResponse.

Dispatch economics (the round-3 lesson): the expensive parts are the
one-time chip claim (~1s, up to minutes over a contended tunnel) and
the per-shape compile (~1s with a warm persistent cache) — so the
server runs them on a dedicated dispatcher thread started immediately
after the workers fork, overlapping claim+compile with the workers'
BAM decode, and requests are tagged with ids so a worker can keep
several in flight (the decode-ahead prefetch posts the next task's
batch while the current task's host compute runs).

Reference mapping: this replaces nothing in the reference (which is
CPU-only, parallel.py:585-807); it is the TPU-native equivalent of its
worker pool feeding a shared accelerator.
"""
from __future__ import annotations

import logging
import os
import queue
import threading
import time
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
    req_id: int = 0           # worker-scoped correlation id


@dataclass
class DeviceResponse:
    """Parent -> worker: kernel result (or error text)."""
    payload: np.ndarray = None
    error: str = None
    req_id: int = 0


def standard_call_meta(config) -> dict:
    """The static kernel params the production --tpu-call path uses
    (device_call.py builds the same dict per task). Warmup compiles for
    exactly these so the first real request hits the jit cache."""
    return dict(
        cluster_r=float(config.cluster_r),
        cluster_repeat_h=float(config.cluster_repeat_h),
        cluster_repeat_h_max=float(config.cluster_repeat_h_max),
        cluster_merge_bnd=int(config.cluster_merge_bnd),
        cluster_merge_len=float(config.cluster_merge_len),
        minsvlen=int(config.minsvlen),
        cluster_merge_pos=int(config.cluster_merge_pos),
        global_repeat=bool(config.repeat),
        binsize=int(config.cluster_binsize),
        resplit_binsize=int(config.cluster_resplit_binsize),
    )


class DeviceServer:
    """Parent-side kernel dispatcher.

    Requests are processed on a dedicated thread (``submit``); the
    response is handed to the per-request ``reply`` callable from that
    thread, so the parent's poll loop never blocks on the chip.
    ``warm_async`` starts the thread early and front-loads the chip
    claim + the standard-shape compile so they overlap with worker BAM
    decode instead of stalling the first task.

    The synchronous ``handle`` entry is kept for inline callers/tests.
    """

    def __init__(self):
        self._queue: queue.Queue = queue.Queue()
        self._thread: threading.Thread = None
        self._warm_meta = None
        self._warm_full = False
        # (k, batch_size) shapes compiled during warmup; request fusion
        # only engages when its padded shape is already compiled (a
        # mid-run tunnel compile would stall every queued request)
        self._ready_shapes: set = set()
        # (meta, size) call_task configs whose executable exists; a
        # request for an UNSEEN config is compiled on a SIDE thread and
        # re-enqueued when ready, so one non-default run's compile
        # (up to ~30s+ over a tunnel) never stalls other clients'
        # queued requests behind the single dispatcher
        self._ready_metas: set = set()
        self._compiling: dict = {}
        self._compiling_lock = threading.Lock()
        self.warm_stats: dict = {}
        self.counters = {"requests": 0, "fusion_batches": 0,
                         "fusion_fused_requests": 0, "midrun_compiles": 0,
                         "fusion_window_waits": 0}
        self._last_arrival = 0.0

    # -- threaded operation -------------------------------------------------

    def warm_async(self, config=None, full: bool = False) -> None:
        """Start the dispatcher thread; it claims the chip and compiles
        the standard call-step shape before serving requests. full=True
        (the persistent daemon) also compiles the fused 2x/4x shapes and
        the next batch size up, so no production dispatch ever compiles
        mid-run; the in-CLI service warms only the standard shape (a
        one-shot run cannot amortize the extra compiles)."""
        if self._thread is not None:
            return
        if config is not None:
            self._warm_meta = standard_call_meta(config)
        self._warm_full = full
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="device-dispatch")
        self._thread.start()

    def submit(self, request: DeviceRequest, reply) -> None:
        """Queue a request; ``reply(DeviceResponse)`` is called from the
        dispatcher thread when done."""
        if self._thread is None:
            self.warm_async()
        self._last_arrival = time.monotonic()
        self._queue.put((request, reply))

    # max call_task requests fused into one vmapped dispatch; padded to
    # 2 or 4 so at most two extra shapes ever compile
    MAX_FUSED = 4

    # adaptive dispatch window: when the queue is WARM (another request
    # arrived within FUSION_HOT_S — concurrent workers are decoding),
    # hold a fusable call_task a few ms for same-shape companions
    # instead of dispatching solo. Decode-ahead posting gives every
    # request hundreds of ms of slack before its result is consumed, so
    # the window's added latency is hidden, while each request it fuses
    # saves a full kernel round trip (~25ms through the tunnel).
    # BENCH_r04: only 90/254 requests fused with the drain-only policy.
    FUSION_WINDOW_S = float(os.environ.get(
        "SNIFFLES_TPU_FUSION_WINDOW_MS", "12")) / 1000.0
    FUSION_HOT_S = 0.25

    def _run(self) -> None:
        self._warm()
        # 1-deep response pipeline: fetching a kernel's result pays a
        # full tunnel round trip (~24ms measured) REGARDLESS of size, so
        # the dispatcher starts the next kernel (async jit dispatch +
        # copy_to_host_async) before finishing the previous response —
        # the fetch overlaps the next kernel's execution. When the queue
        # goes quiet the pending response is finished immediately, so an
        # isolated request sees no added latency.
        pending = None
        while True:
            try:
                request, reply = self._queue.get_nowait()
            except queue.Empty:
                if pending is not None:
                    pending()
                    pending = None
                request, reply = self._queue.get()
            self.counters["requests"] += 1

            # non-default kernel configs compile on a side thread so the
            # dispatcher keeps serving ready requests meanwhile
            if request.kind == "call_task" and not self._meta_ready(request):
                self._compile_async(request, reply)
                continue

            # adaptive request fusion: drain same-kernel-shape/same-meta
            # call_task requests already waiting and dispatch them as ONE
            # vmapped kernel call — k tasks, one round-trip latency.
            # Payloads arrive TRIMMED (device_call.pack_task_batch);
            # requests fuse when their PADDED widths match, so tasks of
            # different real sizes share the one compiled fused shape.
            batch = [(request, reply)]
            leftover = None
            pw = self._padded(request) if request.kind == "call_task" else 0
            fusable = (request.kind == "call_task"
                       and (2, pw) in self._ready_shapes)
            if fusable:
                deadline = None
                while len(batch) < self.MAX_FUSED:
                    try:
                        nxt = self._queue.get_nowait()
                    except queue.Empty:
                        now = time.monotonic()
                        if (self.FUSION_WINDOW_S <= 0
                                or now - self._last_arrival > self.FUSION_HOT_S):
                            break   # cold queue: never add solo latency
                        if deadline is None:
                            deadline = now + self.FUSION_WINDOW_S
                            self.counters["fusion_window_waits"] += 1
                        remaining = deadline - now
                        if remaining <= 0:
                            break
                        try:
                            nxt = self._queue.get(timeout=remaining)
                        except queue.Empty:
                            break
                    if (nxt[0].kind == "call_task"
                            and nxt[0].meta == request.meta
                            and self._padded(nxt[0]) == pw):
                        batch.append(nxt)
                    else:
                        leftover = nxt
                        break

            if len(batch) > 1:
                self.counters["fusion_batches"] += 1
                self.counters["fusion_fused_requests"] += len(batch)
                finish = self._start_fused(batch)
                if pending is not None:
                    pending()
                pending = finish
            elif request.kind == "call_task":
                finish = self._start_solo(request, reply)
                if pending is not None:
                    pending()
                pending = finish
            elif request.kind == "combine_greedy_task":
                finish = self._start_combine(request, reply)
                if pending is not None:
                    pending()
                pending = finish
            else:
                if pending is not None:
                    pending()
                    pending = None
                self._safe_reply(reply, self.handle(request))
            if leftover is not None:
                lreq, lreply = leftover
                if lreq.kind == "call_task" and self._meta_ready(lreq):
                    finish = self._start_solo(lreq, lreply)
                    if pending is not None:
                        pending()
                    pending = finish
                else:
                    if pending is not None:
                        pending()
                        pending = None
                    self._safe_reply(lreply, self.handle(lreq))

    @staticmethod
    def _padded(request) -> int:
        from sniffles_tpu.parallel.device_call import padded_width
        return padded_width(int(np.shape(request.payload)[-1]))

    def _meta_key(self, request):
        return (tuple(sorted(request.meta.items())), self._padded(request))

    def _meta_ready(self, request) -> bool:
        return self._meta_key(request) in self._ready_metas

    def _compile_async(self, request, reply) -> None:
        """Compile an unseen (meta, size) call_task config on a side
        thread; park this request (and any same-config arrivals) until
        the executable exists, then re-enqueue them. Other clients'
        ready requests keep flowing through the dispatcher meanwhile."""
        key = self._meta_key(request)
        # parked requests re-enter the queue later; don't double-count
        self.counters["requests"] -= 1
        with self._compiling_lock:
            pending = self._compiling.get(key)
            if pending is not None:
                pending.append((request, reply))
                return
            self._compiling[key] = [(request, reply)]
        self.counters["midrun_compiles"] += 1
        log.info(f"device service: compiling non-warm kernel config "
                 f"(size {key[1]}) on a side thread; other requests "
                 f"keep dispatching")

        def compile_and_release():
            try:
                import jax
                import jax.numpy as jnp
                from sniffles_tpu.ops.clustering import call_task_packed
                from sniffles_tpu.parallel.device_call import PACKED_ROWS
                jax.device_get(call_task_packed(
                    jnp.zeros((PACKED_ROWS, key[1]), jnp.int32), **dict(key[0])))
            except Exception:
                # dispatch will retry the compile inline and surface the
                # real error to the requester
                log.warning("side-thread kernel compile failed", exc_info=True)
            self._ready_metas.add(key)
            with self._compiling_lock:
                parked = self._compiling.pop(key, [])
            for req, rep in parked:
                self._queue.put((req, rep))

        threading.Thread(target=compile_and_release, daemon=True,
                         name="device-compile").start()

    @staticmethod
    def _safe_reply(reply, response) -> None:
        try:
            reply(response)
        except Exception:
            # requester's pipe may be gone (dead worker); its task is
            # requeued by the heartbeat logic and re-posts elsewhere
            log.debug("could not deliver device response", exc_info=True)

    def _start_solo(self, request, reply):
        """Dispatch one call_task kernel asynchronously; returns a
        finish() that fetches + replies (run it AFTER dispatching the
        next kernel so the tunnel fetch overlaps device compute), or
        None if the dispatch itself failed (already replied)."""
        global JAX_CLIENT_LIVE
        try:
            import jax.numpy as jnp
            from sniffles_tpu.ops.clustering import call_task_packed
            from sniffles_tpu.parallel.device_call import (compress_call_response,
                                                           pad_packed)
            JAX_CLIENT_LIVE = True
            padded = pad_packed(np.asarray(request.payload))
            out = call_task_packed(jnp.asarray(padded), **request.meta)
            try:
                out.copy_to_host_async()
            except Exception:
                pass

            def finish():
                try:
                    self._safe_reply(reply, DeviceResponse(
                        payload=compress_call_response(np.asarray(out),
                                                       padded.shape[1]),
                        req_id=request.req_id))
                except Exception as e:  # noqa: BLE001
                    log.warning("device response fetch failed", exc_info=True)
                    self._safe_reply(reply, DeviceResponse(
                        error=f"{type(e).__name__}: {e}",
                        req_id=request.req_id))
            return finish
        except Exception as e:  # noqa: BLE001
            log.warning("device service request failed", exc_info=True)
            self._safe_reply(reply, DeviceResponse(
                error=f"{type(e).__name__}: {e}", req_id=request.req_id))
            return None

    def _start_combine(self, request, reply):
        """Async dispatch for whole-task combine greedy kernels; same
        finish() contract as _start_solo."""
        global JAX_CLIENT_LIVE
        try:
            from sniffles_tpu.ops.combine_greedy import start_combine_greedy_task
            JAX_CLIENT_LIVE = True
            finishf = start_combine_greedy_task(request.payload, request.meta)

            def finish():
                try:
                    self._safe_reply(reply, DeviceResponse(
                        payload=finishf(), req_id=request.req_id))
                except Exception as e:  # noqa: BLE001
                    log.warning("combine kernel fetch failed", exc_info=True)
                    self._safe_reply(reply, DeviceResponse(
                        error=f"{type(e).__name__}: {e}",
                        req_id=request.req_id))
            return finish
        except Exception as e:  # noqa: BLE001
            log.warning("combine kernel dispatch failed", exc_info=True)
            self._safe_reply(reply, DeviceResponse(
                error=f"{type(e).__name__}: {e}", req_id=request.req_id))
            return None

    def _start_fused(self, batch):
        """Dispatch one fused (vmapped) kernel for same-shape call_task
        requests; same contract as _start_solo."""
        global JAX_CLIENT_LIVE
        try:
            import jax.numpy as jnp
            from sniffles_tpu.ops.clustering import batched_call_task
            from sniffles_tpu.parallel.device_call import (PACKED_ROWS,
                                                           compress_call_response)
            JAX_CLIENT_LIVE = True
            k = len(batch)
            kp = 2 if k <= 2 else 4   # pad slots carry valid=0 rows only
            pw = self._padded(batch[0][0])
            stacked = np.zeros((kp, PACKED_ROWS, pw), dtype=np.int32)
            for j, (req, _) in enumerate(batch):
                stacked[j, :, :np.shape(req.payload)[-1]] = req.payload
            meta_items = tuple(sorted(batch[0][0].meta.items()))
            out = batched_call_task(meta_items)(jnp.asarray(stacked))
            try:
                out.copy_to_host_async()
            except Exception:
                pass

            def finish():
                try:
                    fetched = np.asarray(out)
                    for j, (req, reply) in enumerate(batch):
                        self._safe_reply(reply, DeviceResponse(
                            payload=compress_call_response(fetched[j], pw),
                            req_id=req.req_id))
                except Exception as e:  # noqa: BLE001
                    log.warning("fused device fetch failed", exc_info=True)
                    for req, reply in batch:
                        self._safe_reply(reply, DeviceResponse(
                            error=f"{type(e).__name__}: {e}", req_id=req.req_id))
            return finish
        except Exception as e:  # noqa: BLE001
            log.warning("fused device dispatch failed", exc_info=True)
            for req, reply in batch:
                self._safe_reply(reply, DeviceResponse(
                    error=f"{type(e).__name__}: {e}", req_id=req.req_id))
            return None

    def _warm(self) -> None:
        global JAX_CLIENT_LIVE
        try:
            t0 = time.perf_counter()
            import jax
            import jax.numpy as jnp
            JAX_CLIENT_LIVE = True
            # chip claim: the first dispatch in a fresh process pays the
            # tunnel claim (1s steady, minutes under contention)
            jax.device_get(jnp.zeros((8,), jnp.int32) + 1)
            claim_s = time.perf_counter() - t0
            compile_s = 0.0
            if self._warm_meta is not None:
                # compile BEFORE the ready ping — a mid-run compile over
                # the tunnel (up to ~30s) stalls queued requests, and a
                # speculative "idle" compile races the next run's
                # arrival (measured: a bench TPU leg queued behind one).
                # The daemon (full) warms every production shape; the
                # in-CLI one-shot service warms only the standard shape.
                from sniffles_tpu.ops.clustering import (batched_call_task,
                                                         call_task_packed)
                from sniffles_tpu.parallel.device_call import (DEVICE_BATCH_FLOOR,
                                                               PACKED_ROWS)
                t0 = time.perf_counter()
                sizes = [DEVICE_BATCH_FLOOR]
                if self._warm_full:
                    # 2x..8x the floor: SV-dense tasks (TR-region
                    # density at depth) pack up to 8x-floor signature
                    # widths per contig task, and an unwarmed width
                    # costs a ~37-80s cold tunnel compile that hedges
                    # every dispatch to host meanwhile (persistent
                    # compile-cache hits reduce each to ~1.6-3s, so a
                    # warm daemon start stays cheap)
                    sizes.append(2 * DEVICE_BATCH_FLOOR)
                    sizes.append(4 * DEVICE_BATCH_FLOOR)
                    sizes.append(8 * DEVICE_BATCH_FLOOR)
                warm_key = tuple(sorted(self._warm_meta.items()))
                for size in sizes:
                    jax.device_get(call_task_packed(
                        jnp.zeros((PACKED_ROWS, size), jnp.int32), **self._warm_meta))
                    self._ready_shapes.add((1, size))
                    self._ready_metas.add((warm_key, size))
                if self._warm_full:
                    fused = batched_call_task(tuple(sorted(self._warm_meta.items())))
                    for k in (2, 4):
                        jax.device_get(fused(
                            jnp.zeros((k, PACKED_ROWS, DEVICE_BATCH_FLOOR), jnp.int32)))
                        self._ready_shapes.add((k, DEVICE_BATCH_FLOOR))
                compile_s = time.perf_counter() - t0
            self.warm_stats = {"claim_s": round(claim_s, 3),
                               "compile_s": round(compile_s, 3)}
            log.info(f"device warmup: claim {claim_s:.2f}s, "
                     f"standard-shape compile {compile_s:.2f}s")
        except Exception:
            # surfaced per-request later; workers fall back to host
            log.warning("device warmup failed", exc_info=True)

    # -- kernel dispatch ----------------------------------------------------

    def handle(self, request: DeviceRequest) -> DeviceResponse:
        try:
            return DeviceResponse(payload=self._dispatch(request),
                                  req_id=request.req_id)
        except Exception as e:  # noqa: BLE001 - errors cross the pipe as text
            log.warning("device service request failed", exc_info=True)
            return DeviceResponse(error=f"{type(e).__name__}: {e}",
                                  req_id=request.req_id)

    def _dispatch(self, request: DeviceRequest) -> np.ndarray:
        global JAX_CLIENT_LIVE
        JAX_CLIENT_LIVE = True
        if request.kind == "noop":
            # liveness/warmth probe: reaching here means warmup finished
            return np.zeros(1, dtype=np.int32)
        if request.kind == "stats":
            # dispatcher/fusion/compile counters (benched in BENCH JSON)
            return dict(self.counters)
        if request.kind == "cluster_assign":
            import jax.numpy as jnp
            from sniffles_tpu.ops.clustering import cluster_assign_packed
            return np.asarray(cluster_assign_packed(
                jnp.asarray(request.payload), **request.meta))
        if request.kind == "call_task":
            import jax.numpy as jnp
            from sniffles_tpu.ops.clustering import call_task_packed
            from sniffles_tpu.parallel.device_call import (compress_call_response,
                                                           pad_packed)
            padded = pad_packed(np.asarray(request.payload))
            out = np.asarray(call_task_packed(jnp.asarray(padded),
                                              **request.meta))
            return compress_call_response(out, padded.shape[1])
        if request.kind == "call_task_mesh":
            from sniffles_tpu.parallel.device_call import run_mesh_assign
            return run_mesh_assign(request.payload, request.meta)
        if request.kind == "combine_mesh":
            from sniffles_tpu.parallel.device_combine import run_mesh_combine
            return run_mesh_combine(request.payload, request.meta)
        if request.kind == "combine_greedy":
            # device-owned combine grouping (ops/combine_greedy): exact
            # while_loop emulation of the host greedy over a whole
            # (block, svtype)'s flushes
            from sniffles_tpu.ops.combine_greedy import run_combine_greedy
            return run_combine_greedy(request.payload, request.meta)
        if request.kind == "combine_greedy_task":
            # whole-task variant: one dispatch covers every flush of
            # every block of a (combine task, svtype), with per-segment
            # soundness flags (ops/combine_greedy.run_combine_greedy_task)
            from sniffles_tpu.ops.combine_greedy import run_combine_greedy_task
            return run_combine_greedy_task(request.payload, request.meta)
        if request.kind == "ed_batch":
            # payload: list of (a, b) string pairs (combine identity gate)
            from sniffles_tpu.ops.edit_distance_jax import edit_distance_batch
            return np.asarray(edit_distance_batch(request.payload))
        raise ValueError(f"unknown device request kind: {request.kind}")


class DeviceClient:
    """Worker-side proxy. ``post`` sends a DeviceRequest on the worker's
    task pipe and returns its id; ``wait`` blocks until the receive
    thread delivers the matching response. Multiple requests can be in
    flight (the decode-ahead prefetch posts the next task's batch while
    the current task computes), from any worker thread."""

    TIMEOUT = 600  # seconds; first-compile over a tunneled chip can be slow

    def __init__(self, conn, send_lock: threading.Lock = None):
        self._conn = conn
        self._send_lock = send_lock or threading.Lock()
        self._cv = threading.Condition()
        self._responses: dict[int, tuple] = {}   # req_id -> (response, t_arrived)
        self._abandoned: dict[int, float] = {}   # req_id -> t_abandoned
        self._post_t: dict[int, float] = {}
        self.last_latency: float = 0.0
        self._next_id = 1

    def degraded(self, threshold: float = 0.4) -> bool:
        """Circuit breaker: see DaemonClient.degraded."""
        return self.last_latency > threshold

    def deliver(self, response: DeviceResponse) -> None:
        """Called from the worker's pipe receive thread."""
        now = time.monotonic()
        with self._cv:
            t_post = self._post_t.pop(response.req_id, None)
            if t_post is not None:
                self.last_latency = now - t_post
            if self._abandoned.pop(response.req_id, None) is None:
                self._responses[response.req_id] = (response, now)
            # prune responses nobody will ever wait() for (a task that
            # errored or fell back after posting) — without this a
            # long-lived worker leaks ~300KB+ per orphaned payload
            for d in (self._responses, self._abandoned):
                stale = [rid for rid, v in d.items()
                         if now - (v[1] if isinstance(v, tuple) else v) > self.TIMEOUT]
                for rid in stale:
                    del d[rid]
            self._cv.notify_all()

    def discard(self, req_id: int) -> None:
        """Drop the response of a posted request the caller abandoned
        (fallback/error paths); a late arrival is dropped on delivery."""
        with self._cv:
            if self._responses.pop(req_id, None) is None:
                self._abandoned[req_id] = time.monotonic()

    def post(self, kind: str, payload, meta: dict) -> int:
        now = time.monotonic()
        with self._cv:
            req_id = self._next_id
            self._next_id += 1
            self._post_t[req_id] = now
            stale = [rid for rid, t in self._post_t.items()
                     if now - t > self.TIMEOUT]
            for rid in stale:
                del self._post_t[rid]
        with self._send_lock:
            self._conn.send(DeviceRequest(kind=kind, payload=payload,
                                          meta=meta, req_id=req_id))
        return req_id

    def wait(self, req_id: int, timeout: float = None) -> np.ndarray:
        timeout = timeout or self.TIMEOUT
        deadline = time.monotonic() + timeout
        with self._cv:
            while req_id not in self._responses:
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not self._cv.wait(timeout=remaining):
                    raise TimeoutError(f"device service did not answer request "
                                       f"{req_id} within {timeout}s")
            response, _ = self._responses.pop(req_id)
        if response.error is not None:
            raise RuntimeError(f"device service error: {response.error}")
        return response.payload

    def request(self, kind: str, payload, meta: dict) -> np.ndarray:
        return self.wait(self.post(kind, payload, meta))

    def cluster_assign(self, packed: np.ndarray, meta: dict) -> np.ndarray:
        return self.request("cluster_assign", packed, meta)

    def call_task(self, packed: np.ndarray, meta: dict) -> np.ndarray:
        return self.request("call_task", packed, meta)
