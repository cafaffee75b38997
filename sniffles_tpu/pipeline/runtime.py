"""
Host-side parallel runtime: worker process pool with heartbeat liveness,
dead-worker task requeue and memory-pressure recycling (reference:
parallel.py:585-807).

Design note: host workers only do BAM decode + host compute; JAX device
work stays in the parent process (a TPU client must not be forked).
The device batch pipeline (parallel/engine.py) is fed from the parent.
"""
from __future__ import annotations

import gc
import logging
import multiprocessing
import os
import threading
import time
from collections import deque
from typing import Union, Callable, TYPE_CHECKING

from sniffles_tpu.pipeline.result import Result, ErrorResult
from sniffles_tpu.pipeline.tasks import Task, ShutdownTask

if TYPE_CHECKING:
    from sniffles_tpu.config import SnifflesConfig

log = logging.getLogger(__name__)


class SnifflesWorker:
    """Handle for a worker process; exists in both parent and child after fork
    (reference: parallel.py:585-769)."""
    id: int
    externals: list = None
    recycle: bool = False
    running = True
    pid: int = None
    _shutdown: threading.Event
    _heartbeat: float = 0
    HEARTBEAT_INTERVAL = 3   # seconds
    HEARTBEAT_TIMEOUT = 10   # seconds

    class Shutdown(Exception):
        """Indicates this worker process should shut down."""

    def __init__(self, process_id: int, config: 'SnifflesConfig', tasks: deque,
                 recycle_hint: Union[bool, Callable] = None,
                 peers: list['SnifflesWorker'] = None):
        self.id = process_id
        self.config = config
        self.tasks = tasks
        self.task = None
        self.finished_tasks = []
        self.recycle = recycle_hint
        # Peer pool visibility: an idle worker only shuts down when no peer
        # has an in-flight task, so a dead peer's requeued task still finds
        # a live worker. (The reference shuts down on an empty deque,
        # parallel.py:673-676, and loses requeued tasks in that race —
        # sniffles:535-542 then warns and writes partial results.)
        self.peers = peers if peers is not None else []

        self.pipe_main, self.pipe_worker = multiprocessing.Pipe()
        self.heartbeat_main, self.heartbeat_worker = multiprocessing.Pipe()

        self.process = multiprocessing.Process(target=self.run_worker, daemon=True)

    def __str__(self):
        return f'Worker {self.id} @ process {self.pid}'

    def start(self) -> None:
        self.running = True
        self.process.start()
        self._heartbeat = time.monotonic()

    def maybe_recycle(self):
        """Recycle this worker if requested (reference: parallel.py:633-650)."""
        recycle = self.recycle(self.id, self.process.pid) if callable(self.recycle) else self.recycle

        if recycle:
            log.info(f'Recycling worker {self.id}')
            self.pipe_main.send(ShutdownTask())
            self.process.join(2)
            self.process = multiprocessing.Process(target=self.run_worker, daemon=True)
            self.process.start()
            self._heartbeat = time.monotonic()

    def run_parent(self) -> bool:
        """Parent-side poll step (reference: parallel.py:652-717)."""
        try:
            if self.task is None:
                if len(self.tasks) > 0:
                    self.maybe_recycle()
                    try:
                        self.task = self.tasks.popleft()
                    except IndexError:
                        log.debug(f'No more tasks to do for {self.id}')
                    else:
                        self.pipe_main.send(self.task)
                else:
                    peers_busy = any(p.task is not None for p in self.peers
                                     if p is not self and p.running)
                    if not peers_busy:
                        self.pipe_main.send(ShutdownTask())
                        self.running = False
            else:
                if self.pipe_main.poll(0.01):
                    result: Result = self.pipe_main.recv()

                    if result.error:
                        log.error(f'Worker {self.id} received error: {result}')

                    self.task.add_result(result)
                    self.finished_tasks.append(self.task)
                    self.task = None

                if self.heartbeat_main.poll():
                    self.heartbeat_main.recv()
                    self._heartbeat = time.monotonic()

                if self._heartbeat < time.monotonic() - self.HEARTBEAT_TIMEOUT:
                    log.debug(f'Worker {self.id} missed heartbeat!')
                    try:
                        self.process.join(0.2)
                    except Exception:
                        ...
                    if self.process.exitcode is not None:
                        log.warning(f'Worker {self.id}|{self.pid} found dead '
                                    f'(code {self.process.exitcode})!')
                        if self.task:
                            self.tasks.appendleft(self.task)
                        self.running = False
        except Exception:
            log.exception(f'Unhandled error in worker {self.id}. This may result in an '
                          f'orphaned worker process.')
            try:
                self.process.kill()
            except Exception:
                ...

        return self.running

    def finalize(self):
        self.process.join(10)

        if self.process.exitcode is None:
            log.warning(f'Worker {self.id} refused to shut down gracefully, killing it.')
            self.process.kill()
            self.process.join(2)

    def run_worker(self):
        """Worker-process main loop (reference: parallel.py:728-762)."""
        self.pid = os.getpid()
        self._shutdown = threading.Event()

        t = threading.Thread(target=self.run_worker_heartbeats, daemon=True)
        t.start()

        while self.running:
            task = self.pipe_worker.recv()

            try:
                result = task.execute(self)
            except self.Shutdown:
                self.running = False
                self._shutdown.set()
            except Exception:
                log.exception(msg := f'Error in worker process while executing {task}')
                self.pipe_worker.send(ErrorResult(msg))
            else:
                if result is not None:
                    self.pipe_worker.send(result)

            del task
            gc.collect()

        t.join(1.0)

    def run_worker_heartbeats(self):
        hb = 0
        while self.running:
            hb += 1
            self.heartbeat_worker.send(hb)
            self._shutdown.wait(self.HEARTBEAT_INTERVAL)


class SnifflesParentWorker(SnifflesWorker):
    """Runs all tasks inline in the main process (--threads 0; reference:
    parallel.py:777-807). This is also the mode in which tasks may use
    the JAX device pipeline directly."""
    id: int = 0

    def __init__(self, config: 'SnifflesConfig', tasks: deque, **kwargs):  # noqa
        self.tasks = tasks
        self.task = None
        self.config = config
        self.finished_tasks: list[Task] = []

    def start(self) -> None:
        ...

    def run_parent(self) -> bool:
        """Serial execution with decode-ahead: the next task's BAM scan
        (host/C++, GIL-releasing zlib/numpy) overlaps the current task's
        compute — the host/device overlap of SURVEY §7.3. Per-task NM
        statistics are snapshotted in Task.build_leadtab so the overlap
        does not perturb QC semantics."""
        import concurrent.futures

        tasks = list(self.tasks)
        count = len(tasks)
        can_prefetch = self.config.mode in ("call_sample", "genotype_vcf")

        with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
            next_fut = None
            for i, task in enumerate(tasks):
                log.info(f'Executing {task} ({i + 1}/{count})')
                if next_fut is not None:
                    try:
                        next_fut.result()
                    except Exception:
                        log.exception('Decode-ahead prefetch failed; task will decode inline')
                if can_prefetch and i + 1 < count:
                    next_fut = pool.submit(tasks[i + 1].build_leadtab)
                else:
                    next_fut = None
                result = task.execute(self)
                task.add_result(result)
                self.finished_tasks.append(task)
        self.tasks.clear()
        return False

    def finalize(self):
        ...
