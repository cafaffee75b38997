"""
Worker-pool fault tolerance: heartbeat death detection with task
requeue, and memory-pressure recycling (reference: parallel.py:596-708,
633-650).
"""
import multiprocessing
import os
import time
from collections import deque
from dataclasses import dataclass, field

import pytest

from sniffles_tpu.pipeline.runtime import SnifflesWorker
from sniffles_tpu.pipeline.result import Result


@dataclass
class DummyConfig:
    run_id: str = "test"
    threads: int = 2
    mode: str = "call_sample"


@dataclass
class SimpleTask:
    id: int
    contig: str = "chr1"
    config: DummyConfig = field(default_factory=DummyConfig)
    result: object = None
    marker: str = ""

    def add_result(self, result):
        self.result = result

    def execute(self, worker=None):
        return Result(self, [], 0)


@dataclass
class CrashOnceTask(SimpleTask):
    """Kills its worker process on first execution; succeeds on retry."""

    def execute(self, worker=None):
        if not os.path.exists(self.marker):
            with open(self.marker, "w") as f:
                f.write("crashed")
            os._exit(17)
        return Result(self, [], 0)


def drive(workers, tasks, timeout=60):
    for w in workers:
        w.start()
    t0 = time.monotonic()
    while any([w.run_parent() for w in workers if w.running]):
        time.sleep(0.02)
        if time.monotonic() - t0 > timeout:
            raise TimeoutError("pool did not finish")
    finished = []
    for w in workers:
        w.finalize()
        finished.extend(w.finished_tasks)
    return finished


@pytest.fixture(autouse=True)
def _fork_method():
    try:
        multiprocessing.set_start_method("fork")
    except RuntimeError:
        pass


def test_pool_runs_tasks():
    config = DummyConfig()
    tasks = deque(SimpleTask(id=i) for i in range(6))
    workers = [SnifflesWorker(process_id=i, config=config, tasks=tasks) for i in range(2)]
    finished = drive(workers, tasks)
    assert sorted(t.id for t in finished) == list(range(6))
    assert all(t.result is not None and not t.result.error for t in finished)


def test_dead_worker_task_requeued(tmp_path):
    """A worker dying mid-task is detected by heartbeat timeout; the task
    is requeued and completed by a surviving worker."""
    config = DummyConfig()
    marker = str(tmp_path / "crash.marker")
    tasks = deque()
    tasks.append(CrashOnceTask(id=0, marker=marker))
    for i in range(1, 4):
        tasks.append(SimpleTask(id=i))
    workers = []
    for i in range(2):
        workers.append(SnifflesWorker(process_id=i, config=config, tasks=tasks,
                                      peers=workers))
    # speed the heartbeat timeout up for the test
    for w in workers:
        w.HEARTBEAT_TIMEOUT = 3

    finished = drive(workers, tasks, timeout=90)
    assert os.path.exists(marker)  # the crash really happened
    assert sorted(t.id for t in finished) == [0, 1, 2, 3]
    assert all(t.result is not None for t in finished)
    assert sum(1 for w in workers if not w.running) == 2


def test_worker_recycling():
    """A recycle hint replaces the worker process between tasks; all tasks
    still complete."""
    config = DummyConfig()
    recycled_pids = []

    calls = {"n": 0}

    def recycle_hint(worker_id, pid):
        calls["n"] += 1
        recycled_pids.append(pid)
        return calls["n"] == 2  # recycle exactly once, after warm-up

    tasks = deque(SimpleTask(id=i) for i in range(5))
    workers = [SnifflesWorker(process_id=0, config=config, tasks=tasks,
                              recycle_hint=recycle_hint)]
    finished = drive(workers, tasks, timeout=60)
    assert sorted(t.id for t in finished) == list(range(5))
    assert calls["n"] >= 2
