"""Chip test suite: runs on the REAL TPU (axon tunnel), unlike tests/
which pins JAX_PLATFORMS=cpu for the virtual 8-device mesh.

Run with:  python -m pytest tests_tpu/ -q
Every test here skips cleanly when no TPU backend is reachable.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DATA = "/root/reference/src/tests/data"


def _tpu_available() -> bool:
    try:
        import jax
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if not _tpu_available():
        skip = pytest.mark.skip(reason="no TPU backend reachable")
        for item in items:
            item.add_marker(skip)


@pytest.fixture
def hg008_bam() -> str:
    return os.path.join(REF_DATA, "hg008.bam")
