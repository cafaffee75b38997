import os

# Device tests run on a virtual 8-device CPU mesh. The environment pins
# JAX_PLATFORMS=axon (TPU tunnel) via sitecustomize, so the env var alone
# is not enough — force the platform through jax.config before any
# backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REF_DATA = "/root/reference/src/tests/data"


@pytest.fixture
def hg002_bam() -> str:
    return os.path.join(REF_DATA, "hg002.bam")


@pytest.fixture
def hg008_bam() -> str:
    return os.path.join(REF_DATA, "hg008.bam")
