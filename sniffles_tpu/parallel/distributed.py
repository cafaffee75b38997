"""
Multi-host initialization: jax.distributed bootstrap for pod-slice runs.

The reference is single-node (multiprocessing.Pipe, SURVEY §2.3); the
TPU-native equivalent is one Python driver per host, each owning its
local chips, joined through jax.distributed so the genome mesh in
parallel/mesh.py spans the slice and its psum/ppermute collectives ride
ICI within a host-block and DCN across hosts.

Usage (per host):
    from sniffles_tpu.parallel import distributed
    distributed.initialize()          # env-driven (JAX defaults or
                                      # SNIFFLES_TPU_COORDINATOR et al.)
    mesh = make_genome_mesh()         # now covers all hosts' devices

Contig task planning then assigns each host the contig shards whose
index % num_processes == process_index (deterministic, no coordinator
state), and VCF emission is performed by process 0 after an allgather
of per-shard call tensors.
"""
from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """
    Initialize jax.distributed when running multi-host. Parameters fall
    back to SNIFFLES_TPU_COORDINATOR / SNIFFLES_TPU_NUM_PROCESSES /
    SNIFFLES_TPU_PROCESS_ID, then to JAX's own autodetection (TPU pod
    metadata). Returns True when a multi-process runtime was set up.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("SNIFFLES_TPU_COORDINATOR")
    if num_processes is None and os.environ.get("SNIFFLES_TPU_NUM_PROCESSES"):
        num_processes = int(os.environ["SNIFFLES_TPU_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SNIFFLES_TPU_PROCESS_ID"):
        process_id = int(os.environ["SNIFFLES_TPU_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # single-host run or TPU pod with full autodetection
        try:
            jax.distributed.initialize()
        except Exception as e:
            log.debug(f"jax.distributed autodetection not applicable: {e}")
            return False
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)

    n = jax.process_count()
    if n > 1:
        log.info(f"Multi-host runtime: process {jax.process_index()}/{n}, "
                 f"{jax.local_device_count()} local / {jax.device_count()} global devices")
    return n > 1


def shard_assignment(n_shards: int) -> list[int]:
    """Deterministic host-ownership of genome shards: shard i belongs to
    process (i % process_count)."""
    import jax
    pi, pc = jax.process_index(), jax.process_count()
    return [i for i in range(n_shards) if i % pc == pi]


def is_emitter() -> bool:
    """Only process 0 writes VCF/SNF output files."""
    import jax
    return jax.process_index() == 0
