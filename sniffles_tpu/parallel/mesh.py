"""
Multi-chip execution: genome-bin data parallelism over a
jax.sharding.Mesh with XLA collectives.

The genome axis is sharded across devices ("genome" mesh axis): each
chip clusters and calls its own signature shard. Cross-shard work uses
collectives (SURVEY §2.3 TPU mapping):

  * psum over the mesh for global statistics (global mean coverage for
    the auto support threshold, regional NM mean — the reference's
    per-task coverage_average_total and average_regional_nm,
    parallel.py:126 / leadprov.py:577).
  * a ppermute halo exchange for clusters straddling shard boundaries:
    each shard sends its last-cluster summary to its right neighbor,
    which decides the merge and folds the counts into its first
    cluster; the accept decision returns by reverse ppermute and the
    sender invalidates its last cluster. This fixes the reference's
    dropped `externals` (leadprov.py:462-468) without host round-trips.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sniffles_tpu.parallel.engine import call_pipeline_step, default_params

GENOME_AXIS = "genome"


def make_genome_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (GENOME_AXIS,))


def _boundary_summary(out: dict) -> dict:
    """Summary of the shard's last valid cluster for the halo exchange."""
    ncl = out["n_clusters"]
    last = jnp.maximum(ncl - 1, 0)

    def pick(x):
        return jnp.take(x, last)

    return {
        "svtype": pick(out["svtype"]),
        "pos": pick(out["pos"]),
        "end": pick(out["end"]),
        "svlen": pick(out["svlen"]),
        "support": pick(out["support"]),
        "lead_count": pick(out["lead_count"]),
        "fwd": pick(out["fwd"]),
        "rev": pick(out["rev"]),
        "has_cluster": ncl > 0,
    }


def _merge_boundary(out: dict, incoming: dict, merge_dist: int) -> tuple[dict, jnp.ndarray]:
    """
    Decide whether the left neighbor's last cluster continues into this
    shard's first cluster; if so, fold its support counts in.
    Returns (updated out, accept flag for the sender).
    """
    first_type = out["svtype"][0]
    first_pos = out["pos"][0]
    has_local = out["n_clusters"] > 0

    same_type = incoming["svtype"] == first_type
    gap = first_pos - incoming["end"]
    accept = incoming["has_cluster"] & has_local & same_type & \
             (gap >= -merge_dist) & (gap <= merge_dist)

    def fold(field):
        return out[field].at[0].add(jnp.where(accept, incoming[field], 0))

    out = dict(out)
    out["support"] = fold("support")
    out["lead_count"] = fold("lead_count")
    out["fwd"] = fold("fwd")
    out["rev"] = fold("rev")
    return out, accept


def build_sharded_step(mesh: Mesh, params: dict | None = None,
                       halo_merge_dist: int = 1000):
    """
    Build the jitted multi-chip calling step: in/out sharded over the
    genome axis, with psum global stats and the boundary halo exchange.
    """
    if params is None:
        params = default_params()
    n_dev = mesh.devices.size

    def per_shard(sig: dict, coverage: jnp.ndarray, region_offset: jnp.ndarray) -> dict:
        # shard-local global stats -> mesh-wide via psum (ICI collective)
        local_cov_mean = jnp.mean(coverage.astype(jnp.float32))
        coverage_global = jax.lax.psum(local_cov_mean, GENOME_AXIS) / n_dev
        local_nm = jnp.sum(jnp.where(sig["valid"], sig["nm"], 0.0))
        local_nm_n = jnp.sum(sig["valid"].astype(jnp.float32))
        nm_global = (jax.lax.psum(local_nm, GENOME_AXIS)
                     / jnp.maximum(jax.lax.psum(local_nm_n, GENOME_AXIS), 1.0))

        p = dict(params)
        p["coverage_global"] = coverage_global
        p["qc_nm_threshold"] = nm_global

        out = call_pipeline_step(sig, coverage, p, region_offset=region_offset[0])

        # Halo exchange: send last-cluster summary rightward
        summary = _boundary_summary(out)
        right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        left = [((i + 1) % n_dev, i) for i in range(n_dev)]
        incoming = {k: jax.lax.ppermute(v[None] if v.ndim == 0 else v, GENOME_AXIS, right)
                    for k, v in summary.items()}
        incoming = {k: v.reshape(()) if v.size == 1 else v for k, v in incoming.items()}

        # shard 0 must not merge from the wrap-around sender
        my_idx = jax.lax.axis_index(GENOME_AXIS)
        incoming["has_cluster"] = incoming["has_cluster"] & (my_idx > 0)

        out, accept = _merge_boundary(out, incoming, halo_merge_dist)

        # return the accept flag to the sender; it invalidates its last cluster
        accept_back = jax.lax.ppermute(accept[None], GENOME_AXIS, left).reshape(())
        last = jnp.maximum(out["n_clusters"] - 1, 0)
        out["cluster_valid"] = out["cluster_valid"].at[last].set(
            out["cluster_valid"][last] & ~accept_back)

        out["coverage_global"] = jnp.broadcast_to(coverage_global, (1,))
        out["nm_global"] = jnp.broadcast_to(nm_global, (1,))
        # shard_map outputs need >= rank 1 to concatenate over the mesh axis
        out = {k: (v[None] if v.ndim == 0 else v) for k, v in out.items()}
        return out

    sig_spec = {k: P(GENOME_AXIS) for k in
                ("pos", "svlen", "svtype", "read_id", "strand", "mapq", "nm", "repeat", "valid")}

    sharded = jax.jit(
        jax.shard_map(per_shard, mesh=mesh,
                      in_specs=(sig_spec, P(GENOME_AXIS), P(GENOME_AXIS)),
                      out_specs=P(GENOME_AXIS),
                      check_vma=False))
    return sharded


def build_sharded_combine_step(mesh: Mesh, combine_match: float = 250.0,
                               combine_match_max: float = 1000.0,
                               halo_merge_dist: int = 1000):
    """
    Multi-sample combine over the mesh (BASELINE config 5 shape): each
    device groups the candidates of its genome-block shard
    (ops/combine_groups), global per-sample candidate totals reduce via
    psum, and boundary groups straddling shard seams are folded rightward
    via the same ppermute halo exchange as the call step — the
    collectives replacement for the host frontier carry-over
    (reference: parallel.py:519-566 groups_keep).
    """
    from sniffles_tpu.ops.combine_groups import group_candidates

    n_dev = mesh.devices.size

    def per_shard(cand: dict) -> dict:
        local_total = jnp.sum(cand["valid"].astype(jnp.int32))
        global_total = jax.lax.psum(local_total, GENOME_AXIS)

        out = group_candidates(cand, combine_match, combine_match_max)

        # halo exchange for the boundary group
        ncl = out["n_groups"]
        last = jnp.maximum(ncl - 1, 0)
        summary = {
            "svtype": jnp.take(out["svtype"], last),
            "pos": jnp.take(out["group_pos"], last),
            "svlen": jnp.take(out["group_svlen"], last),
            "count": jnp.take(out["group_count"], last),
            "sample_count": jnp.take(out["group_sample_count"], last),
            "has_group": ncl > 0,
        }
        right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        left = [((i + 1) % n_dev, i) for i in range(n_dev)]
        incoming = {k: jax.lax.ppermute(v[None], GENOME_AXIS, right).reshape(())
                    for k, v in summary.items()}
        my_idx = jax.lax.axis_index(GENOME_AXIS)
        incoming["has_group"] = incoming["has_group"] & (my_idx > 0)

        first_pos = out["group_pos"][0].astype(jnp.float32)
        first_len = jnp.abs(out["group_svlen"][0]).astype(jnp.float32)
        in_len = jnp.abs(incoming["svlen"]).astype(jnp.float32)
        dist = jnp.abs(first_pos - incoming["pos"].astype(jnp.float32)) + \
            jnp.abs(first_len - in_len)
        minlen = jnp.maximum(jnp.minimum(first_len, in_len), 1.0)
        accept = incoming["has_group"] & (ncl > 0) & \
            (incoming["svtype"] == out["svtype"][0]) & \
            (dist <= jnp.minimum(combine_match * jnp.sqrt(minlen), combine_match_max))

        out = dict(out)
        out["group_count"] = out["group_count"].at[0].add(
            jnp.where(accept, incoming["count"], 0))
        out["group_sample_count"] = out["group_sample_count"].at[0].add(
            jnp.where(accept, incoming["sample_count"], 0))
        accept_back = jax.lax.ppermute(accept[None], GENOME_AXIS, left).reshape(())
        group_valid = jnp.arange(out["group_id"].shape[0]) < ncl
        group_valid = group_valid.at[jnp.maximum(ncl - 1, 0)].set(
            group_valid[jnp.maximum(ncl - 1, 0)] & ~accept_back)
        out["group_valid"] = group_valid
        out["global_candidates"] = jnp.broadcast_to(global_total, (1,))
        out = {k: (v[None] if v.ndim == 0 else v) for k, v in out.items()}
        return out

    cand_spec = {k: P(GENOME_AXIS) for k in
                 ("pos", "svlen", "svtype", "sample_id", "support", "qc", "valid")}
    return jax.jit(jax.shard_map(per_shard, mesh=mesh, in_specs=(cand_spec,),
                                 out_specs=P(GENOME_AXIS), check_vma=False))


def shard_batch(batch_dict: dict, n_dev: int) -> dict:
    """Pad/replicate host arrays so the leading axis divides n_dev."""
    out = {}
    for k, v in batch_dict.items():
        n = v.shape[0]
        pad = (-n) % n_dev
        if pad:
            v = np.concatenate([v, np.zeros((pad,) + v.shape[1:], dtype=v.dtype)])
        out[k] = v
    return out
