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
  * a RAW-SIGNATURE halo exchange for clusters straddling shard
    boundaries: each shard ppermutes the signatures (and the coverage
    tail) of its last 2W bp to its right neighbor, which re-clusters
    and re-computes statistics/genotype/QC over the union — merged
    boundary clusters therefore carry exact full statistics, for every
    svtype, not folded summary counts. Exactly-once emission uses the
    same two-window ownership rule as the host combine scatter
    (pipeline/tasks.py CombineTask.clone): the left shard suppresses
    clusters touching its last W bp (the right neighbor owns them);
    the right shard ghost-drops halo clusters that never reach within
    W of its own start (the left neighbor owned those). This fixes the
    reference's dropped `externals` (leadprov.py:462-468) without host
    round-trips, and is exact whenever no single cluster spans more
    than W bp (halo_bp; overflowing halos are reported per shard in
    `halo_overflow` so callers can detect the bound being hit).
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


_SIG_FIELDS = ("pos", "svlen", "svtype", "read_id", "strand", "mapq", "nm",
               "repeat", "sa", "valid")


def build_sharded_step(mesh: Mesh, params: dict | None = None,
                       halo_bp: int = 5000, halo_slots: int = 256,
                       binsize: int = 100):
    """
    Build the jitted multi-chip calling step: in/out sharded over the
    genome axis, with psum global stats and the raw-signature halo
    exchange (module docstring).

    Contract: shard i's signatures lie in [offset_i, offset_i + L)
    where L is its coverage-window length; shards are contiguous along
    the genome.  Exactness bound: halo_bp must exceed the span of any
    single cluster plus the coverage probe reach; halo_slots bounds
    signatures within the last 2*halo_bp bp of a shard (`halo_overflow`
    reports when either is exceeded).
    """
    if params is None:
        params = default_params()
    n_dev = mesh.devices.size
    right = [(i, (i + 1) % n_dev) for i in range(n_dev)]

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

        my_idx = jax.lax.axis_index(GENOME_AXIS)
        cov_len = coverage.shape[0]
        my_start = region_offset[0]
        my_end = my_start + cov_len

        # ---- pack the outgoing halo: signatures in [my_end - 2W, my_end) ----
        W = halo_bp
        in_halo = sig["valid"] & (sig["pos"] >= my_end - 2 * W)
        # sort halo elements first (by pos), take halo_slots of them
        order = jnp.lexsort((sig["pos"], ~in_halo))
        halo_out = {k: jnp.take(v, order)[:halo_slots] for k, v in sig.items()}
        halo_out["valid"] = halo_out["valid"] & jnp.take(in_halo, order)[:halo_slots]
        halo_count = jnp.sum(in_halo.astype(jnp.int32))
        halo_overflow = halo_count > halo_slots

        # coverage tail for cross-boundary probe lookups
        cov_halo_len = 2 * W + 1024  # probe reach: updown_bins*binsize + slack
        cov_tail = jax.lax.dynamic_slice(coverage, (cov_len - cov_halo_len,),
                                         (cov_halo_len,))

        # ---- exchange rightward over ICI ----
        incoming = {k: jax.lax.ppermute(v, GENOME_AXIS, right)
                    for k, v in halo_out.items()}
        cov_in = jax.lax.ppermute(cov_tail, GENOME_AXIS, right)
        # shard 0 receives the wrap-around sender; mask it off
        incoming["valid"] = incoming["valid"] & (my_idx > 0)
        cov_in = jnp.where(my_idx > 0, cov_in, 0)

        # ---- extended batch: halo first, then own signatures ----
        ext = {k: jnp.concatenate([incoming[k], sig[k]]) for k in _SIG_FIELDS}
        ext_cov = jnp.concatenate([cov_in, coverage])
        ext_offset = my_start - cov_halo_len

        out = call_pipeline_step(ext, ext_cov, p, region_offset=ext_offset)

        # ---- exactly-once ownership (two-window rule) ----
        # left shard suppresses clusters touching its last W bp (unless it
        # is the rightmost shard); halo-zone clusters that never reach
        # within W of this shard's start belong to the left neighbor.
        touches_tail = out["pos_max"] >= my_end - W
        suppress_tail = touches_tail & (my_idx < n_dev - 1)
        ghost = out["pos_max"] < my_start - W
        out = dict(out)
        cluster_valid0 = out["cluster_valid"]
        out["cluster_valid"] = cluster_valid0 & ~suppress_tail & ~ghost
        # a cluster wider than W can straddle beyond the exchanged window;
        # report it so callers know the exactness bound was exceeded —
        # including on the SENDER for suppressed tail clusters (the
        # receiver only sees their truncated remainder) and for owned
        # clusters touching the received halo's truncation edge
        span_overflow = jnp.any((out["cluster_valid"]
                                 | (cluster_valid0 & suppress_tail))
                                & ((out["pos_max"] - out["pos_min"]) > W))
        span_overflow |= (jnp.any(out["cluster_valid"]
                                  & (out["pos_min"] < my_start - 2 * W + binsize))
                          & (my_idx > 0))
        out["halo_overflow"] = jnp.broadcast_to(halo_overflow | span_overflow, (1,))

        out["coverage_global"] = jnp.broadcast_to(coverage_global, (1,))
        out["nm_global"] = jnp.broadcast_to(nm_global, (1,))
        # shard_map outputs need >= rank 1 to concatenate over the mesh axis
        out = {k: (v[None] if v.ndim == 0 else v) for k, v in out.items()}
        return out

    sig_spec = {k: P(GENOME_AXIS) for k in _SIG_FIELDS}

    sharded = jax.jit(
        jax.shard_map(per_shard, mesh=mesh,
                      in_specs=(sig_spec, P(GENOME_AXIS), P(GENOME_AXIS)),
                      out_specs=P(GENOME_AXIS),
                      check_vma=False))
    return sharded


def build_sharded_assign(mesh: Mesh, *, cluster_r: float, cluster_repeat_h: float,
                         cluster_repeat_h_max: float, cluster_merge_bnd: int,
                         cluster_merge_len: float, minsvlen: int,
                         cluster_merge_pos: int = 150, global_repeat: bool = False,
                         binsize: int = 100, resplit_binsize: int = 20,
                         halo_slots: int = 512):
    """
    Multi-device version of the PRODUCTION --tpu-call kernel
    (ops/clustering.call_task_packed): stage-1 cluster assignment plus
    exact per-cluster calling statistics, sharded over the genome axis
    with the raw-signature halo exchange and two-window exactly-once
    ownership (module docstring). The host materializes Cluster objects
    from the gathered assignment exactly as in the single-device path
    (parallel/device_call.py), so output semantics stay host-exact —
    unlike the fused engine step, whose device-side resplit is a
    documented divergence on adversarial chains.

    Inputs (per shard): packed (13, S) int32 in call_task_packed row
    layout, region_offset (1,) int32 (window start), window_len (1,)
    int32, and halo_w (1,) int32 — the halo width W as a RUNTIME value,
    so an overflow retry with doubled W reuses the same executable.

    Output rows per shard (13, halo_slots + S):
      0 cluster_id (shard-local), 1 orig_idx, 2 owned_valid (element in
      a cluster this shard owns), 3-11 per-cluster stats rows as in
      call_task_packed, 12 cluster_owned (1 when this shard owns the
      cluster id). Plus halo_overflow (1,) per shard.

    Exactness bound: W must exceed every cluster span and 2W-zone
    signature count must fit halo_slots; `halo_overflow` reports either
    bound being hit so the caller can retry with doubled W or fall back
    to the host/single-device path.
    """
    from sniffles_tpu.ops.clustering import (_cluster_body, call_statistics,
                                             merge_inner_fold)
    from sniffles_tpu.ops.segments import seg_sum

    n_dev = mesh.devices.size
    right = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def per_shard(packed: jnp.ndarray, region_offset: jnp.ndarray,
                  window_len: jnp.ndarray, halo_w: jnp.ndarray) -> dict:
        # shard_map keeps the sharded leading axis (length 1 per shard)
        packed = packed[0]
        my_idx = jax.lax.axis_index(GENOME_AXIS)
        my_start = region_offset[0, 0]
        my_end = my_start + window_len[0, 0]
        W = halo_w[0, 0]

        pos = packed[0]
        valid = packed[5] > 0
        in_halo = valid & (pos >= my_end - 2 * W)
        order = jnp.lexsort((pos, ~in_halo))
        halo_out = jnp.take(packed, order, axis=1)[:, :halo_slots]
        halo_valid = (halo_out[5] > 0) & jnp.take(in_halo, order)[:halo_slots]
        halo_out = halo_out.at[5].set(halo_valid.astype(jnp.int32))
        halo_overflow = jnp.sum(in_halo.astype(jnp.int32)) > halo_slots

        incoming = jax.lax.ppermute(halo_out, GENOME_AXIS, right)
        # shard 0 receives the wrap-around sender; mask it off
        incoming = incoming.at[5].set(
            jnp.where(my_idx > 0, incoming[5], 0))

        ext = jnp.concatenate([incoming, packed], axis=1)

        zeros = jnp.zeros_like(ext[0])
        sig = {
            "pos": ext[0], "svlen": ext[1], "svtype": ext[2],
            "read_id": ext[8], "strand": ext[6], "mapq": ext[7],
            "nm": zeros.astype(jnp.float32),
            "repeat": ext[4] > 0, "valid": ext[5] > 0,
            "orig_idx": ext[3], "sa": ext[9],
            "ref_end": ext[10], "qry_start": ext[11], "qry_end": ext[12],
        }
        # The sweep's head-boundary freeze is a TASK-level quirk: it
        # applies to the svtype's task-globally FIRST cluster. That head
        # lives wherever the svtype's lowest-position element is — not
        # necessarily shard 0 (a svtype can be absent there) — and when
        # it sits inside a sender's 2W tail, the receiving neighbor
        # re-clusters it too and must freeze it identically. So: freeze
        # a svtype on every shard whose EXTENDED batch (own + incoming
        # halo) contains that svtype's global minimum position (pmin
        # over the mesh; min is idempotent, halo duplicates are safe).
        valid_ext = ext[5] > 0
        t_ext = jnp.where(valid_ext, jnp.clip(ext[2], 0, 6), 7)
        INT32_MAX = jnp.int32(2 ** 31 - 1)
        ext_min = jax.ops.segment_min(jnp.where(valid_ext, ext[0], INT32_MAX),
                                      t_ext, num_segments=8)
        gmin = jax.lax.pmin(ext_min, GENOME_AXIS)
        head_freeze_vec = (ext_min == gmin) & (ext_min < INT32_MAX)
        clustered = _cluster_body(
            sig, cluster_r=cluster_r, cluster_repeat_h=cluster_repeat_h,
            cluster_repeat_h_max=cluster_repeat_h_max,
            cluster_merge_bnd=cluster_merge_bnd,
            cluster_merge_len=cluster_merge_len, minsvlen=minsvlen,
            binsize=binsize, resplit_binsize=resplit_binsize,
            do_resplit=False, global_repeat=global_repeat,
            head_freeze=head_freeze_vec)
        folded = merge_inner_fold(clustered, cluster_merge_pos=cluster_merge_pos,
                                  global_repeat=global_repeat)
        stats = call_statistics(folded)

        n = clustered["pos"].shape[0]
        fcid = folded["cluster_id"]
        fvalid = folded["valid"]
        sum_mapq = seg_sum(jnp.where(fvalid, folded["mapq"], 0), fcid, n)
        pos_sum = seg_sum(jnp.where(fvalid, folded["pos"], 0), fcid, n)
        support_sa = seg_sum(jnp.where(fvalid & (folded["sa"] > 0), 1, 0), fcid, n)

        # two-window exactly-once ownership over PRE-fold cluster extents
        # (ownership and the halo-soundness checks reason about raw
        # signature positions; the fold only affects the calling stats)
        cid = clustered["cluster_id"]
        cvalid = clustered["valid"]
        from sniffles_tpu.ops.segments import seg_max as _seg_max, seg_min as _seg_min
        INT32_MIN = jnp.int32(-(2 ** 31))
        raw_pos_min = _seg_min(jnp.where(cvalid, clustered["pos"], INT32_MAX), cid, n)
        raw_pos_max = _seg_max(jnp.where(cvalid, clustered["pos"], INT32_MIN), cid, n)
        is_cluster = jnp.arange(n) < stats["n_clusters"]
        touches_tail = raw_pos_max >= my_end - W
        suppress_tail = touches_tail & (my_idx < n_dev - 1)
        ghost = raw_pos_max < my_start - W
        cluster_owned = is_cluster & ~suppress_tail & ~ghost
        span = raw_pos_max - raw_pos_min
        # invariant violations must ALWAYS force the retry/host path:
        # (a) a suppressed tail cluster whose visible span already
        #     exceeds W gets truncated at the receiver's 2W halo edge,
        #     where its remaining span can look legal — flag it on the
        #     sender, where the overflow is visible;
        # (b) an owned cluster whose pos_min touches the first seed bin
        #     of the received halo window may extend past the truncation
        #     edge the sender could not see — treat edge contact as
        #     overflow (false positives only cost a doubled-W retry,
        #     which moves the edge away and converges).
        span_overflow = jnp.any((cluster_owned | (is_cluster & suppress_tail))
                                & (span > W))
        trunc_edge = my_start - 2 * W + binsize
        span_overflow |= (jnp.any(cluster_owned & (raw_pos_min < trunc_edge))
                          & (my_idx > 0))

        owned_valid = cvalid & jnp.take(cluster_owned, jnp.clip(cid, 0, n - 1))

        out_rows = jnp.stack([
            cid.astype(jnp.int32),
            clustered["orig_idx"].astype(jnp.int32),
            owned_valid.astype(jnp.int32),
            stats["raw_pos_center"],
            stats["svlen"],
            stats["support"].astype(jnp.int32),
            stats["lead_count"].astype(jnp.int32),
            stats["fwd"].astype(jnp.int32),
            stats["rev"].astype(jnp.int32),
            sum_mapq.astype(jnp.int32),
            pos_sum.astype(jnp.int32),
            support_sa.astype(jnp.int32),
            cluster_owned.astype(jnp.int32),
        ])
        return {
            "rows": out_rows[None],     # rank+1 for the mesh axis concat
            "halo_overflow": jnp.broadcast_to(halo_overflow | span_overflow, (1,)),
        }

    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(GENOME_AXIS), P(GENOME_AXIS), P(GENOME_AXIS), P(GENOME_AXIS)),
        out_specs=P(GENOME_AXIS),
        check_vma=False))


_CAND_FIELDS = ("pos", "svlen", "svtype", "sample_id", "support", "qc", "valid",
                "orig_idx")


def build_sharded_combine_step(mesh: Mesh, combine_match: float = 250.0,
                               combine_match_max: float = 1000.0,
                               halo_slots: int = 256,
                               safe_cut_only: bool = False,
                               binsize: int = 100):
    """
    Multi-sample combine over the mesh (BASELINE config 5 shape): each
    device groups the candidates of its genome-block shard
    (ops/combine_groups) and global per-sample candidate totals reduce
    via psum. Boundary groups use the same RAW-candidate halo exchange
    as the call step: candidates within 2*halo_w of a shard's end
    ppermute rightward, the right neighbor re-groups over the union
    (exact medians/counts, not folded summaries), and the two-window
    ownership rule keeps emission exactly-once — the collectives
    replacement for the host frontier carry-over (reference:
    parallel.py:519-566 groups_keep). Shards must be contiguous
    genome windows; `region_offset`/`window_len` define them. The halo
    width is a RUNTIME input (halo_w, per shard) so an overflow retry
    with doubled W reuses the same executable.

    safe_cut_only=True builds the byte-exact production segmentation
    (cuts only at greedy-impermeable gaps; see
    ops/combine_groups.group_candidates) used by the mesh combine CLI
    path, which runs the exact host greedy per gathered segment.
    """
    from sniffles_tpu.ops.combine_groups import group_candidates

    n_dev = mesh.devices.size
    right = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def per_shard(cand: dict, region_offset: jnp.ndarray,
                  window_len: jnp.ndarray, halo_w: jnp.ndarray) -> dict:
        local_total = jnp.sum(cand["valid"].astype(jnp.int32))
        global_total = jax.lax.psum(local_total, GENOME_AXIS)

        my_idx = jax.lax.axis_index(GENOME_AXIS)
        my_start = region_offset[0]
        my_end = my_start + window_len[0]
        W = halo_w[0]

        in_halo = cand["valid"] & (cand["pos"] >= my_end - 2 * W)
        order = jnp.lexsort((cand["pos"], ~in_halo))
        halo_out = {k: jnp.take(v, order)[:halo_slots] for k, v in cand.items()}
        halo_out["valid"] = halo_out["valid"] & jnp.take(in_halo, order)[:halo_slots]
        halo_overflow = jnp.sum(in_halo.astype(jnp.int32)) > halo_slots

        incoming = {k: jax.lax.ppermute(v, GENOME_AXIS, right)
                    for k, v in halo_out.items()}
        incoming["valid"] = incoming["valid"] & (my_idx > 0)

        ext = {k: jnp.concatenate([incoming[k], cand[k]]) for k in _CAND_FIELDS
               if k in cand}
        out = group_candidates(ext, combine_match, combine_match_max,
                               safe_cut_only=safe_cut_only)

        # exactly-once ownership over element extents (two-window rule)
        n_ext = out["pos"].shape[0]
        gid = out["group_id"]
        valid = out["valid"]
        INT32_MIN = jnp.int32(-(2 ** 31))
        pos_max = jax.ops.segment_max(jnp.where(valid, out["pos"], INT32_MIN),
                                      gid, num_segments=n_ext)
        suppress_tail = (pos_max >= my_end - W) & (my_idx < n_dev - 1)
        ghost = pos_max < my_start - W
        is_group = jnp.arange(n_ext) < out["n_groups"]
        group_valid = is_group & ~suppress_tail & ~ghost
        pos_min = jax.ops.segment_min(
            jnp.where(valid, out["pos"], jnp.int32(2 ** 31 - 1)), gid,
            num_segments=n_ext)
        # sender-side check for suppressed tail groups + receiver-side
        # truncation-edge sentinel (same soundness argument as the call
        # step above; `binsize` widens the edge zone with the configured
        # screening bin so non-default --cluster-binsize keeps the
        # guarantee): violations always force the caller's fallback
        span_overflow = jnp.any((group_valid | (is_group & suppress_tail))
                                & ((pos_max - pos_min) > W))
        span_overflow |= (jnp.any(group_valid
                                  & (pos_min < my_start - 2 * W + binsize))
                          & (my_idx > 0))

        out = dict(out)
        out["group_valid"] = group_valid
        out["halo_overflow"] = jnp.broadcast_to(halo_overflow | span_overflow, (1,))
        out["global_candidates"] = jnp.broadcast_to(global_total, (1,))
        out = {k: (v[None] if v.ndim == 0 else v) for k, v in out.items()}
        return out

    built: dict = {}

    def run(cand: dict, region_offset, window_len, halo_w):
        # specs depend on which provenance columns the caller shipped
        # (orig_idx is optional); build/cache one executable per keyset
        keys = tuple(sorted(cand.keys()))
        fn = built.get(keys)
        if fn is None:
            cand_spec = {k: P(GENOME_AXIS) for k in keys}
            fn = jax.jit(jax.shard_map(
                per_shard, mesh=mesh,
                in_specs=(cand_spec, P(GENOME_AXIS), P(GENOME_AXIS),
                          P(GENOME_AXIS)),
                out_specs=P(GENOME_AXIS), check_vma=False))
            built[keys] = fn
        return fn(cand, region_offset, window_len, halo_w)

    return run


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
