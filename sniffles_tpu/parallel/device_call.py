"""
Device-backed candidate grouping for the production call path
(--tpu-call): the sort-and-segment clustering kernel assigns leads to
clusters on the device; Cluster objects are materialized from the
assignment and flow through the exact host call/QC/genotype chain
(sv.call_from onward), so output semantics are the host's.

This replaces the sequential merge sweep of cluster.resolve
(reference: cluster.py:219-353) for INS/DEL/DUP/INV; BND and
single-break types keep the host path (their resplit logic is
mate-geometry based and host-exact).
"""
from __future__ import annotations

import logging
import zlib

import numpy as np

from sniffles_tpu.cluster import Cluster, merge_inner, resplit, resplit_bnd
from sniffles_tpu.ops.clustering import SVTYPE_CODES, SVTYPE_NAMES

log = logging.getLogger(__name__)

# BND stage-1 merging (cluster_merge_bnd distance) runs on device; the
# mate-geometry resplit stays host-exact (reference: cluster.py:164-216).
_DEVICE_TYPES = ("INS", "DEL", "DUP", "INV", "BND")

# floor 8192: most tasks share ONE padded size, so a whole run compiles
# the fused step once (remote compile over a tunneled chip costs
# ~minutes per distinct shape; the kernel itself is sort-bound and
# near-free at this size). The warmup compile (device_service.py)
# targets exactly this shape.
DEVICE_BATCH_FLOOR = 8192


# packed batch rows (see pack_task_batch); every dispatch/warm site
# shapes its buffers from this
PACKED_ROWS = 15


def qname_hash31(qnames) -> np.ndarray:
    """Deterministic 31-bit read-name hash (zlib.crc32): stable across
    processes and PYTHONHASHSEED (the previous salted ``hash()`` made
    device support counts run-dependent), capped below INT32_MAX (the
    invalid-slot sentinel of the kernels' masked sorts). A collision
    between two distinct reads in one cluster would silently undercount
    ``support`` (the unique-read count, reference: sv.py:520); the
    consumption gate in device_clusters therefore verifies the device
    count against the host's unique-NAME count before consuming it."""
    n = len(qnames)
    arr = np.fromiter((zlib.crc32(q.encode()) for q in qnames),
                      dtype=np.int64, count=n)
    return np.minimum(arr & 0x7FFFFFFF, 0x7FFFFFFE).astype(np.int32)


def _hap_int(h) -> int:
    """Lead.hap ('0'/'1'/'2' or None) -> int; out-of-domain values map
    to -9 so the device's hp_other tally forces the exact host vote."""
    if h is None:
        return -9
    try:
        v = int(h)
    except (TypeError, ValueError):
        return -9
    return v if 0 <= v <= 2 else -9


# the full hap domain: any value outside these maps to -9 (== _hap_int)
_HAP_MAP = {"0": 0, "1": 1, "2": 2}


def _ps_int(p) -> int:
    """Lead.phase_set (str(ps) or "NULL"/None) -> int; -1 = NULL, -9 =
    out-of-domain (a negative or non-integer PS string is a legitimate
    VOTE VALUE host-side, not a NULL — the packer downgrades the lead's
    hap to -9 as well, so hp_other forces the exact host vote)."""
    if p is None or p == "NULL":
        return -1
    try:
        v = int(p)
    except (TypeError, ValueError):
        return -9
    return v if v >= 0 else -9


def padded_width(n: int) -> int:
    """Kernel batch width for a task with n signatures: the compile-once
    floor, then powers of two. Shared by every dispatch site so the wire
    payload can stay TRIMMED to n (the average task carries ~15% of the
    floor; shipping the zero padding through pickled sockets was a top
    per-request CPU cost) while the kernel still sees one of a handful
    of compiled shapes."""
    size = DEVICE_BATCH_FLOOR
    while size < n:
        size *= 2
    return size


def pad_packed(packed: np.ndarray) -> np.ndarray:
    """Zero-pad a trimmed (PACKED_ROWS, n) batch to its kernel width."""
    n = packed.shape[1]
    size = padded_width(n)
    if size == n:
        return packed
    out = np.zeros((packed.shape[0], size), dtype=np.int32)
    out[:, :n] = packed
    return out


def compress_call_response(flat: np.ndarray, padded_n: int) -> dict:
    """Wire-compact form of a call_task kernel result: only the valid
    elements (cluster_id, orig_idx — validity is implied) and the stats
    columns of real resplit children. The padded buffer is ~85% zeros
    for a typical task, and response pickling was symmetric with the
    request as a per-dispatch CPU cost. `nc` (= n_children) / `slots`
    carry the capacity check (device_clusters falls back to the host
    sweep when nc > slots)."""
    from sniffles_tpu.ops.clustering import (STATS_NC_ROW,
                                             split_call_task_output)
    elements, stats = split_call_task_output(flat, padded_n)
    valid = elements[2] != 0
    n_children = int(stats[STATS_NC_ROW][0])
    slots = stats.shape[1]
    keep = min(max(n_children, 1), slots)
    return {
        "nc": n_children,
        "slots": slots,
        "elems": np.ascontiguousarray(elements[:2, valid]),
        "stats": np.ascontiguousarray(stats[:STATS_NC_ROW, :keep]),
    }


def pack_task_batch(lead_provider, config, tr):
    """Flatten the leadtab (reference layout: leadprov.py:400-418) into
    the packed (10, size) int32 signature batch the call_task kernel
    consumes, plus the host-side context needed to materialize clusters
    from the kernel output. Returns None when the task has no
    device-eligible leads.

    Safe to run on a worker's decode-ahead thread: it only reads the
    already-built leadtab, so the request can be POSTED to the device
    service while the previous task's host compute is still running.
    """
    leads = []
    lead_bins = []
    for svtype in _DEVICE_TYPES:
        for bin_pos, bin_leads in lead_provider.leadtab[svtype].items():
            # seeds below the minimum never form clusters (cluster.py:262);
            # for INS the host counts only svlen-carrying leads (soft-clip
            # evidence is the leads_long side channel, cluster.py:231-235)
            if svtype == "INS":
                n_countable = sum(1 for ld in bin_leads if ld.svlen is not None)
            else:
                n_countable = len(bin_leads)
            if n_countable < config.dev_min_leads_cluster:
                continue
            for ld in bin_leads:
                if ld.svlen is None:
                    continue
                leads.append(ld)
                lead_bins.append(bin_pos)
    if not leads:
        return None

    n = len(leads)

    tr_sorted = sorted(tr) if tr else []
    tr_starts = np.array([s for s, e in tr_sorted], dtype=np.int64)
    tr_ends = np.array([e for s, e in tr_sorted], dtype=np.int64)

    # single packed (15, n) int32 buffer, TRIMMED to the real signature
    # count — the dispatch site pads to padded_width(n) so the kernel
    # compiles once, but the wire (pickled socket/pipe to the device
    # service or daemon) only carries real data. One H2D transfer per
    # task (transfer latency over a tunneled chip dominates kernel time
    # at task-sized batches, so the number of transfers is the cost that
    # matters). Rows: pos, svlen, svtype, orig_idx, repeat, valid,
    # strand, mapq, read_id (name hash — support = unique reads),
    # is_sa (split-read evidence), ref_end, qry_start, qry_end (the
    # merge_inner fold anchors, reference: cluster.py:105-119), hap,
    # ps (the phase-vote inputs, reference: postprocessing.py:626-654).
    packed = np.zeros((PACKED_ROWS, n), dtype=np.int32)
    packed[0, :n] = [ld.ref_start for ld in leads]
    packed[1, :n] = [ld.svlen for ld in leads]
    packed[2, :n] = [SVTYPE_CODES[ld.svtype] for ld in leads]
    packed[3, :n] = np.arange(n, dtype=np.int32)
    packed[5, :n] = 1
    packed[6, :n] = [1 if ld.strand == "+" else -1 for ld in leads]
    packed[7, :n] = [ld.mapq if ld.mapq is not None else 0 for ld in leads]
    packed[8, :n] = qname_hash31([ld.read_qname for ld in leads])
    packed[9, :n] = [ld.source != "INLINE" for ld in leads]
    packed[10, :n] = [ld.ref_end if ld.ref_end is not None else 0 for ld in leads]
    packed[11, :n] = [ld.qry_start if ld.qry_start is not None else 0 for ld in leads]
    packed[12, :n] = [ld.qry_end if ld.qry_end is not None else 0 for ld in leads]
    # hap/ps are STRINGS on the Lead ('0'/'1'/'2', str(ps) or "NULL");
    # encode: hap int (-9 for None/unparseable -> device hp_other ->
    # host phase fallback), ps int with -1 = NULL. Dict lookups memoize
    # the int parses (PS strings repeat massively within a task).
    ps_cache: dict = {None: -1, "NULL": -1}
    packed[13, :n] = [_HAP_MAP.get(ld.hap, -9) for ld in leads]
    packed[14, :n] = [ps_cache[p] if p in ps_cache
                      else ps_cache.setdefault(p, _ps_int(p))
                      for p in (ld.phase_set for ld in leads)]
    # out-of-domain ps: poison hap too so hp_other forces the host vote
    bad_ps = packed[14, :n] == -9
    if bad_ps.any():
        packed[13, :n][bad_ps] = -9
    if len(tr_starts):
        idx = np.searchsorted(tr_starts, packed[0, :n], side="right") - 1
        packed[4, :n] = ((idx >= 0) & (packed[0, :n] < tr_ends[np.clip(idx, 0, len(tr_ends) - 1)]))

    from sniffles_tpu.parallel.device_service import standard_call_meta
    return packed, standard_call_meta(config), leads, lead_bins


def pack_mesh_payload(pack, n_dev: int) -> dict:
    """Re-shard a single-device packed batch into n_dev contiguous genome
    windows for the multi-device assignment step (mesh.py
    build_sharded_assign). Each shard keeps the full padded width so one
    executable serves every task of a run."""
    packed, meta, leads, lead_bins = pack
    n = len(leads)
    size = padded_width(n)
    pos = packed[0, :n]
    lo = int(pos.min())
    span = max(int(pos.max()) - lo + 1, n_dev)
    window = -(-span // n_dev)
    shard_of = np.minimum((pos - lo) // window, n_dev - 1)

    shards = np.zeros((n_dev, packed.shape[0], size), dtype=np.int32)
    for shard in range(n_dev):
        sel = np.nonzero(shard_of == shard)[0]
        shards[shard, :, :len(sel)] = packed[:, sel]
    offsets = (lo + np.arange(n_dev, dtype=np.int32) * window).reshape(n_dev, 1)
    window_len = np.full((n_dev, 1), window, dtype=np.int32)
    return {"shards": shards, "offsets": offsets, "window_len": window_len,
            "n_dev": n_dev}


# halo width for the mesh assignment step: must exceed any cluster span +
# merge reach; doubled (same executable — W is a runtime value) on
# overflow before the caller falls back to the host path
MESH_HALO_BP = 5000
MESH_HALO_RETRIES = 3


def run_mesh_assign(payload: dict, meta: dict) -> np.ndarray:
    """Execute the sharded assignment step (in the process owning the JAX
    client: device server, daemon, or inline). Retries with doubled halo
    width when a shard reports overflow; raises if the bound still fails
    so the worker falls back to the exact host path (seam repair)."""
    import os
    if os.environ.get("SNIFFLES_TPU_MESH_FORCE_OVERFLOW"):
        # test hook: exercise the task-level host fallback path
        raise RuntimeError("mesh halo overflow (forced); host seam repair required")

    import jax
    import jax.numpy as jnp
    from sniffles_tpu.parallel import mesh as meshmod

    n_dev = int(payload["n_dev"])
    if len(jax.devices()) < n_dev:
        # a smaller mesh would shard_map a size-n_dev payload over fewer
        # devices and SILENTLY drop the excess shards' signatures
        raise RuntimeError(
            f"--tpu-mesh {n_dev} requested but only {len(jax.devices())} "
            f"device(s) visible; host fallback")
    mesh = meshmod.make_genome_mesh(n_dev)
    fn = _mesh_fn_cache.get((n_dev,) + tuple(sorted(meta.items())))
    if fn is None:
        fn = meshmod.build_sharded_assign(mesh, **meta)
        _mesh_fn_cache[(n_dev,) + tuple(sorted(meta.items()))] = fn

    shards = jnp.asarray(payload["shards"])
    offsets = jnp.asarray(payload["offsets"])
    window_len = jnp.asarray(payload["window_len"])
    window = int(payload["window_len"][0, 0])
    w = MESH_HALO_BP
    for _ in range(MESH_HALO_RETRIES):
        if 2 * w > window:
            # the halo is a ONE-HOP ppermute: its source zone
            # [my_end - 2W, my_end) must lie inside the sender's own
            # window, so W cannot widen past window/2 — beyond that the
            # exchange silently under-covers and only the host path is
            # exact
            break
        halo_w = jnp.full((n_dev, 1), w, dtype=jnp.int32)
        out = fn(shards, offsets, window_len, halo_w)
        # one batched device_get (a second separate fetch would pay its
        # own full tunnel round trip, ~25ms measured)
        import jax
        out = jax.device_get(out)
        if not bool(np.asarray(out["halo_overflow"]).any()):
            return np.asarray(out["rows"])
        w *= 2
    raise RuntimeError(f"mesh halo overflow at W={w}bp (shard window "
                       f"{window}bp); host seam repair required")


_mesh_fn_cache: dict = {}


def _rebuild_groups(cids: np.ndarray, ridx: np.ndarray) -> list:
    """(cluster_id, member_index_list) per cluster, ascending cluster id
    == (svtype, pos) sort order == the host sweep's cluster order (seed
    bins ascending per svtype). Members keep element order within a
    cluster (stable sort), matching the host's per-cluster lead order.
    Vectorized: the previous per-element Python zip over the padded
    batch was a top per-request CPU cost at production sizes."""
    if len(cids) == 0:
        return []
    order = np.argsort(cids, kind="stable")
    sc = cids[order]
    sr = ridx[order]
    bounds = np.flatnonzero(np.diff(sc)) + 1
    starts = np.concatenate(([0], bounds))
    uniq = sc[starts]
    members = np.split(sr, bounds)
    return [(int(c), m.tolist()) for c, m in zip(uniq, members)]


def _children_by_parent(stats: np.ndarray, n_children: int) -> dict:
    """Child-indexed stats block (call_task_packed rows: 0-17 calling
    stats + phase tallies, 18 parent cluster id, 19 resplit-ambiguity
    flag) -> {parent_cluster_id: [(stats18, uncertain), ...] in
    ascending child-id order}. Both the device resplit and the host's
    cluster.resplit order a parent's children by ascending svlen bin,
    so the k-th device child corresponds to the k-th host child."""
    from sniffles_tpu.ops.clustering import (STATS_PARENT_ROW,
                                             STATS_UNCERTAIN_ROW)
    out: dict[int, list] = {}
    k = min(max(n_children, 0), stats.shape[1])
    if k == 0:
        return out
    parents = stats[STATS_PARENT_ROW, :k].tolist()
    uncertain = stats[STATS_UNCERTAIN_ROW, :k].tolist()
    cols = stats[:18, :k].T.tolist()
    for parent, unc, col in zip(parents, uncertain, cols):
        out.setdefault(int(parent), []).append((tuple(col), bool(unc)))
    return out


def device_clusters(lead_provider, config, tr, device=None, posted=None,
                    counters=None):
    """
    Yield Cluster objects for INS/DEL/DUP/INV built from the device
    clustering assignment; the caller handles BND/single types with the
    host path.

    `counters`: optional dict accumulating the engine-stat consumption
    split per task — clusters_total, engine_consumed, and the fallback
    reasons (fb_bnd, fb_multi_fragment, fb_resplit) — reported via
    --dev-debug-log and asserted by the chip CI.

    `device`: a DeviceClient proxy when running inside a forked worker
    (the parent owns the TPU client and answers over the task pipe);
    None runs the kernel in-process (inline --threads 0 mode).
    `posted`: optional (req_id, pack) pair from a decode-ahead thread
    that already posted this task's batch to the device service; the
    round trip then overlaps the previous task's host compute.
    """
    mesh_n = int(getattr(config, "tpu_mesh", 0) or 0)
    # hedged dispatch: a tunneled chip occasionally stalls a response by
    # seconds (claim/queue turbulence); the exact host sweep costs only
    # tens of ms per task, so waiting past the hedge deadline is never
    # worth it — time out and let the task-level fallback run the host
    # path (byte-identical by construction). Disabled under
    # SNIFFLES_TPU_REQUIRE_DEVICE (chip CI asserts no fallbacks) and for
    # mesh payloads (multi-shard dispatch is legitimately slower).
    import os as _os
    hedge = (None if (_os.environ.get("SNIFFLES_TPU_REQUIRE_DEVICE")
                      or mesh_n > 1)
             else float(getattr(config, "dev_device_hedge_s", 3.0) or 0)
             or None)
    if (hedge is not None and device is not None
            and getattr(device, "degraded", lambda: False)()):
        # circuit breaker open: the last response round trip exceeded
        # the degradation threshold (shared-pool turbulence makes every
        # dispatch ~1s for minutes at a time) — fail FAST to the host
        # sweep instead of paying the full hedge per task. Responses of
        # hedged-away requests still record their latency on arrival,
        # so the breaker closes by itself when the pool recovers.
        hedge = 0.05
    if posted is not None:
        req_id, pack = posted
        if pack is None:
            return
        packed, meta, leads, lead_bins = pack
        try:
            out = device.wait(req_id, timeout=hedge)
        except TimeoutError:
            device.discard(req_id)
            raise RuntimeError(
                f"device response exceeded the {hedge}s hedge deadline; "
                f"host sweep takes over this task")
    else:
        pack = pack_task_batch(lead_provider, config, tr)
        if pack is None:
            return
        packed, meta, leads, lead_bins = pack
        if mesh_n > 1:
            payload = pack_mesh_payload(pack, mesh_n)
            out = (device.request("call_task_mesh", payload, meta)
                   if device is not None else run_mesh_assign(payload, meta))
        elif device is not None:
            req_id = device.post("call_task", packed, meta)
            try:
                out = device.wait(req_id, timeout=hedge)
            except TimeoutError:
                device.discard(req_id)
                raise RuntimeError(
                    f"device response exceeded the {hedge}s hedge deadline; "
                    f"host sweep takes over this task")
        else:
            import jax.numpy as jnp
            from sniffles_tpu.ops.clustering import call_task_packed
            out = np.asarray(call_task_packed(jnp.asarray(pad_packed(packed)),
                                              **meta))
    n = len(leads)
    repeat_flags = packed[4, :n] > 0

    child_stats = None
    if isinstance(out, dict):
        # wire-compact response (device service/daemon transport,
        # compress_call_response): valid (cluster_id, orig_idx) pairs
        # plus the real resplit children's stats columns
        if out["nc"] > out["slots"]:
            raise RuntimeError(
                f"device stats capacity exceeded ({out['nc']} children > "
                f"{out['slots']} slots); host sweep fallback")
        normalized = _rebuild_groups(out["elems"][0], out["elems"][1])
        child_stats = _children_by_parent(out["stats"], out["nc"])
    elif out.ndim == 3:
        # mesh output (parallel/mesh.py build_sharded_assign):
        # (n_dev, 13, N_ext) — normalize owned groups across shards and
        # restore the host's cluster order (svtype-major, then seed bin;
        # the exactly-once ownership guarantees each element appears
        # owned in exactly one shard)
        ordered = []
        for shard in range(out.shape[0]):
            rows = out[shard]
            shard_groups: dict[int, list[int]] = {}
            for cid, li, ok in zip(rows[0].tolist(), rows[1].tolist(),
                                   rows[2].tolist()):
                if ok:
                    shard_groups.setdefault(cid, []).append(li)
            for cid, member_idx in shard_groups.items():
                stats9 = tuple(int(rows[3 + r][cid]) for r in range(9))
                svcode = SVTYPE_CODES[leads[member_idx[0]].svtype]
                seed = min(lead_bins[i] for i in member_idx)
                ordered.append(((svcode, seed), member_idx, stats9))
        ordered.sort(key=lambda item: item[0])
        # mesh stats are PRE-resplit cluster stats (legacy 9-row form);
        # carried per entry, consumable only for single-child clusters
        normalized = [(None, m, s) for _, m, s in ordered]
    else:
        from sniffles_tpu.ops.clustering import (STATS_NC_ROW,
                                                 split_call_task_output)
        elements, dev_stats = split_call_task_output(out, padded_width(n))
        # the compacted stats block holds max(1024, N//8) child slots
        # (a ~4x D2H cut; see call_task_packed) — a task with more
        # resplit children than slots falls back to the exact host sweep
        n_children = int(dev_stats[STATS_NC_ROW][0])
        if n_children > dev_stats.shape[1]:
            raise RuntimeError(
                f"device stats capacity exceeded ({n_children} children > "
                f"{dev_stats.shape[1]} slots); host sweep fallback")
        valid = elements[2] != 0
        normalized = _rebuild_groups(elements[0][valid], elements[1][valid])
        child_stats = _children_by_parent(dev_stats, n_children)
    if child_stats is not None:
        normalized = [(cid, m, None) for cid, m in normalized]

    # leads_long per INS cluster: long-INS soft clips from the bins the
    # cluster's leads came from (reference: cluster.py:248-250)
    long_by_bin: dict[int, list] = {}
    for bin_pos, bin_leads in lead_provider.leadtab["INS"].items():
        longs = [ld for ld in bin_leads if ld.svlen is None]
        if longs:
            long_by_bin[bin_pos] = longs

    hap_ref = lead_provider.leadhapcount["REF"]

    for cid, member_idx, legacy_stats9 in normalized:
        cluster_leads = [leads[i] for i in member_idx]
        if len(cluster_leads) < config.dev_min_leads_cluster:
            continue
        svtype = cluster_leads[0].svtype
        bins = sorted({lead_bins[i] for i in member_idx})
        seed = bins[0]

        leads_long = None
        if svtype == "INS":
            leads_long = []
            for b in bins:
                leads_long.extend(long_by_bin.get(b, []))

        # host-exact hap counts: the SEED BIN's tallies on both the SV and
        # REF sides (reference semantics via _seed_clusters, cluster.py:238-244
        # — the sweep does not re-fold counts when absorbing neighbors), NOT
        # a recount over the merged cluster. rescue_phasing's in-phase ratio
        # (tasks.py) is computed from these, so a recount flips rescues.
        sv_h = lead_provider.leadhapcount[svtype].get(seed, (0, 0, 0))
        hp_counts = hap_ref.get(seed, [0, 0, 0])
        hap_counts_full = (sv_h[0], sv_h[1], sv_h[2],
                           hp_counts[0], hp_counts[1], hp_counts[2])

        within_repeat = any(repeat_flags[i] for i in member_idx)
        cluster = Cluster(
            id=f"CL.{svtype}.{lead_provider.contig}.{lead_provider.start}.D{seed}",
            svtype=svtype,
            contig=lead_provider.contig,
            start=seed,
            end=bins[-1] + config.cluster_binsize,
            seed=seed,
            leads=cluster_leads,
            repeat=within_repeat or config.repeat,
            leads_long=leads_long,
            hap_counts=hap_counts_full,
        )

        if svtype == "BND":
            # host-exact resplit by (mate contig, orientation, mate pos bin)
            if counters is not None:
                counters["clusters_total"] = counters.get("clusters_total", 0) + 1
                counters["fb_bnd"] = counters.get("fb_bnd", 0) + 1
            if config.dev_no_resplit:
                yield cluster
            else:
                yield from resplit_bnd(cluster, merge_threshold=config.cluster_merge_bnd)
            continue
        if counters is not None:
            counters["clusters_total"] = counters.get("clusters_total", 0) + 1

        # per-read inner merge of fragmented INS/DEL, host-exact
        # (reference: cluster.py:337-343)
        if svtype in ("INS", "DEL"):
            threshold = -1 if cluster.repeat else config.cluster_merge_pos
            merge_inner(cluster, threshold)

        # svlen-histogram resplit, host-exact and in reference order
        # (reference: cluster.py:330-339)
        if config.dev_no_resplit_repeat or config.dev_no_resplit:
            children = [cluster]
        else:
            children = list(resplit(cluster,
                                    prop=lambda lead: lead.svlen,
                                    binsize=config.cluster_resplit_binsize,
                                    merge_threshold_min=config.minsvlen,
                                    merge_threshold_frac=config.cluster_merge_len))
        if counters is not None:
            counters["children_total"] = \
                counters.get("children_total", 0) + len(children)

        # Device-computed calling statistics (integer-exact robust centers
        # and counts), computed on the device AFTER its merge_inner fold
        # and its svlen resplit — one stats column PER RESPLIT CHILD, so
        # multi-child clusters consume device stats too. The host still
        # materializes the merged Lead objects (seq concatenation, float
        # stdevs and downstream object paths need them), runs its own
        # exact resplit, and VERIFIES per child that the device produced
        # the same grouping before consuming the stats: child count per
        # parent, folded lead count, the int32-wrapping sum of folded
        # head positions, and the unique read-NAME count vs the device's
        # unique-hash `support` (a 31-bit collision would undercount it,
        # reference: sv.py:520) must all match — any divergence (or the
        # kernel's float32 resplit-ambiguity flag) falls back to the
        # exact host computation for the affected children.
        if legacy_stats9 is not None:
            # mesh path: pre-resplit 9-row cluster stats, no phase rows;
            # consumable only when resplit kept a single child
            dev_children = ([(tuple(legacy_stats9) + (0,) * 9, False)]
                            if len(children) == 1 else None)
        else:
            dev_children = child_stats.get(cid) if child_stats else None
            if dev_children is not None and len(dev_children) != len(children):
                dev_children = None
        if dev_children is None or any(unc for _, unc in dev_children):
            if counters is not None:
                counters["fb_resplit"] = \
                    counters.get("fb_resplit", 0) + len(children)
            yield from children
            continue

        for host_child, (st, _unc) in zip(children, dev_children):
            (raw_pos_center, svlen_center, support, lead_count, fwd, rev,
             sum_mapq, pos_sum, support_sa) = st[:9]
            phase_tally = st[9:18] if legacy_stats9 is None else None
            host_pos_sum = sum(ld.ref_start for ld in host_child.leads)
            fold_ok = (lead_count == len(host_child.leads)
                       and (host_pos_sum - pos_sum) % (1 << 32) == 0)
            support_ok = (fold_ok and support ==
                          len({ld.read_qname for ld in host_child.leads}))
            if fold_ok and support_ok:
                host_child.engine = {
                    "raw_pos_center": raw_pos_center,
                    "svlen_center": svlen_center,
                    "support": support,
                    "lead_count": lead_count,
                    "fwd": fwd,
                    "rev": rev,
                    "qual": sum_mapq // lead_count,
                    # DEL genotyper split-read support (reference:
                    # sv.py:580-581)
                    "support_sa": support_sa,
                    # phase-vote tallies (postprocess.phase_sv consumes
                    # these instead of iterating the leads; None -> host
                    # vote)
                    "phase": phase_tally,
                }
                if counters is not None:
                    counters["engine_consumed"] = \
                        counters.get("engine_consumed", 0) + 1
            elif counters is not None:
                key = "fb_support_collision" if fold_ok else "fb_multi_fragment"
                counters[key] = counters.get(key, 0) + 1
        yield from children
