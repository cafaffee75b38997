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

import numpy as np

from sniffles_tpu.cluster import Cluster, merge_inner, resplit_bnd
from sniffles_tpu.ops.clustering import SVTYPE_CODES, SVTYPE_NAMES

log = logging.getLogger(__name__)

# BND stage-1 merging (cluster_merge_bnd distance) runs on device; the
# mate-geometry resplit stays host-exact (reference: cluster.py:164-216).
_DEVICE_TYPES = ("INS", "DEL", "DUP", "INV", "BND")


def device_clusters(lead_provider, config, tr, device=None):
    """
    Yield Cluster objects for INS/DEL/DUP/INV built from the device
    clustering assignment; the caller handles BND/single types with the
    host path.

    `device`: a DeviceClient proxy when running inside a forked worker
    (the parent owns the TPU client and answers over the task pipe);
    None runs the kernel in-process (inline --threads 0 mode).
    """

    # Flatten the leadtab (reference layout: leadprov.py:400-418) into a
    # signature batch; leads_long (svlen None) stay host-side per bin.
    leads = []
    lead_bins = []
    for svtype in _DEVICE_TYPES:
        for bin_pos, bin_leads in lead_provider.leadtab[svtype].items():
            if len(bin_leads) < config.dev_min_leads_cluster and svtype != "INS":
                # seeds below the minimum never form clusters (cluster.py:262)
                continue
            for ld in bin_leads:
                if ld.svlen is None:
                    continue
                leads.append(ld)
                lead_bins.append(bin_pos)
    if not leads:
        return

    n = len(leads)
    size = 1024
    while size < n:
        size *= 2

    tr_sorted = sorted(tr) if tr else []
    tr_starts = np.array([s for s, e in tr_sorted], dtype=np.int64)
    tr_ends = np.array([e for s, e in tr_sorted], dtype=np.int64)

    # single packed (6, size) int32 buffer: rows pos, svlen, svtype,
    # read_id, repeat, valid — one H2D transfer per task (transfer
    # latency over a tunneled chip dominates kernel time at task-sized
    # batches, so the number of transfers is the cost that matters)
    packed = np.zeros((6, size), dtype=np.int32)
    packed[0, :n] = [ld.ref_start for ld in leads]
    packed[1, :n] = [ld.svlen for ld in leads]
    packed[2, :n] = [SVTYPE_CODES[ld.svtype] for ld in leads]
    packed[3, :n] = np.arange(n, dtype=np.int32)
    packed[5, :n] = 1
    if len(tr_starts):
        idx = np.searchsorted(tr_starts, packed[0, :n], side="right") - 1
        packed[4, :n] = ((idx >= 0) & (packed[0, :n] < tr_ends[np.clip(idx, 0, len(tr_ends) - 1)]))
    repeat_flags = packed[4, :n] > 0

    meta = dict(
        cluster_r=float(config.cluster_r),
        cluster_repeat_h=float(config.cluster_repeat_h),
        cluster_repeat_h_max=float(config.cluster_repeat_h_max),
        cluster_merge_bnd=int(config.cluster_merge_bnd),
        cluster_merge_len=float(config.cluster_merge_len),
        minsvlen=int(config.minsvlen),
        binsize=int(config.cluster_binsize),
        resplit_binsize=int(config.cluster_resplit_binsize),
    )
    if device is not None:
        out = device.cluster_assign(packed, meta)
    else:
        import jax.numpy as jnp
        from sniffles_tpu.ops.clustering import cluster_assign_packed
        out = np.asarray(cluster_assign_packed(jnp.asarray(packed), **meta))

    cids = out[0]
    ridx = out[1]   # original lead index, permuted with the sort
    valid = out[2]

    groups: dict[int, list[int]] = {}
    for cid, li, ok in zip(cids.tolist(), ridx.tolist(), valid.tolist()):
        if ok:
            groups.setdefault(cid, []).append(li)

    # leads_long per INS cluster: long-INS soft clips from the bins the
    # cluster's leads came from (reference: cluster.py:248-250)
    long_by_bin: dict[int, list] = {}
    for bin_pos, bin_leads in lead_provider.leadtab["INS"].items():
        longs = [ld for ld in bin_leads if ld.svlen is None]
        if longs:
            long_by_bin[bin_pos] = longs

    hap_ref = lead_provider.leadhapcount["REF"]

    for cid in sorted(groups):
        member_idx = groups[cid]
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

        sv0 = sv1 = sv2 = 0
        for ld in cluster_leads:
            hp = min(int(ld.hap), 2)
            if hp == 0:
                sv0 += 1
            elif hp == 1:
                sv1 += 1
            else:
                sv2 += 1
        hp_counts = hap_ref.get(seed, [0, 0, 0])
        hap_counts_full = (sv0, sv1, sv2, hp_counts[0], hp_counts[1], hp_counts[2])

        within_repeat = any(repeat_flags[i] for i in member_idx)
        cluster = Cluster(
            id=f"CL.{svtype}.{lead_provider.contig}.{lead_provider.start}.D{cid}",
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
            if config.dev_no_resplit:
                yield cluster
            else:
                yield from resplit_bnd(cluster, merge_threshold=config.cluster_merge_bnd)
            continue

        # per-read inner merge of fragmented INS/DEL, host-exact
        # (reference: cluster.py:337-343)
        if svtype in ("INS", "DEL"):
            threshold = -1 if cluster.repeat else config.cluster_merge_pos
            merge_inner(cluster, threshold)
        yield cluster
