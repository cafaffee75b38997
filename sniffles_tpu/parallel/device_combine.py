"""
Device-backed multi-sample candidate grouping for the production
combine path (--tpu-combine): the sort-and-segment grouping kernel
(ops/combine_groups) assigns candidates to groups on the device; SVGroup
objects are materialized from the assignment and flow through the exact
host group-calling chain (SVGroup.call), replacing the sequential greedy
assignment of cluster.resolve_block_groups (reference: cluster.py:356-390).

The INS sequence-identity gate (combine_pctseq, reference: sv.py:280-289)
is applied after grouping: members failing the gate against their
group's first candidate are evicted into their own groups.
"""
from __future__ import annotations

import logging

import numpy as np

from sniffles_tpu import svcall as sv
from sniffles_tpu.ops.clustering import SVTYPE_CODES

log = logging.getLogger(__name__)


def device_block_groups(svtype: str, svcands: list, groups_initial: list, config,
                        ed_cache=None) -> list:
    """
    Drop-in for cluster.resolve_block_groups with device grouping.

    Existing kept groups are represented by their first candidate so the
    kernel can merge ongoing frontier groups with new candidates; their
    accumulated members are re-attached afterwards.
    """
    import jax.numpy as jnp
    from sniffles_tpu.ops.combine_groups import group_candidates

    # Candidate rows: new candidates plus one representative per kept group
    rows = [(cand, None) for cand in svcands] + \
           [(g.candidates[0], g) for g in groups_initial]
    n = len(rows)
    if n == 0:
        return groups_initial

    size = 256
    while size < n:
        size *= 2

    cand_arrays = {
        "pos": np.zeros(size, dtype=np.int32),
        "svlen": np.zeros(size, dtype=np.int32),
        "svtype": np.zeros(size, dtype=np.int32),
        "sample_id": np.zeros(size, dtype=np.int32),
        "support": np.zeros(size, dtype=np.int32),
        "qc": np.zeros(size, dtype=bool),
        "valid": np.zeros(size, dtype=bool),
    }
    tcode = SVTYPE_CODES.get(svtype, 0)
    for i, (cand, _) in enumerate(rows):
        cand_arrays["pos"][i] = cand.pos
        cand_arrays["svlen"][i] = cand.svlen
        cand_arrays["svtype"][i] = tcode
        cand_arrays["sample_id"][i] = cand.sample_internal_id or 0
        cand_arrays["support"][i] = cand.support
        cand_arrays["qc"][i] = bool(cand.qc)
        cand_arrays["valid"][i] = True
    # row identity travels through the kernel's sorts via a unique key
    # recovered by (pos, svlen, sample, support) — attach explicit index
    # instead: reuse sample_id? Use a parallel lookup by sorting order.
    out = group_candidates({k: jnp.asarray(v) for k, v in cand_arrays.items()},
                           combine_match=float(config.combine_match),
                           combine_match_max=float(config.combine_match_max))

    gid = np.asarray(out["group_id"])
    valid = np.asarray(out["valid"])
    pos_s = np.asarray(out["pos"])
    len_s = np.asarray(out["svlen"])
    sam_s = np.asarray(out["sample_id"])
    sup_s = np.asarray(out["support"])

    # map sorted rows back to original candidates
    buckets: dict[tuple, list] = {}
    for i, (cand, keep_group) in enumerate(rows):
        key = (cand.pos, cand.svlen, cand.sample_internal_id or 0, cand.support)
        buckets.setdefault(key, []).append((cand, keep_group))

    assignment: dict[int, list] = {}
    for i in np.nonzero(valid)[0]:
        key = (int(pos_s[i]), int(len_s[i]), int(sam_s[i]), int(sup_s[i]))
        cand, keep_group = buckets[key].pop()
        assignment.setdefault(int(gid[i]), []).append((cand, keep_group))

    groups_out: list = []
    for gid_val in sorted(assignment):
        members = assignment[gid_val]
        # kept frontier groups absorb the new members of their device group
        kept = [kg for _, kg in members if kg is not None]
        news = [c for c, kg in members if kg is None]
        if kept:
            base = kept[0]
            # merge any additional kept groups the kernel united
            for extra in kept[1:]:
                for c in extra.candidates:
                    base.add_candidate(c)
                base.coverages_nonincluded.update(extra.coverages_nonincluded)
        elif news:
            news.sort(key=lambda c: c.support, reverse=True)
            base = sv.SVGroup.from_candidate(news.pop(0))
        else:
            continue

        for cand in sorted(news, key=lambda c: c.support, reverse=True):
            if config.combine_pctseq and svtype == "INS" and \
                    not base.align_call(cand, config.combine_pctseq, ed_cache):
                groups_out.append(sv.SVGroup.from_candidate(cand))
            else:
                base.add_candidate(cand)
        groups_out.append(base)
    return groups_out
