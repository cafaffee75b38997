"""
Packing and replay glue for the device-owned combine greedy
(ops/combine_greedy): one kernel dispatch covers every flush of a
(block, svtype), and the host replays the returned assignment through
the real SVGroup objects so all downstream float statistics, frontier
closure decisions, QC and emission order are the host's own.

Why whole-block batching is exact: the host removes frontier-closed
groups from the active list between flushes, while the device keeps
every group probe-able. A closed group's pos_mean trails the current
bin by at least combine_overlap_abs (the frontier rule, reference:
parallel.py:553-557), and every later candidate lies in a strictly
later bin, so its position distance alone exceeds combine_match_max
whenever ``combine_match_max < combine_overlap_abs`` (guarded below) —
the argmin can never select a closed group, making the device's
keep-everything view equivalent. Closure itself is decided during
replay from host-exact float means.

Reference analogue: the combine hot loop, parallel.py:444-566 +
cluster.py:356-390.
"""
from __future__ import annotations

import logging

import numpy as np

from sniffles_tpu import svcall as sv
from sniffles_tpu.ops.combine_greedy import CMM_MAX, NMAX, SPAN_MAX

log = logging.getLogger(__name__)

# alt sequences longer than this keep pairs out of the ED table (a probe
# on such a pair raises ed_miss -> host fallback); matches the device ED
# batch economics
ED_MAX_LEN = 4095
# head-candidate radius for table completeness: a group's mean drifts
# from its head by at most ~combine_match_max * ln(group size); probes
# outside the packed radius flag ed_miss and fall back (exact, rare)
ED_RADIUS_FACTOR = 4.0


def _bump(counters, key, d=1):
    if counters is not None:
        counters[key] = counters.get(key, 0) + d


def pack_block_assignments(svtype, flushes, keep, config, counters=None,
                           device=None):
    """Build the kernel payload for all flushes of one (block, svtype)
    and dispatch it. Returns a replay context dict, or None when a
    guard fails or the kernel raises a soundness flag (the caller runs
    the exact host greedy per flush instead).

    flushes: [(batch, curr_bin, span)] in block order; batch lists keep
    SNF arrival order (the host's tie-break domain).
    keep: the frontier SVGroup list at block entry (dispatch slot order).
    """
    if svtype == "BND" or getattr(config, "combine_separate_intra", False):
        return None
    cmm = int(config.combine_match_max)
    if not (0 < cmm <= CMM_MAX and cmm < int(config.combine_overlap_abs)):
        _bump(counters, "combine_greedy_guard_fallbacks")
        return None

    total = sum(len(batch) for batch, _, _ in flushes)
    if total < int(getattr(config, "dev_combine_greedy_min", 8) or 0):
        return None

    # processing order: flush-major, support-descending stable within a
    # flush (reference: cluster.py:361) — precomputable because flush
    # boundaries depend only on candidate counts, never on grouping
    per_flush_cands = [sorted(batch, key=lambda c: c.support, reverse=True)
                       for batch, _, _ in flushes]
    cands = [c for fc in per_flush_cands for c in fc]

    positions = [c.pos for c in cands]
    lens = []
    for c in cands:
        if c.svlen is None:
            _bump(counters, "combine_greedy_guard_fallbacks")
            return None
        lens.append(abs(int(c.svlen)))
    keep_members = [cc.pos for g in keep for cc in g.candidates]
    all_pos = positions + keep_members
    base = min(all_pos)
    if (max(all_pos) - base >= SPAN_MAX or (lens and max(lens) >= SPAN_MAX)
            or any(len(g.candidates) > NMAX for g in keep)):
        _bump(counters, "combine_greedy_guard_fallbacks")
        return None

    alt_ids: dict = {}

    def aid(s):
        return alt_ids.setdefault(s, len(alt_ids))

    g_head = np.array([aid(g.candidates[0].alt) for g in keep], dtype=np.int32)
    c_alt = np.array([aid(c.alt) for c in cands], dtype=np.int32)

    payload = {
        "c_pos": np.array(positions, dtype=np.int32) - base,
        "c_len": np.array(lens, dtype=np.int32),
        "c_alt": c_alt,
        # exact integer sums (the true rationals behind the host's float
        # running means) — recomputed from members, never from floats
        "g_psum": np.array([sum(cc.pos - base for cc in g.candidates)
                            for g in keep], dtype=np.int32),
        "g_lsum": np.array([sum(abs(int(cc.svlen)) for cc in g.candidates)
                            for g in keep], dtype=np.int32),
        "g_n": np.array([len(g.candidates) for g in keep], dtype=np.int32),
        "g_head": g_head,
        "n_alts": len(alt_ids),
    }

    limit = float(config.combine_pctseq or 0.0)
    rows = cols = vals = np.zeros(0, dtype=np.int32)
    if limit > 0 and svtype == "INS":
        table = _build_ed_table(cands, keep, alt_ids, c_alt, g_head,
                                base, cmm, device)
        if table is None:
            _bump(counters, "combine_greedy_guard_fallbacks")
            return None
        rows, cols, vals = table
    payload["ed_rows"], payload["ed_cols"], payload["ed_vals"] = rows, cols, vals

    meta = {"cm": int(config.combine_match), "cmm": cmm, "limit": limit}
    _bump(counters, "combine_greedy_dispatches")
    _bump(counters, "combine_greedy_candidates", total)
    if device is not None:
        out = device.request("combine_greedy", payload, meta)
    else:
        from sniffles_tpu.ops.combine_greedy import run_combine_greedy
        out = run_combine_greedy(payload, meta)
    if out["flags"].any():
        _bump(counters, "combine_greedy_flag_fallbacks")
        log.debug(f"device combine greedy flags {out['flags'].tolist()} "
                  f"({svtype}, {total} candidates); host greedy fallback")
        return None

    assign = out["assign"].tolist()
    per_flush = []
    k = 0
    for fc in per_flush_cands:
        per_flush.append(list(zip(fc, assign[k:k + len(fc)])))
        k += len(fc)
    return {"per_flush": per_flush, "slots": list(keep), "closed": set(),
            "n_keep": len(keep)}


def _build_ed_table(cands, keep, alt_ids, c_alt, g_head, base, cmm, device):
    """Exact edit distances for every (potential head alt, candidate)
    pair the greedy might probe, radius-gated around head positions.
    Returns (rows, cols, vals) or None when inputs are untabulable."""
    n_c = len(cands)
    c_pos = np.array([c.pos - base for c in cands], dtype=np.int64)
    c_len = np.array([abs(int(c.svlen)) for c in cands], dtype=np.int64)
    h_pos = np.concatenate([
        np.array([int(g.pos_mean) - base for g in keep], dtype=np.int64),
        c_pos])
    h_len = np.concatenate([
        np.array([int(abs(g.len_mean)) for g in keep], dtype=np.int64),
        c_len])
    h_aid = np.concatenate([g_head, c_alt])

    radius = ED_RADIUS_FACTOR * cmm
    gap = (np.abs(h_pos[:, None] - c_pos[None, :])
           + np.abs(h_len[:, None] - c_len[None, :]))
    need = (gap <= radius) & (h_aid[:, None] != c_alt[None, :])
    hi, ci = np.nonzero(need)

    strings = {v: k for k, v in alt_ids.items()}
    pair_keys = {}
    entries = []
    for h, c in zip(hi.tolist(), ci.tolist()):
        a = strings[int(h_aid[h])]
        b = strings[int(c_alt[c])]
        if not isinstance(a, str) or not isinstance(b, str) or not a or not b:
            continue  # probe would be a host crash; leave missing
        if len(a) > ED_MAX_LEN or len(b) > ED_MAX_LEN:
            continue  # too long to tabulate; ed_miss -> fallback if probed
        key = (a, b)
        pair_keys.setdefault(key, len(pair_keys))
        entries.append((int(h_aid[h]), c, key))
    if not pair_keys:
        return (np.zeros(0, dtype=np.int32),) * 3

    pairs = list(pair_keys)
    if device is not None:
        from sniffles_tpu.ops.edit_distance_jax import DEVICE_MIN_CELLS
        cells = sum(len(a) * len(b) for a, b in pairs)
        if cells >= DEVICE_MIN_CELLS:
            dists = device.request("ed_batch", pairs, {})
        else:
            from sniffles_tpu.ops.edit_distance_jax import edit_distance_batch
            dists = edit_distance_batch(pairs)
    else:
        from sniffles_tpu.ops.edit_distance_jax import edit_distance_batch
        dists = edit_distance_batch(pairs)
    dist_of = {p: int(d) for p, d in zip(pairs, dists)}

    # dedup (alt_id, cand) entries (several heads share an alt id)
    seen = set()
    rows, cols, vals = [], [], []
    for h_id, c, key in entries:
        if (h_id, c) in seen:
            continue
        seen.add((h_id, c))
        rows.append(h_id)
        cols.append(c)
        vals.append(dist_of[key])
    return (np.array(rows, dtype=np.int32), np.array(cols, dtype=np.int32),
            np.array(vals, dtype=np.int32))


def replay_flush(ctx, fi, keep):
    """Apply flush fi's device assignment through the real SVGroup
    objects: slot < n_keep-at-dispatch (or an earlier creation) ->
    add_candidate on that group; next fresh slot -> from_candidate.
    Returns the evolving active list in the host greedy's output order
    (keep order, then creation order). The caller marks frontier-closed
    groups via ctx["closed"] so an (impossible, see module doc)
    assignment to one fails loudly instead of corrupting state."""
    groups = keep
    slots = ctx["slots"]
    for cand, slot in ctx["per_flush"][fi]:
        if slot < len(slots):
            g = slots[slot]
            if id(g) in ctx["closed"]:
                raise RuntimeError(
                    "device combine greedy matched a frontier-closed group "
                    "(combine_match_max/overlap guard violated)")
            g.add_candidate(cand)
        else:
            if slot != len(slots):
                raise RuntimeError(
                    f"device combine greedy slot gap ({slot} vs {len(slots)})")
            g = sv.SVGroup.from_candidate(cand)
            slots.append(g)
            groups.append(g)
    return groups
