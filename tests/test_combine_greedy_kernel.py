"""Device combine greedy (ops/combine_greedy): the lax.while_loop must
reproduce the host's sequential greedy assignment trajectory EXACTLY —
evolving means, strict-improvement tie-breaks (earliest group wins),
sqrt-scaled match radius with the combine_match_max cap, and the
sequence-identity gate against the group head's alt (reference:
cluster.py:356-390, sv.py:262-313)."""
import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from sniffles_tpu.ops.combine_greedy import run_combine_greedy  # noqa: E402
from sniffles_tpu.ops.edit_distance import edit_distance  # noqa: E402


def host_greedy(cands, keeps, cm, cmm, limit, ed_lookup=None):
    """The host algorithm verbatim (float means, list-order ties), on
    plain tuples: cands = [(pos, len, alt)] in PROCESSING order; keeps =
    [(pos_mean, len_mean, n, head_alt)]. Returns assignment slots (slot
    < len(keeps): initial group; else creation order)."""
    groups = [{"pm": float(p), "lm": float(l), "n": n, "head": alt}
              for p, l, n, alt in keeps]
    assign = []
    for pos, ln, alt in cands:
        best, best_dist = None, math.inf
        for gi, g in enumerate(groups):
            dist = abs(g["pm"] - pos) + abs(g["lm"] - ln)
            shorter = float(min(g["lm"], ln))
            if (shorter > 0 and dist < best_dist
                    and dist <= cm * math.sqrt(shorter) and dist <= cmm):
                if limit:
                    if g["head"] == alt:
                        ok = 1.0 > limit
                    else:
                        d = (ed_lookup[(g["head"], alt)] if ed_lookup
                             else edit_distance(g["head"], alt))
                        ok = (g["lm"] - d) / g["lm"] > limit
                    if not ok:
                        continue
                best, best_dist = gi, dist
        if best is None:
            groups.append({"pm": float(pos), "lm": float(ln), "n": 1,
                           "head": alt})
            assign.append(len(groups) - 1)
        else:
            g = groups[best]
            g["pm"] = (g["pm"] * g["n"] + pos) / (g["n"] + 1)
            g["lm"] = (g["lm"] * g["n"] + ln) / (g["n"] + 1)
            g["n"] += 1
            assign.append(best)
    return assign


def run_device(cands, keeps, cm, cmm, limit, alts_universe=None):
    """Pack tuples the way tasks.py does (local coords, integer sums,
    alt-id table with radius-complete ED entries) and run the kernel."""
    base = min([p for p, _, _ in cands]
               + [kp for kp, _, _, _ in keeps]) if (cands or keeps) else 0
    base = int(base)
    alt_ids: dict = {}

    def aid(s):
        return alt_ids.setdefault(s, len(alt_ids))

    g_head = [aid(h) for _, _, _, h in keeps]
    c_alt = [aid(a) for _, _, a in cands]
    payload = {
        "c_pos": np.array([p - base for p, _, _ in cands], dtype=np.int32),
        "c_len": np.array([l for _, l, _ in cands], dtype=np.int32),
        "c_alt": np.array(c_alt, dtype=np.int32),
        # keeps carry integer sums: pos_mean*n etc. are exact here by
        # construction (tests build them from integer member sums)
        "g_psum": np.array([round((p - base) * n) for p, _, n, _ in keeps],
                           dtype=np.int32),
        "g_lsum": np.array([round(l * n) for _, l, n, _ in keeps],
                           dtype=np.int32),
        "g_n": np.array([n for _, _, n, _ in keeps], dtype=np.int32),
        "g_head": np.array(g_head, dtype=np.int32),
        "n_alts": len(alt_ids),
    }
    # full exact ED table over every distinct alt pair (head x cand)
    rows, cols, vals = [], [], []
    strings = {v: k for k, v in alt_ids.items()}
    for j, a_j in enumerate(c_alt):
        for h_id in set(list(alt_ids.values())):
            if h_id == a_j:
                continue
            rows.append(h_id)
            cols.append(j)
            vals.append(edit_distance(strings[h_id], strings[a_j]))
    payload["ed_rows"] = np.array(rows, dtype=np.int32)
    payload["ed_cols"] = np.array(cols, dtype=np.int32)
    payload["ed_vals"] = np.array(vals, dtype=np.int32)
    return run_combine_greedy(payload, {"cm": cm, "cmm": cmm, "limit": limit})


def test_basic_trajectory_matches_host():
    cands = [(1000, 100, "<DEL>"), (1010, 102, "<DEL>"), (5000, 100, "<DEL>"),
             (1004, 101, "<DEL>"), (5020, 400, "<DEL>"), (990, 99, "<DEL>")]
    out = run_device(cands, [], 250, 1000, 0.0)
    assert not out["flags"].any()
    assert out["assign"].tolist() == host_greedy(cands, [], 250, 1000, 0.0)


def test_initial_groups_and_tie_break():
    # two initial groups EQUIDISTANT from the candidate: the host keeps
    # the earliest group in list order (strict-improvement scan)
    keeps = [(1000, 100, 1, "<INS>"), (1020, 100, 1, "<INS>")]
    cands = [(1010, 100, "<INS>")]
    out = run_device(cands, keeps, 250, 1000, 0.0)
    assert not out["flags"].any()
    assert out["assign"].tolist() == [0] == host_greedy(cands, keeps, 250, 1000, 0.0)


def test_identity_gate_matches_host():
    rng = np.random.default_rng(7)

    def seq(n):
        return "".join(rng.choice(list("ACGT"), size=n))

    s1 = seq(120)
    s2 = s1[:40] + seq(40) + s1[80:]     # ~33% divergent: fails 0.7 gate
    s3 = s1[:115] + seq(5)               # ~4% divergent: passes
    cands = [(1000, 120, s1), (1004, 120, s2), (1008, 120, s3),
             (1002, 118, s2), (1001, 119, s1)]
    for limit in (0.0, 0.7, 0.95):
        out = run_device(cands, [], 250, 1000, limit)
        assert not out["flags"].any(), limit
        assert out["assign"].tolist() == host_greedy(cands, [], 250, 1000,
                                                     limit), limit


def test_greedy_fuzz_matches_host():
    """Randomized trajectories: clustered integer positions/lengths with
    frequent exact distance ties, evolving means crossing thresholds,
    initial frontier groups; device assignment must equal the host's on
    every seed."""
    for seed in range(40):
        rng = np.random.default_rng(2000 + seed)
        n_sites = int(rng.integers(2, 7))
        sites = [(int(rng.integers(0, 60_000)), int(rng.integers(50, 900)))
                 for _ in range(n_sites)]
        cands = []
        for _ in range(int(rng.integers(8, 60))):
            sp, sl = sites[int(rng.integers(0, n_sites))]
            cands.append((sp + int(rng.integers(-40, 41)),
                          max(20, sl + int(rng.integers(-10, 11))),
                          "<DEL>"))
        keeps = []
        for _ in range(int(rng.integers(0, 4))):
            sp, sl = sites[int(rng.integers(0, n_sites))]
            n = int(rng.integers(1, 5))
            # integer sums -> means may be non-integral rationals
            psum = sum(sp + int(rng.integers(-30, 31)) for _ in range(n))
            lsum = sum(max(20, sl + int(rng.integers(-8, 9)))
                       for _ in range(n))
            keeps.append((psum / n, lsum / n, n, "<DEL>"))
        order = list(rng.permutation(len(cands)))
        cands = [cands[i] for i in order]

        out = run_device(cands, keeps, 250, 1000, 0.0)
        assert not out["flags"][1:].any(), seed  # no ed-miss/overflow
        if out["flags"][0]:
            continue  # float-ambiguous probe: caller would fall back
        want = host_greedy(cands, keeps, 250, 1000, 0.0)
        assert out["assign"].tolist() == want, seed


def test_group_size_overflow_flags():
    cands = [(1000, 100, "<INS>")] * 8
    keeps = [(1000.0, 100.0, 1020, "<INS>")]   # near the NMAX=1024 bound
    out = run_device(cands, keeps, 250, 1000, 0.0)
    assert out["flags"][2] == 1  # n_overflow -> host fallback


def test_ed_miss_flags_fallback():
    from sniffles_tpu.ops.combine_greedy import run_combine_greedy as run
    payload = {
        "c_pos": np.array([0, 4], dtype=np.int32),
        "c_len": np.array([100, 100], dtype=np.int32),
        "c_alt": np.array([0, 1], dtype=np.int32),
        "g_psum": np.zeros(0, dtype=np.int32),
        "g_lsum": np.zeros(0, dtype=np.int32),
        "g_n": np.zeros(0, dtype=np.int32),
        "g_head": np.zeros(0, dtype=np.int32),
        "n_alts": 2,
        "ed_rows": np.zeros(0, dtype=np.int32),   # table EMPTY
        "ed_cols": np.zeros(0, dtype=np.int32),
        "ed_vals": np.zeros(0, dtype=np.int32),
    }
    out = run(payload, {"cm": 250, "cmm": 1000, "limit": 0.7})
    assert out["flags"][1] == 1  # ed_miss
