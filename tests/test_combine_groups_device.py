"""Device multi-sample candidate grouping vs the exact host greedy
routine on well-separated variants."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sniffles_tpu.ops.combine_groups import group_candidates  # noqa: E402
from sniffles_tpu.ops.clustering import SVTYPE_CODES  # noqa: E402


def make_candidates(rng, n_sites=40, n_samples=6, genome=5_000_000):
    sites = np.sort(rng.choice(genome // 3000, size=n_sites, replace=False)) * 3000 + 10_000
    lens = rng.integers(60, 3000, size=n_sites)
    types = rng.integers(0, 4, size=n_sites)

    rows = []
    for si, (pos, ln, t) in enumerate(zip(sites, lens, types)):
        for sample in range(n_samples):
            if rng.random() < 0.8:  # not every sample carries every site
                rows.append((int(pos + rng.integers(-20, 21)),
                             int((ln + rng.integers(-8, 9)) * (-1 if t == 1 else 1)),
                             int(t), sample, int(rng.integers(5, 40)), True, si))
    rng.shuffle(rows)
    return rows, n_sites


def host_greedy(rows, combine_match=250, combine_match_max=1000):
    """The reference greedy assignment (cluster.py:356-390), simplified to
    the geometric criterion."""
    import math
    groups = []  # (pos_mean, len_mean, members)
    for pos, svlen, svtype, sample, support, qc, site in sorted(
            rows, key=lambda r: -r[4]):
        best = None
        best_dist = math.inf
        for g in groups:
            if g["svtype"] != svtype:
                continue
            dist = abs(g["pos_mean"] - pos) + abs(g["len_mean"] - abs(svlen))
            minlen = min(g["len_mean"], abs(svlen))
            if minlen > 0 and dist < best_dist and \
                    dist <= combine_match * math.sqrt(minlen) and dist <= combine_match_max:
                best = g
                best_dist = dist
        if best is None:
            groups.append({"svtype": svtype, "pos_mean": float(pos),
                           "len_mean": float(abs(svlen)), "members": [(pos, svlen, sample, site)]})
        else:
            k = len(best["members"])
            best["pos_mean"] = (best["pos_mean"] * k + pos) / (k + 1)
            best["len_mean"] = (best["len_mean"] * k + abs(svlen)) / (k + 1)
            best["members"].append((pos, svlen, sample, site))
    return groups


def test_device_grouping_matches_greedy_on_separated_sites():
    rng = np.random.default_rng(17)
    rows, n_sites = make_candidates(rng)
    n = 1024
    cand = {
        "pos": np.zeros(n, dtype=np.int32),
        "svlen": np.zeros(n, dtype=np.int32),
        "svtype": np.zeros(n, dtype=np.int32),
        "sample_id": np.zeros(n, dtype=np.int32),
        "support": np.zeros(n, dtype=np.int32),
        "qc": np.zeros(n, dtype=bool),
        "valid": np.zeros(n, dtype=bool),
    }
    truth_site = np.full(n, -1)
    for i, (pos, svlen, t, sample, support, qc, site) in enumerate(rows):
        cand["pos"][i] = pos
        cand["svlen"][i] = svlen
        cand["svtype"][i] = t
        cand["sample_id"][i] = sample
        cand["support"][i] = support
        cand["qc"][i] = qc
        cand["valid"][i] = True
        truth_site[i] = site

    out = group_candidates({k: jnp.asarray(v) for k, v in cand.items()},
                           combine_match=250.0, combine_match_max=1000.0)
    n_groups = int(out["n_groups"])

    host_groups = host_greedy(rows)
    assert n_groups == len(host_groups) == n_sites

    # every device group contains exactly the candidates of one truth site
    gid = np.asarray(out["group_id"])
    valid = np.asarray(out["valid"])
    # map sorted rows back to truth sites via (pos, svlen, sample) keys
    key_to_site = {(p, l, s): site for (p, l, t, s, sup, qc, site) in rows}
    pos_s = np.asarray(out["pos"])
    len_s = np.asarray(out["svlen"])
    sam_s = np.asarray(out["sample_id"])
    group_sites = {}
    for i in np.nonzero(valid)[0]:
        site = key_to_site[(int(pos_s[i]), int(len_s[i]), int(sam_s[i]))]
        group_sites.setdefault(int(gid[i]), set()).add(site)
    assert all(len(sites) == 1 for sites in group_sites.values())

    # per-group sample counts match membership
    counts = np.asarray(out["group_sample_count"])[:n_groups]
    host_counts = sorted(len({m[2] for m in g["members"]}) for g in host_groups)
    assert sorted(counts.tolist()) == host_counts


def _mk_call(pos, svlen, svtype, sample, support, alt, qc=True):
    from sniffles_tpu import svcall as sv
    c = sv.SVCall(
        contig="chr1", pos=pos, id=f"{svtype}.{pos}.{sample}", ref="N", alt=alt,
        qual=50, filter="PASS", info={}, svtype=svtype, svlen=svlen,
        end=pos + abs(svlen) if svtype == "DEL" else pos,
        genotypes={0: (0, 1, 60, support, support, (None, None))},
        precise=True, support=support, rnames=None, qc=qc, nm=-1,
        postprocess=None, fwd=support // 2, rev=support - support // 2,
        coverage_upstream=30, coverage_start=30, coverage_center=30,
        coverage_end=30, coverage_downstream=30)
    c.sample_internal_id = sample
    return c


def _group_shape(groups):
    return [tuple(c.id for c in g.candidates) for g in groups]


@pytest.mark.parametrize("svtype", ["INS", "DEL"])
def test_device_block_groups_identical_to_host_greedy_population(svtype):
    """device_block_groups must reproduce cluster.resolve_block_groups
    exactly — member assignment AND output order — at population scale
    (64 samples, multi-allelic sites, kept frontier groups)."""
    import copy
    from sniffles_tpu import cluster as cl
    from sniffles_tpu import svcall as sv
    from sniffles_tpu.parallel.device_combine import device_block_groups
    from sniffles_tpu.config import SnifflesConfig

    config = SnifflesConfig("--input", "x.snf", "--vcf", "y.vcf")
    rng = np.random.default_rng(23)

    seqpool = ["".join(rng.choice(list("ACGT"), size=200)) for _ in range(6)]
    cands = []
    pos0 = 50_000
    for site in range(12):
        base_alleles = [(60 + 10 * a, seqpool[a % len(seqpool)]) for a in range(1 + site % 3)]
        for sample in range(64):
            if rng.random() < 0.3:
                continue
            ln, seq = base_alleles[int(rng.integers(len(base_alleles)))]
            ln = int(ln + rng.integers(-3, 4))
            alt = seq[:ln] if svtype == "INS" else f"<{svtype}>"
            cands.append(_mk_call(int(pos0 + rng.integers(-15, 16)),
                                  ln if svtype == "INS" else -ln,
                                  svtype, sample, int(rng.integers(4, 40)), alt))
        pos0 += int(rng.integers(2_500, 40_000))
    rng.shuffle(cands)

    # kept frontier groups near the first two sites
    keeps = []
    for i in range(2):
        g = sv.SVGroup.from_candidate(_mk_call(50_000 + 7_000 * i, 64, svtype, 99,
                                               30, seqpool[0][:64] if svtype == "INS"
                                               else f"<{svtype}>"))
        keeps.append(g)

    cands_h = copy.deepcopy(cands)
    keeps_h = copy.deepcopy(keeps)
    host = cl.resolve_block_groups(svtype, cands_h, keeps_h, config, None)

    dev = device_block_groups(svtype, cands, keeps, config, None)

    assert _group_shape(dev) == _group_shape(host)
    assert [g.pos_mean for g in dev] == pytest.approx([g.pos_mean for g in host])
