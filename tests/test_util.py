"""Robust statistics semantics (reference: util.py, exercised via test_params.py style)."""
import statistics

from sniffles_tpu import util


def test_stdev_matches_statistics():
    vals = [1, 5, 2, 9, 3, 3, 7]
    assert abs(util.stdev(vals) - statistics.stdev(vals)) < 1e-9
    assert util.stdev([4]) == 0
    assert util.stdev([]) == 0


def test_median():
    assert util.median([1, 2, 3]) == 2
    assert util.median([1, 2, 3, 4]) == 2  # int() of 2.5
    assert util.median([10]) == 10


def test_median_noavg():
    assert util.median_noavg([1, 2, 3, 4]) == 3  # upper median, no averaging
    assert util.median_noavg([5, 1, 3]) == 3


def test_median_modes_insertion_order():
    # values with counts within 2 of max are retained in first-seen order
    vals = [50, 50, 50, 49, 52, 52]
    # counts: 50:3, 49:1, 52:2 -> max 3, keep counts>1 => {50:3, 52:2} and 49 (3-1<3 -> keep)
    kept = [50, 49, 52]  # first-seen order
    assert util.median_modes(vals) == util.median_noavg(kept)


def test_trim():
    assert util.trim([1, 2, 3, 4, 5, 6, 7, 8], pct=25) == [3, 4, 5, 6]
    assert util.trim([1, 2, 3]) == [1, 2, 3]  # too few to trim


def test_most_common_top():
    # ties broken by smallest value
    assert util.most_common_top([3, 3, 1, 1, 2]) == 1
    assert util.most_common_top(["b", "a", "b"]) == "b"


def test_stats_randomized_equivalence():
    """The fsum/Counter fast paths must match the reference formulations
    (statistics.stdev exact-rational; dict-loop counting) on realistic
    genomic magnitudes — these feed merge criteria, PRECISE, and the
    STDEV_POS/LEN INFO fields (reference: util.py:25-27,49-58,91-103)."""
    import random

    def most_common_dict(nums):
        counts = {}
        for n in nums:
            counts[n] = counts.get(n, 0) + 1
        return sorted(((c, n) for n, c in counts.items()), reverse=True)

    def median_modes_dict(nums):
        counts = {}
        for n in nums:
            counts[n] = counts.get(n, 0) + 1
        max_count = max(counts.values())
        return util.median_noavg(k for k, c in counts.items() if max_count - c < 3)

    rng = random.Random(20260820)
    for _ in range(3000):
        n = rng.randint(2, 60)
        base = rng.randint(0, 250_000_000)
        xs = [base + rng.randint(-3000, 3000) for _ in range(n)]
        ref = statistics.stdev(xs)
        # relative tolerance near the observed worst case (~1e-12), and
        # the property that actually matters downstream: identical VCF
        # formatting at 3 decimals (ADVICE r1)
        assert abs(util.stdev(xs) - ref) <= max(1e-9 * ref, 1e-9)
        assert f"{util.stdev(xs):.3f}" == f"{ref:.3f}"
        small = [rng.randint(-80, 80) for _ in range(n)]
        assert util.most_common(small) == most_common_dict(small)
        assert util.median_modes(small) == median_modes_dict(small)


def test_stdev_threshold_adjacent_clusters():
    """Pinned cases constructing values whose stdev sits at the decision
    boundaries the calling path compares against — PRECISE at
    stdev_pos + stdev_len ~ 25 (config.precise) and the merge sweep's
    stdev_start * cluster_r ~ integer inner distances — so any future
    drift from statistics.stdev semantics flips a visible decision and
    fails here (ADVICE r1)."""
    import itertools

    # stdev == 25 exactly: two points 50 apart (stdev = d/sqrt(2)*...):
    # statistics.stdev([x, x+d]) == d / sqrt(2); choose d so stdev ~ 25
    for base in (0, 10_000, 250_000_000):
        for d in (35, 36):  # d/sqrt(2) brackets 25: 24.749..., 25.455...
            xs = [base, base + d]
            got, ref = util.stdev(xs), statistics.stdev(xs)
            assert (got < 25.0) == (ref < 25.0), (base, d)
            assert (got <= 25.0) == (ref <= 25.0), (base, d)

    # stdev_start * cluster_r (2.5) adjacent to integer inner distances:
    # symmetric triples with exactly representable stdev-like spreads
    rng_cases = [(b, s) for b, s in itertools.product(
        (0, 123_456_789, 249_999_000), (2, 4, 8, 16, 40, 80))]
    for base, spread in rng_cases:
        xs = [base - spread, base, base + spread]
        got, ref = util.stdev(xs), statistics.stdev(xs)
        for inner in (int(got * 2.5) - 1, int(got * 2.5), int(got * 2.5) + 1):
            assert (inner <= got * 2.5) == (inner <= ref * 2.5), (base, spread, inner)

    # qc_stdev_abs_max boundary (> 500)
    for d in (707, 708):  # d/sqrt(2) brackets 500
        xs = [1_000_000, 1_000_000 + d]
        got, ref = util.stdev(xs), statistics.stdev(xs)
        assert (got > 500.0) == (ref > 500.0), d


def test_should_process_contig():
    class Cfg:
        contig = None
        regions_by_contig = {}
        all_contigs = False

    cfg = Cfg()
    assert util.should_process_contig("chr1", 2_000_000, cfg)
    assert not util.should_process_contig("chrM", 16_000, cfg)

    cfg.contig = ["chrM"]
    assert util.should_process_contig("chrM", 16_000, cfg)
    assert not util.should_process_contig("chr1", 2_000_000, cfg)

    cfg.contig = None
    cfg.all_contigs = True
    assert util.should_process_contig("chrM", 16_000, cfg)
