"""Truth-based accuracy tests for the graph POA engine
(native/poacore.cc), which replaces the star-alignment work-alike for
the local-assembly rescue (reference dependency: pyspoa/SPOA at
local_asm.py:17,287-291). The reference cannot run its own SPOA here,
so accuracy is pinned against simulation truth (VERDICT r1 item 8)."""
import numpy as np
import pytest

from sniffles_tpu.io import native
from sniffles_tpu.ops.edit_distance import edit_distance
from sniffles_tpu.ops.poa import consensus_from_sequences, poa

pytestmark = pytest.mark.skipif(not native.available()
                                or not hasattr(native.get_lib() or 0, "poacore_consensus"),
                                reason="native poacore not built")


def _mutate(rng, s, sub, ins, dele):
    out = []
    for ch in s:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append("ACGT"[rng.integers(0, 4)])
        if rng.random() < sub:
            out.append("ACGT"[rng.integers(0, 4)])
        else:
            out.append(ch)
    return "".join(out)


@pytest.mark.parametrize("L,err,min_ident", [
    (300, 0.02, 0.995),
    (1500, 0.02, 0.995),
    (1500, 0.05, 0.985),   # ONT-class error
    (4000, 0.05, 0.985),
])
def test_graph_poa_recovers_truth(L, err, min_ident):
    rng = np.random.default_rng(L + int(err * 100))
    truth = "".join(rng.choice(list("ACGT"), size=L))
    reads = [_mutate(rng, truth, err, err / 2, err / 2) for _ in range(14)]
    cons = native.poa_consensus(reads, min_coverage=7)
    assert cons
    d = edit_distance(cons, truth)
    assert 1 - d / L >= min_ident, (len(cons), d)


def test_graph_poa_handles_indel_dense_reads():
    """Indel-dominated noise: the regime where star alignment against a
    single center degrades (frame shifts double-count against the
    center) while the graph absorbs them as branches."""
    rng = np.random.default_rng(77)
    truth = "".join(rng.choice(list("ACGT"), size=1200))
    reads = [_mutate(rng, truth, 0.01, 0.04, 0.04) for _ in range(12)]
    cons = native.poa_consensus(reads, min_coverage=6)
    d = edit_distance(cons, truth)
    assert 1 - d / len(truth) >= 0.98, d


def test_min_coverage_trims_ragged_ends_only():
    """min_coverage trims ragged window ends (staggered read extents, as
    produced by the rescue harvest) but never splits the consensus at
    interior polymorphic columns."""
    rng = np.random.default_rng(5)
    truth = "".join(rng.choice(list("ACGT"), size=1000))
    # staggered extents: each read covers truth[s:e]; only [100, 900) is
    # covered by (nearly) all reads. A 10bp insertion rides in a minority.
    reads = []
    for i in range(10):
        s = int(rng.integers(0, 101))
        e = int(rng.integers(900, 1001))
        mid = truth[s:500] + ("ACGTACGTAC" if i < 3 else "") + truth[500:e]
        reads.append(mid)
    cons = native.poa_consensus(reads, min_coverage=9)
    deep_core = truth[100:900]
    d = edit_distance(cons, deep_core)
    # within the staggering slack: ends trimmed to the deep core, the
    # minority insertion may or may not ride the heaviest path
    assert abs(len(cons) - len(deep_core)) <= 120, len(cons)
    assert d <= 120, d
    # interior is intact: a long error-free run survives verbatim
    assert truth[150:450] in cons


def test_consensus_from_sequences_routes_to_graph_poa():
    """ops/poa.py consensus must use the graph engine when the native
    library is present (star fallback only without it)."""
    rng = np.random.default_rng(8)
    truth = "".join(rng.choice(list("ACGT"), size=600))
    reads = [_mutate(rng, truth, 0.03, 0.02, 0.02) for _ in range(10)]
    cons = consensus_from_sequences(reads, min_coverage=5)
    assert 1 - edit_distance(cons, truth) / len(truth) >= 0.99

    native_cons = native.poa_consensus(reads, min_coverage=5)
    assert cons == native_cons


def test_poa_facade_full_pipeline_shape():
    """poa() returns (consensus, msa) with msa rows spelling the inputs
    (the local_asm contract, reference local_asm.py:287-291)."""
    rng = np.random.default_rng(9)
    truth = "".join(rng.choice(list("ACGT"), size=400))
    reads = [_mutate(rng, truth, 0.02, 0.01, 0.01) for _ in range(6)]
    cons, msa = poa(reads, genmsa=True, min_coverage=3)
    assert 1 - edit_distance(cons, truth) / len(truth) >= 0.99
    assert len(msa) == len(reads)
    for row, read in zip(msa, reads):
        assert row.replace("-", "") == read
