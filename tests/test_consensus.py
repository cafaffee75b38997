"""k-mer-anchor consensus (consensus.novel_from_reads; reference:
consensus.py:280-394) and the POA star-consensus work-alike."""
from dataclasses import dataclass

import numpy as np

from sniffles_tpu.consensus import novel_from_reads, iter_kmers
from sniffles_tpu.ops.poa import poa, consensus_from_sequences


@dataclass
class FakeLead:
    seq: str


def _mutate(rng, seq, n_subs):
    s = list(seq)
    for i in rng.choice(len(s), size=n_subs, replace=False):
        s[i] = rng.choice([c for c in "ACGT" if c != s[i]])
    return "".join(s)


def test_iter_kmers():
    ks = list(iter_kmers("ACGTACGT", 4, 2))
    assert ks == [(0, "ACGT"), (2, "GTAC")]


def test_novel_from_reads_majority_fixes_errors():
    rng = np.random.default_rng(3)
    true_seq = "".join(rng.choice(list("ACGT"), size=300))
    # best lead carries 3 errors; supporting reads are cleaner
    best = FakeLead(_mutate(rng, true_seq, 3))
    others = [FakeLead(_mutate(rng, true_seq, 2)) for _ in range(8)]
    cons = novel_from_reads(best, others, klen=6, skip=3, skip_repetitive=3)
    assert len(cons) == len(true_seq)
    errs = sum(a != b for a, b in zip(cons, true_seq))
    best_errs = sum(a != b for a, b in zip(best.seq, true_seq))
    assert errs <= best_errs  # consensus never worse than the best lead


def test_novel_from_reads_insufficient_support_keeps_best():
    best = FakeLead("ACGTACGTACGTACGTACGTACGT")
    cons = novel_from_reads(best, [], klen=6, skip=3, skip_repetitive=3)
    assert cons == best.seq


def test_poa_two_sequences_returns_pairwise_msa():
    a = "ACGTACGT" + "T" * 30 + "GGCCGGCC"
    b = "ACGTACGT" + "GGCCGGCC"
    cons, msa = poa([a, b])
    assert cons == a
    assert len(msa) == 2
    assert msa[0].replace("-", "") == a
    assert msa[1].replace("-", "") == b
    assert "-" * 25 in msa[1]  # the 30bp insertion shows as a gap run in b


def test_star_consensus_recovers_center():
    rng = np.random.default_rng(5)
    true_seq = "".join(rng.choice(list("ACGT"), size=200))
    reads = [_mutate(rng, true_seq, 4) for _ in range(7)]
    cons = consensus_from_sequences(reads)
    errs = sum(a != b for a, b in zip(cons, true_seq))
    assert len(cons) >= len(true_seq) - 5
    assert errs <= 8
