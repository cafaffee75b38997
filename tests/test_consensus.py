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


def _spec_flatten(best_seq, alignments, consensus_min=2, minalns=0.25,
                  minbestdiff=3):
    """Per-character spec of the reference vote loop (consensus.py:377-394)."""
    from sniffles_tpu import util
    maxal = 1
    for i in range(len(best_seq)):
        maxal = max(maxal, len([best_seq[i]] + [a[i] for a in alignments
                                                if a[i] not in "^_"]))
    maxal = float(maxal)
    flattened = ""
    for i in range(len(best_seq)):
        al = [a[i] for a in alignments if not a[i] == "-"]
        if len(al) < consensus_min or len(al) / maxal < minalns:
            flattened += best_seq[i]
        else:
            top = util.most_common([best_seq[i]] + al)
            if len(top) > 1 and top[0][0] - top[1][0] >= minbestdiff:
                flattened += top[0][1]
            else:
                flattened += best_seq[i]
    return flattened


def _spec_filter_segments(conseq, best_seq, minident=0.5, minident_abs=5):
    """Per-character spec of the reference segment filter
    (consensus.py:360-375)."""
    conseq_new = []
    h = 0
    while h < len(best_seq):
        if conseq[h] == "-":
            conseq_new.append("-")
            h += 1
        else:
            buffer = []
            ident = 0
            while h < len(best_seq) and conseq[h] != "-":
                ident += (best_seq[h] == conseq[h])
                buffer.append(conseq[h])
                h += 1
            if ident / float(len(buffer)) > minident and ident > minident_abs:
                conseq_new.append("".join(buffer))
            else:
                conseq_new.append("-" * len(buffer))
    return "".join(conseq_new)


def test_vectorized_vote_matches_spec():
    from sniffles_tpu.consensus import _flatten_votes
    rng = np.random.default_rng(17)
    for trial in range(30):
        size = int(rng.integers(5, 400))
        n_aln = int(rng.integers(0, 9))
        best = "".join(rng.choice(list("ACGTN"), size=size))
        alns = []
        for _ in range(n_aln):
            chars = rng.choice(list("ACGT-"), size=size,
                               p=[0.2, 0.2, 0.2, 0.2, 0.2])
            alns.append("".join(chars))
        assert _flatten_votes(best, alns, 2, 0.25, 3) == _spec_flatten(best, alns)


def test_vectorized_segment_filter_matches_spec():
    from sniffles_tpu.consensus import _filter_segments
    rng = np.random.default_rng(23)
    for trial in range(30):
        size = int(rng.integers(5, 400))
        best = "".join(rng.choice(list("ACGT"), size=size))
        # dash runs of varied length interleaved with (noisy) best copies
        conseq = list(best)
        for _ in range(int(rng.integers(0, 10))):
            s = int(rng.integers(0, size))
            ln = int(rng.integers(1, 30))
            for k in range(s, min(size, s + ln)):
                conseq[k] = "-"
        for _ in range(int(rng.integers(0, 40))):
            p = int(rng.integers(0, size))
            if conseq[p] != "-":
                conseq[p] = str(rng.choice(list("ACGT")))
        conseq = "".join(conseq)
        got = _filter_segments(conseq,
                               np.frombuffer(best.encode(), dtype=np.uint8),
                               0.5, 5)
        assert got == _spec_filter_segments(conseq, best)


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


def test_novel_from_reads_matches_spec_port():
    """The vectorized novel_from_reads must be byte-identical to the
    direct reference port across fuzzed inputs (incl. repeats, indels,
    short/long reads, N bases)."""
    from sniffles_tpu.consensus import novel_from_reads_spec
    rng = np.random.default_rng(11)
    for trial in range(25):
        n = int(rng.integers(20, 1200))
        true_seq = "".join(rng.choice(list("ACGTN"), size=n,
                                      p=[0.24, 0.24, 0.24, 0.24, 0.04]))
        if rng.random() < 0.3:  # tandem-repeat-like content (taboo kmers)
            unit = true_seq[:10] if n >= 10 else true_seq
            true_seq = (unit * (n // max(1, len(unit)) + 1))[:n]
        best = FakeLead(_mutate(rng, true_seq, min(n // 10, 5)))
        others = []
        for _ in range(int(rng.integers(0, 9))):
            s = _mutate(rng, true_seq, min(n // 8, 7))
            # random indel to shift alignment frames
            if rng.random() < 0.5 and len(s) > 30:
                cut = int(rng.integers(5, len(s) - 5))
                if rng.random() < 0.5:
                    s = s[:cut] + s[cut + int(rng.integers(1, 4)):]
                else:
                    ins = "".join(rng.choice(list("ACGT"), size=int(rng.integers(1, 4))))
                    s = s[:cut] + ins + s[cut:]
            others.append(FakeLead(s))
        klen = int(rng.integers(4, 9))
        skip = int(rng.integers(1, 6))
        skip_rep = int(rng.integers(1, 6))
        got = novel_from_reads(best, others, klen=klen, skip=skip,
                               skip_repetitive=skip_rep)
        want = novel_from_reads_spec(best, others, klen=klen, skip=skip,
                                     skip_repetitive=skip_rep)
        assert got == want, (trial, n, klen, skip, skip_rep)
        # the line above takes the native path when libbamcore is present;
        # force the numpy path too so both stay pinned to the spec
        from unittest import mock
        from sniffles_tpu.io import native as native_mod
        with mock.patch.object(native_mod, "consensus_novel",
                               lambda *a, **k: None):
            got_np = novel_from_reads(best, others, klen=klen, skip=skip,
                                      skip_repetitive=skip_rep)
        assert got_np == want, (trial, n, klen, skip, skip_rep)
