"""
Insertion-sequence consensus by k-mer-anchor pseudo-alignment.

Host-side exact port of the reference consensus (reference:
consensus.py:280-394 novel_from_reads; triggered from
postprocess.annotate_sv, params at config.py:549-553). The batched POA
DP kernel in ops/poa.py provides a higher-accuracy device-side
alternative used by the local-assembly rescue path.

The per-column vote, the alignment-count scan, and the segment-identity
pass are vectorized with numpy (the reference iterates per character,
consensus.py:360-394); `tests/test_consensus.py` checks the vectorized
path against a per-character spec implementation.
"""
from __future__ import annotations

import numpy as np

from sniffles_tpu import util

_DASH = ord("-")


def iter_kmers(seq, klen, skip):
    """(reference: consensus.py:142-144)"""
    for i in range(0, len(seq) - klen, skip):
        yield (i, seq[i:i + klen])


def _flatten_votes(best_seq: str, alignments: list, consensus_min: int,
                   minalns: float, minbestdiff: int) -> str:
    """Per-column majority vote (reference: consensus.py:377-394),
    vectorized.

    The reference excludes '^'/'_' markers when counting alignments per
    column (consensus.py:379); BAM sequences draw from "=ACMGRSVTWYHKDBN"
    and our alignment strings only add '-', so those markers cannot occur
    and the per-column count is constant: len(alignments) + 1.
    """
    n_aln = len(alignments)
    if n_aln == 0:
        return best_seq
    size = len(best_seq)
    best = np.frombuffer(best_seq.encode("ascii"), dtype=np.uint8)
    mat = np.frombuffer("".join(alignments).encode("ascii"),
                        dtype=np.uint8).reshape(n_aln, size)
    maxal = float(n_aln + 1)

    al_count = (mat != _DASH).sum(axis=0)
    syms = np.unique(np.concatenate([np.unique(mat), np.unique(best)]))
    syms = syms[syms != _DASH]
    counts = np.zeros((len(syms), size), dtype=np.int32)
    for k, s in enumerate(syms):
        counts[k] = (mat == s).sum(axis=0)
        counts[k] += (best == s)
    top_idx = counts.argmax(axis=0)
    sc = np.sort(counts, axis=0)
    top1 = sc[-1]
    top2 = sc[-2] if len(syms) >= 2 else np.zeros(size, dtype=np.int32)

    # reference: fewer than consensus_min non-gap chars, a sparse column,
    # or an ambiguous vote all fall back to the anchor read's base
    use_vote = ((al_count >= consensus_min)
                & (al_count / maxal >= minalns)
                & (top1 - top2 >= minbestdiff))
    out = np.where(use_vote, syms[top_idx], best)
    return out.tobytes().decode("ascii")


def _filter_segments(conseq: str, best: np.ndarray, minident: float,
                     minident_abs: int) -> str:
    """Blank out non-gap segments below the identity floor (reference:
    consensus.py:360-375), via run-length reduceat instead of the
    reference's per-character scan."""
    carr = np.frombuffer(conseq.encode("ascii"), dtype=np.uint8).copy()
    nondash = carr != _DASH
    if not nondash.any():
        return conseq
    # run starts: first position, and every dash/non-dash flip
    flips = np.empty(carr.shape[0], dtype=bool)
    flips[0] = True
    np.not_equal(nondash[1:], nondash[:-1], out=flips[1:])
    starts = np.nonzero(flips)[0]
    eq = (carr == best[:carr.shape[0]]) & nondash
    ident_per_run = np.add.reduceat(eq.astype(np.int32), starts)
    len_per_run = np.diff(np.append(starts, carr.shape[0]))
    run_is_seq = nondash[starts]
    keep = (ident_per_run / len_per_run.astype(np.float64) > minident) \
        & (ident_per_run > minident_abs)
    blank = run_is_seq & ~keep
    for s, ln in zip(starts[blank], len_per_run[blank]):
        carr[s:s + ln] = _DASH
    return carr.tobytes().decode("ascii")


def novel_from_reads(best_lead, other_leads, klen, skip, skip_repetitive, debug=False):
    """Per-position majority-vote consensus anchored on the best lead's
    sequence (reference: consensus.py:280-394)."""
    consensus_min = 2
    maxshift = klen
    minspan = 0.2
    minalns = 0.25
    minident = 0.5
    minident_abs = 5
    minbestdiff = 3

    alignments = []
    anchors = {}
    taboo = set()
    for i, kmer in iter_kmers(best_lead.seq, klen=klen, skip=skip_repetitive):
        if kmer in taboo:
            continue
        if kmer in anchors:
            del anchors[kmer]
            taboo.add(kmer)
            continue
        anchors[kmer] = i

    best_arr = np.frombuffer(best_lead.seq.encode("ascii"), dtype=np.uint8)

    for leadi, lead in enumerate(other_leads):
        last_i = None
        last_j = None
        conseq = ""
        span = 0
        lead_arr = np.frombuffer(lead.seq.encode("ascii"), dtype=np.uint8)
        for j, kmer in iter_kmers(lead.seq, klen=klen, skip=skip):
            if kmer not in anchors:
                continue
            i = anchors[kmer]
            if abs(i - j) > maxshift:
                continue
            if last_i is not None and i <= last_i:
                continue

            if last_i is None:
                if j > 0:
                    conseq = "-" * i
            else:
                fwd_i = i - last_i
                fwd_j = j - last_j
                if len(conseq) + fwd_j > len(best_lead.seq):
                    fwd_j = len(best_lead.seq) - len(conseq)

                if fwd_i == fwd_j and fwd_j > 0:
                    span += (j - last_j)
                    m = int((lead_arr[last_j + 1:j + 1]
                             == best_arr[last_i + 1:last_i + 1 + (j - last_j)]).sum())
                    ident = m / float((j - last_j))
                    if ident >= minident:
                        conseq += lead.seq[last_j:j][:fwd_j]
                    else:
                        conseq += "-" * fwd_j
                else:
                    conseq += "-" * fwd_j
            last_i = i
            last_j = j

        if len(conseq) < len(best_lead.seq):
            conseq += "-" * (len(best_lead.seq) - len(conseq))

        conseq = _filter_segments(conseq, best_arr, minident, minident_abs)

        if span / float(len(best_lead.seq)) > minspan:
            alignments.append(conseq)

    return _flatten_votes(best_lead.seq, alignments, consensus_min, minalns,
                          minbestdiff)
