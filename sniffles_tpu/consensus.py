"""
Insertion-sequence consensus by k-mer-anchor pseudo-alignment.

Host-side exact port of the reference consensus (reference:
consensus.py:280-394 novel_from_reads; triggered from
postprocess.annotate_sv, params at config.py:549-553). The batched POA
DP kernel in ops/poa.py provides a higher-accuracy device-side
alternative used by the local-assembly rescue path.
"""
from __future__ import annotations

from sniffles_tpu import util


def iter_kmers(seq, klen, skip):
    """(reference: consensus.py:142-144)"""
    for i in range(0, len(seq) - klen, skip):
        yield (i, seq[i:i + klen])


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

    for leadi, lead in enumerate(other_leads):
        last_i = None
        last_j = None
        conseq = ""
        span = 0
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
                    m = 0
                    for l in range(1, (j - last_j) + 1):
                        if lead.seq[last_j + l] == best_lead.seq[last_i + l]:
                            m += 1
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

        conseq_new = []
        h = 0
        while h < len(best_lead.seq):
            if conseq[h] == "-":
                conseq_new.append("-")
                h += 1
            else:
                buffer = []
                ident = 0
                while h < len(best_lead.seq) and conseq[h] != "-":
                    ident += (best_lead.seq[h] == conseq[h])
                    buffer.append(conseq[h])
                    h += 1
                if ident / float(len(buffer)) > minident and ident > minident_abs:
                    conseq_new.append("".join(buffer))
                else:
                    conseq_new.append("-" * len(buffer))
        conseq = "".join(conseq_new)

        if span / float(len(best_lead.seq)) > minspan:
            alignments.append(conseq)

    maxal = 1
    for i in range(len(best_lead.seq)):
        maxal = max(maxal, len([best_lead.seq[i]] + [a[i] for a in alignments if not a[i] in "^_"]))
    maxal = float(maxal)

    flattened = ""
    for i in range(len(best_lead.seq)):
        al = [a[i] for a in alignments if not a[i] == "-"]
        if len(al) < consensus_min or len(al) / maxal < minalns:
            flattened += best_lead.seq[i]
        else:
            top = util.most_common([best_lead.seq[i]] + al)
            if len(top) > 1 and top[0][0] - top[1][0] >= minbestdiff:
                flattened += top[0][1]
            else:
                flattened += best_lead.seq[i]

    return flattened
