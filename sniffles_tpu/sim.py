"""
Read/alignment simulator for end-to-end truth testing.

Generates a random reference, plants SVs (INS/DEL), tiles long reads
over the genome with correct CIGARs, and writes sorted+indexed BAM via
io/bamwrite.py — giving the framework the whole-pipeline differential
harness the reference lacks (SURVEY §4: "the new framework needs an e2e
differential harness the reference itself lacks").
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from sniffles_tpu.io.bamwrite import BamRecordSpec, write_bam


@dataclass
class PlantedSV:
    pos: int          # reference position (0-based)
    svtype: str       # "INS" | "DEL" (CIGAR) or "DUP" | "INV" (split reads)
    svlen: int        # positive length
    seq: str = ""     # inserted sequence (INS); generated if empty
    vaf: float = 1.0  # fraction of reads carrying the SV
    support: int = 15  # split reads generated per DUP/INV site


def random_seq(rng, n: int) -> str:
    return "".join(rng.choice(list("ACGT"), size=n))


def split_read_records(sv: PlantedSV, ref: str, contig: str, rng,
                       read_half: int = 4000) -> list[BamRecordSpec]:
    """
    Split-read (SA-tagged) alignments for DUP/INV events, the signature
    geometry classified by classify_splits (reference: sv.py:649-782).

    DUP: a read crossing the tandem junction maps forward twice —
    part 1 ends at the duplication end d2, part 2 restarts at d1
    (fwd/fwd, curr.ref_start <= last.ref_end -> DUP, sv.py:716-721).
    INV: part 1 maps forward up to the inversion start, part 2 maps
    reverse across the inverted segment (fwd then rev,
    curr.ref_end >= last.ref_end -> INV case A, sv.py:752-757).
    """
    records = []
    d1 = sv.pos
    d2 = sv.pos + sv.svlen
    for k in range(sv.support):
        jitter = int(rng.integers(0, 500))
        if sv.svtype == "DUP":
            # read: [x, d2) then [d1, y) — both forward
            x = d1 - read_half + jitter
            y = d1 + read_half - jitter
            len1 = d2 - x
            len2 = y - d1
            seq = ref[x:d2] + ref[d1:y]
            qname = f"dup{sv.pos}_{k:03d}"
            sa2 = f"{contig},{d1 + 1},+,{len1}S{len2}M,60,0;"
            sa1 = f"{contig},{x + 1},+,{len1}M{len2}S,60,0;"
            records.append(BamRecordSpec(qname=qname, flag=0, refid=0, pos=x, mapq=60,
                                         cigar=[("M", len1), ("S", len2)], seq=seq,
                                         tags={"NM": 0, "SA": sa2}))
            records.append(BamRecordSpec(qname=qname, flag=2048, refid=0, pos=d1, mapq=60,
                                         cigar=[("S", len1), ("M", len2)], seq=seq,
                                         tags={"NM": 0, "SA": sa1}))
        elif sv.svtype == "INV":
            # read: [x, d1) forward, then the inverted segment [d1, d2)
            # appears reverse-complemented in the read
            x = d1 - read_half + jitter
            len1 = d1 - x
            len2 = sv.svlen
            comp = str.maketrans("ACGTN", "TGCAN")
            seq = ref[x:d1] + ref[d1:d2].translate(comp)[::-1]
            qname = f"inv{sv.pos}_{k:03d}"
            # supplementary maps '-' over [d1, d2): its CIGAR is in ref
            # orientation with the clip for part 1 at the END
            sa2 = f"{contig},{d1 + 1},-,{len2}M{len1}S,60,0;"
            sa1 = f"{contig},{x + 1},+,{len1}M{len2}S,60,0;"
            records.append(BamRecordSpec(qname=qname, flag=0, refid=0, pos=x, mapq=60,
                                         cigar=[("M", len1), ("S", len2)], seq=seq,
                                         tags={"NM": 0, "SA": sa2}))
            rc_seq = seq.translate(comp)[::-1]
            records.append(BamRecordSpec(qname=qname, flag=16 | 2048, refid=0, pos=d1,
                                         mapq=60, cigar=[("M", len2), ("S", len1)],
                                         seq=rc_seq, tags={"NM": 0, "SA": sa1}))
    return records


def simulate(ref_len: int = 100_000, svs: list[PlantedSV] = (), depth: int = 20,
             read_len: int = 12_000, seed: int = 0, contig: str = "chr1",
             contig_len: int | None = None, phased: bool = False):
    """Returns (reference_seq, records). Reads tile the reference every
    read_len/depth bp; each read spanning a planted INS/DEL carries it in
    its CIGAR (and sequence, for INS) with probability sv.vaf. DUP/INV
    sites additionally emit SA-tagged split-read pairs."""
    rng = np.random.default_rng(seed)
    ref = random_seq(rng, ref_len)
    split_svs = [sv for sv in svs if sv.svtype in ("DUP", "INV")]
    svs = sorted((s for s in svs if s.svtype in ("INS", "DEL")), key=lambda s: s.pos)
    for sv in svs:
        if sv.svtype == "INS" and not sv.seq:
            sv.seq = random_seq(rng, sv.svlen)

    step = max(1, read_len // depth)
    records = []
    rid = 0
    for start in range(0, ref_len - read_len, step):
        end = start + read_len
        carries = [sv for sv in svs if start + 500 < sv.pos < end - 500]
        has = {id(sv): (rng.random() < sv.vaf) for sv in carries}

        cigar: list[tuple[str, int]] = []
        seq_parts: list[str] = []
        cursor = start
        nm = 0
        for sv in carries:
            if not has[id(sv)]:
                continue
            m = sv.pos - cursor
            if m <= 0:
                continue
            cigar.append(("M", m))
            seq_parts.append(ref[cursor:sv.pos])
            if sv.svtype == "INS":
                cigar.append(("I", sv.svlen))
                seq_parts.append(sv.seq)
                cursor = sv.pos
            else:  # DEL
                cigar.append(("D", sv.svlen))
                cursor = sv.pos + sv.svlen
            nm += sv.svlen
        if cursor < end:
            cigar.append(("M", end - cursor))
            seq_parts.append(ref[cursor:end])

        # merge adjacent M ops
        merged: list[tuple[str, int]] = []
        for op, ln in cigar:
            if merged and merged[-1][0] == op:
                merged[-1] = (op, merged[-1][1] + ln)
            else:
                merged.append((op, ln))

        flag = 16 if (rid % 2) else 0
        tags = {"NM": nm}
        if phased:
            # reads carrying any SV are haplotype 1, the rest haplotype 2
            carried_any = any(has[id(sv)] for sv in carries)
            tags["HP"] = 1 if (carried_any or not carries) else 2
            tags["PS"] = 1000
        records.append(BamRecordSpec(
            qname=f"read{rid:06d}",
            flag=flag,
            refid=0,
            pos=start,
            mapq=60,
            cigar=merged,
            seq="".join(seq_parts),
            tags=tags,
        ))
        rid += 1

    for sv in split_svs:
        records.extend(split_read_records(sv, ref, contig, rng))
    records.sort(key=lambda r: r.pos)

    return ref, records


def write_dataset(tmpdir: str, ref_len: int = 100_000, svs: list[PlantedSV] = (),
                  depth: int = 20, read_len: int = 12_000, seed: int = 0,
                  contig: str = "chr1", contig_len: int | None = None,
                  phased: bool = False, n_contigs: int = 1):
    """Write reference FASTA + sorted/indexed BAM; returns (bam_path, fasta_path).

    contig_len pads the declared contig length (>= 1 Mbp so the default
    contig filter keeps it, reference: util.py:161). With n_contigs > 1
    the same SV layout is replicated on chr1..chrN (for multi-task /
    scaling tests; tasks are per-contig by default, sniffles:299-302)."""
    import os

    declared = contig_len or max(1_000_000, ref_len)
    contigs = [contig] if n_contigs == 1 else [f"chr{i + 1}" for i in range(n_contigs)]

    all_records = []
    refs = {}
    for ci, cname in enumerate(contigs):
        ref, records = simulate(ref_len=ref_len, svs=[PlantedSV(**vars(sv)) for sv in svs],
                                depth=depth, read_len=read_len, seed=seed + ci,
                                contig=cname, phased=phased)
        refs[cname] = ref
        for r in records:
            r.refid = ci
            if n_contigs > 1:
                r.qname = f"{cname}.{r.qname}"
        all_records.extend(records)

    fasta_path = os.path.join(tmpdir, "ref.fa")
    with open(fasta_path, "w") as f:
        for cname in contigs:
            f.write(f">{cname}\n")
            full = refs[cname] + "N" * (declared - len(refs[cname]))
            for i in range(0, len(full), 60):
                f.write(full[i:i + 60] + "\n")

    bam_path = os.path.join(tmpdir, "sim.bam")
    header = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:{c}\tLN:{declared}\n" for c in contigs)
    write_bam(bam_path, [(c, declared) for c in contigs], all_records, sam_header=header)
    return bam_path, fasta_path
