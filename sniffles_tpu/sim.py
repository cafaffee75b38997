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
    svtype: str       # "INS" | "DEL"
    svlen: int        # positive length
    seq: str = ""     # inserted sequence (INS); generated if empty
    vaf: float = 1.0  # fraction of reads carrying the SV


def random_seq(rng, n: int) -> str:
    return "".join(rng.choice(list("ACGT"), size=n))


def simulate(ref_len: int = 100_000, svs: list[PlantedSV] = (), depth: int = 20,
             read_len: int = 12_000, seed: int = 0, contig: str = "chr1",
             contig_len: int | None = None, phased: bool = False):
    """Returns (reference_seq, records). Reads tile the reference every
    read_len/depth bp; each read spanning a planted SV carries it in its
    CIGAR (and sequence, for INS) with probability sv.vaf."""
    rng = np.random.default_rng(seed)
    ref = random_seq(rng, ref_len)
    svs = sorted(svs, key=lambda s: s.pos)
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
