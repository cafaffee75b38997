"""Property/fuzz tests: random BAM records round-trip through the writer,
the Python reader, and the native scanner with identical geometry."""
import random

import numpy as np
import pytest

from sniffles_tpu.io.bamwrite import BamRecordSpec, write_bam
from sniffles_tpu.io.bam import AlignmentFile
from sniffles_tpu.io import native


def random_cigar(rng, read_len_target=500):
    ops = []
    qlen = 0
    # optional leading clip
    if rng.random() < 0.4:
        ln = rng.randint(1, 200)
        ops.append(("S", ln))
        qlen += ln
    remaining = read_len_target
    first = True
    while remaining > 0:
        ln = min(remaining, rng.randint(20, 200))
        ops.append(("M" if first or rng.random() < 0.6 else rng.choice(["M", "=", "X"]), ln))
        qlen += ln
        remaining -= ln
        first = False
        if remaining > 0 and rng.random() < 0.5:
            kind = rng.choice(["I", "D"])
            iln = rng.randint(1, 120)
            ops.append((kind, iln))
            if kind == "I":
                qlen += iln
    if rng.random() < 0.3:
        ln = rng.randint(1, 150)
        ops.append(("S", ln))
        qlen += ln
    # merge adjacent same ops (writer requirement not strictly needed)
    merged = []
    for op, ln in ops:
        if merged and merged[-1][0] == op:
            merged[-1] = (op, merged[-1][1] + ln)
        else:
            merged.append((op, ln))
    return merged, qlen


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_records_roundtrip(tmp_path, seed):
    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    records = []
    pos = 1000
    expected = []
    for i in range(60):
        cigar, qlen = random_cigar(rng)
        seq = "".join(nprng.choice(list("ACGT"), size=qlen))
        tags = {"NM": rng.randint(0, 50)}
        if rng.random() < 0.3:
            tags["HP"] = rng.randint(1, 2)
            tags["PS"] = rng.randint(1, 10 ** 6)
        rec = BamRecordSpec(qname=f"fz{i:04d}", flag=rng.choice([0, 16]), refid=0,
                            pos=pos, mapq=rng.randint(0, 60), cigar=cigar, seq=seq,
                            tags=tags)
        records.append(rec)
        ref_len = sum(ln for op, ln in cigar if op in "MDN=X")
        qstart = cigar[0][1] if cigar[0][0] == "S" else 0
        qalen = sum(ln for op, ln in cigar if op in "MI=X")
        expected.append((rec.qname, pos, ref_len, qstart, qalen, qlen, tags))
        pos += rng.randint(100, 2000)

    bam_path = str(tmp_path / "fuzz.bam")
    write_bam(bam_path, [("chr1", 2_000_000)], records,
              sam_header="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:2000000\n")

    bam = AlignmentFile(bam_path, require_index=True)
    reads = list(bam.fetch("chr1", 0, 2_000_000))
    assert len(reads) == len(records)
    for read, (qname, p, ref_len, qstart, qalen, qlen, tags) in zip(reads, expected):
        assert read.query_name == qname
        assert read.reference_start == p
        assert read.reference_length == ref_len
        assert read.query_alignment_start == qstart
        assert read.query_alignment_length == qalen
        assert read.query_length == qlen
        assert read.get_tag("NM") == tags["NM"]
        if "HP" in tags:
            assert read.get_tag("HP") == tags["HP"]
            assert read.get_tag("PS") == tags["PS"]
        # sequence round trip
        orig = records[expected.index((qname, p, ref_len, qstart, qalen, qlen, tags))].seq
        assert read.query_sequence == orig

    if native.available():
        total = 0
        for res, mask in bam.scan_region("chr1", 0, 2_000_000, min_event_len=1):
            c = res.cols
            for i in np.nonzero(mask)[0]:
                i = int(i)
                qname = res.name(i)
                exp = dict((e[0], e) for e in expected)[qname]
                assert c["pos"][i] == exp[1]
                assert c["ref_len"][i] == exp[2]
                assert c["qstart"][i] == exp[3]
                assert c["qalen"][i] == exp[4]
                assert c["nm"][i] == exp[6]["NM"]
                total += 1
        assert total == len(records)


def test_point_queries_match_scan(tmp_path):
    rng = random.Random(9)
    nprng = np.random.default_rng(9)
    records = []
    pos = 5_000
    for i in range(200):
        cigar, qlen = random_cigar(rng, read_len_target=300)
        seq = "".join(nprng.choice(list("ACGT"), size=qlen))
        records.append(BamRecordSpec(qname=f"q{i:04d}", flag=0, refid=0, pos=pos,
                                     mapq=60, cigar=cigar, seq=seq, tags={"NM": 0}))
        pos += rng.randint(50, 400)

    bam_path = str(tmp_path / "pq.bam")
    write_bam(bam_path, [("chr1", 1_000_000)], records,
              sam_header="@SQ\tSN:chr1\tLN:1000000\n")
    bam = AlignmentFile(bam_path, require_index=True)

    for _ in range(20):
        start = rng.randint(0, 80_000)
        end = start + rng.randint(100, 20_000)
        got = {r.query_name for r in bam.fetch("chr1", start, end)}
        want = set()
        for rec in records:
            ref_len = sum(ln for op, ln in rec.cigar if op in "MDN=X")
            if rec.pos < end and rec.pos + ref_len > start:
                want.add(rec.qname)
        assert got == want, (start, end, got ^ want)
