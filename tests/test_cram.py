"""CRAM 3.0 round trips: codecs, encodings, record fidelity, region
queries, and e2e VCF identity vs the same data as BAM."""
import os
import random
import subprocess
import sys

import numpy as np
import pytest

from sniffles_tpu.io.bam import AlignmentFile
from sniffles_tpu.io.bamwrite import BamRecordSpec, write_bam
from sniffles_tpu.io.cram import CramFile, Encoding, _BitReader, EN_HUFFMAN, \
    EN_BETA, EN_GAMMA, EN_SUBEXP
from sniffles_tpu.io.cram_codecs import (itf8_encode, itf8_decode, ltf8_encode,
                                         ltf8_decode, rans_encode, rans_decode)
from sniffles_tpu.io.cramwrite import bam_to_cram
from tests.test_bam_fuzz import random_cigar

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HG008 = "/root/reference/src/tests/data/hg008.bam"


def test_varint_roundtrip():
    for v in (0, 1, 127, 128, 0x3FFF, 0x4000, 0x1FFFFF, 0x200000,
              0xFFFFFFF, 0x10000000, 2 ** 31 - 1, -1, -13, -2 ** 31):
        enc = itf8_encode(v)
        dec, off = itf8_decode(enc, 0)
        assert dec == v and off == len(enc), (v, dec)
    for v in (0, 127, 128, 0x3FFF, 0x200000 - 1, 0x200000, 2 ** 28 - 1, 2 ** 28,
              2 ** 34, 2 ** 41, 2 ** 48, 2 ** 55, 2 ** 63 - 1, -1, -2 ** 63, 4542278):
        enc = ltf8_encode(v)
        dec, off = ltf8_decode(enc, 0)
        assert dec == v and off == len(enc), (v, dec)


@pytest.mark.parametrize("order", [0, 1])
def test_rans_roundtrip(order):
    rng = random.Random(3)
    cases = [b"", b"G", b"AC", b"ACG", b"AAAA" * 64, bytes(range(256)),
             bytes(rng.randrange(256) for _ in range(5000)),
             bytes(rng.choice(b"ACGT") for _ in range(20000)),
             b"\x00" * 500, bytes([250]) * 3]
    for data in cases:
        assert rans_decode(rans_encode(data, order)) == data


def test_core_bit_encodings():
    # BETA: offset 10, 6 bits; values v+10 stored
    enc = Encoding(EN_BETA, itf8_encode(10) + itf8_encode(6))
    bits = _BitReader(bytes([0b110010_01, 0b0111_0000]))  # 50, then 23 -> 40, 13
    assert enc.read_int(bits, {}) == 40
    assert enc.read_int(bits, {}) == 13

    # GAMMA: offset 0; Elias gamma of 5 = 00101
    enc = Encoding(EN_GAMMA, itf8_encode(0))
    bits = _BitReader(bytes([0b00101_1_00]))  # 5, then 1
    assert enc.read_int(bits, {}) == 5
    assert enc.read_int(bits, {}) == 1

    # SUBEXP k=2 offset 0: '0' + 2 bits -> value 0..3
    enc = Encoding(EN_SUBEXP, itf8_encode(0) + itf8_encode(2))
    bits = _BitReader(bytes([0b0_11_10_10_0]))  # 3, then '10'+2 bits...
    assert enc.read_int(bits, {}) == 3
    # '10' prefix: i=1, read k+i-1=2 bits (10) -> 2 + (1<<2) = 6
    assert enc.read_int(bits, {}) == 6

    # HUFFMAN canonical: symbols 5,6,7 lens 1,2,2 -> codes 0,10,11
    params = itf8_encode(3) + b"".join(itf8_encode(s) for s in (5, 6, 7))
    params += itf8_encode(3) + b"".join(itf8_encode(b) for b in (1, 2, 2))
    enc = Encoding(EN_HUFFMAN, params)
    bits = _BitReader(bytes([0b0_10_11_0_10]))
    assert [enc.read_int(bits, {}) for _ in range(5)] == [5, 6, 7, 5, 6]

    # zero-bit single-symbol Huffman = constant, no bits consumed
    params = itf8_encode(1) + itf8_encode(42) + itf8_encode(1) + itf8_encode(0)
    enc = Encoding(EN_HUFFMAN, params)
    bits = _BitReader(b"")
    assert enc.read_int(bits, {}) == 42


def _norm_cigar(ct):
    out = []
    for op, ln in ct:
        op = 0 if op in (7, 8) else op   # =/X -> M (CRAM normalization)
        if out and out[-1][0] == op:
            out[-1] = (op, out[-1][1] + ln)
        else:
            out.append((op, ln))
    return out


def _make_fuzz_bam(tmp_path, seed=0, n=80):
    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    records = []
    pos = 1000
    for i in range(n):
        cigar, qlen = random_cigar(rng)
        if rng.random() < 0.2:
            cigar = [("H", rng.randint(1, 50))] + cigar
        if rng.random() < 0.2:
            cigar = cigar + [("H", rng.randint(1, 50))]
        seq = "".join(nprng.choice(list("ACGT"), size=qlen))
        tags = {"NM": rng.randint(0, 50)}
        if rng.random() < 0.4:
            tags["SA"] = "chr1,500,+,100M,60,2;"
        if rng.random() < 0.3:
            tags["HP"] = rng.randint(1, 2)
            tags["PS"] = rng.randint(1, 10 ** 6)
        if rng.random() < 0.2:
            tags["XF"] = rng.random()
        if rng.random() < 0.2:
            tags["XB"] = [rng.randint(-5, 5) for _ in range(rng.randint(0, 4))]
        records.append(BamRecordSpec(
            qname=f"fz{i:04d}", flag=rng.choice([0, 16, 0x800 | 16]), refid=0,
            pos=pos, mapq=rng.randint(0, 60), cigar=cigar, seq=seq, tags=tags))
        pos += rng.randint(100, 2000)
    bam_path = str(tmp_path / "fuzz.bam")
    write_bam(bam_path, [("chr1", 2_000_000)], records,
              sam_header="@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:2000000\n")
    return bam_path


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_roundtrip_referenceless(tmp_path, seed):
    bam_path = _make_fuzz_bam(tmp_path, seed)
    cram_path = str(tmp_path / "fuzz.cram")
    bam_to_cram(bam_path, cram_path, records_per_slice=17)
    bam = AlignmentFile(bam_path)
    cram = AlignmentFile(cram_path, mode="rc", require_index=True)
    assert isinstance(cram, CramFile)
    breads = list(bam.fetch())
    creads = list(cram.fetch())
    assert len(breads) == len(creads)
    for b, c in zip(breads, creads):
        assert (b.query_name, b.flag, b.reference_id, b.reference_start,
                b.mapping_quality) == \
               (c.query_name, c.flag, c.reference_id, c.reference_start,
                c.mapping_quality)
        assert _norm_cigar(b.cigartuples) == _norm_cigar(c.cigartuples)
        assert b.query_sequence == c.query_sequence
        assert b.tags.keys() == c.tags.keys()
        for t in b.tags:
            bv, cv = b.tags[t], c.tags[t]
            if isinstance(bv, float):
                assert abs(bv - cv) < 1e-6
            else:
                assert bv == cv
        assert b.reference_length == c.reference_length
        assert b.query_alignment_start == c.query_alignment_start
        assert b.query_alignment_length == c.query_alignment_length


def test_roundtrip_reference_based(tmp_path):
    from sniffles_tpu.sim import write_dataset, PlantedSV
    svs = [PlantedSV(svtype="DEL", pos=30_000, svlen=120),
           PlantedSV(svtype="INS", pos=60_000, svlen=90)]
    bam_path, fasta_path = write_dataset(str(tmp_path), ref_len=90_000, svs=svs,
                                         depth=8, seed=5)
    cram_path = str(tmp_path / "sim.cram")
    bam_to_cram(bam_path, cram_path, reference_filename=fasta_path,
                records_per_slice=23)
    bam = AlignmentFile(bam_path)
    cram = CramFile(cram_path, require_index=True, reference_filename=fasta_path)
    breads = list(bam.fetch())
    creads = list(cram.fetch())
    assert len(breads) == len(creads) and len(breads) > 20
    for b, c in zip(breads, creads):
        assert b.query_name == c.query_name
        assert b.query_sequence == c.query_sequence, b.query_name
        assert _norm_cigar(b.cigartuples) == _norm_cigar(c.cigartuples)
    # reference-based encoding must actually compress vs the read bases
    assert os.path.getsize(cram_path) < os.path.getsize(bam_path)


def test_region_queries(tmp_path):
    bam_path = _make_fuzz_bam(tmp_path, seed=2, n=150)
    cram_path = str(tmp_path / "rq.cram")
    bam_to_cram(bam_path, cram_path, records_per_slice=31)
    bam = AlignmentFile(bam_path)
    cram = AlignmentFile(cram_path)
    rng = random.Random(7)
    for _ in range(15):
        start = rng.randint(0, 150_000)
        end = start + rng.randint(200, 60_000)
        want = [r.query_name for r in bam.fetch("chr1", start, end)]
        got = [r.query_name for r in cram.fetch("chr1", start, end)]
        assert got == want, (start, end)


def test_index_statistics_and_header(tmp_path):
    bam_path = _make_fuzz_bam(tmp_path, seed=3, n=40)
    cram_path = str(tmp_path / "st.cram")
    bam_to_cram(bam_path, cram_path)
    cram = CramFile(cram_path, require_index=True)
    assert cram.references == ["chr1"]
    assert cram.lengths == [2_000_000]
    stats = cram.get_index_statistics()
    assert stats[0].total == 40
    assert cram.mapped == 40
    assert cram.get_tid("chr1") == 0
    assert cram.get_reference_length("chr1") == 2_000_000


def test_e2e_cram_vcf_identical(tmp_path):
    cram_path = str(tmp_path / "hg008.cram")
    bam_to_cram(HG008, cram_path)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    def run(inp, out):
        res = subprocess.run(
            [sys.executable, "-m", "sniffles_tpu.cli", "--input", inp,
             "--vcf", str(out), "--threads", "0"],
            capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=600)
        assert res.returncode == 0, res.stderr + res.stdout
        with open(out) as f:
            return [ln for ln in f if not ln.startswith("##")]

    bam_calls = run(HG008, tmp_path / "bam.vcf")
    cram_calls = run(cram_path, tmp_path / "cram.vcf")
    assert bam_calls == cram_calls
    assert len([ln for ln in bam_calls if not ln.startswith("#")]) == 4


def test_native_rans_bitstream_identical():
    """The C rANS codec (native/bamcore.cc) must emit byte-identical
    streams to the pure-Python reference, both orders, and cross-decode."""
    import struct
    from sniffles_tpu.io.cram_codecs import (_native_lib, _rans_encode_0,
                                             _rans_encode_1, _rans_decode_0,
                                             _rans_decode_1)
    if _native_lib() is None:
        pytest.skip("native library without rANS symbols")
    rng = random.Random(42)
    cases = [b"", b"T", b"GATTACA", bytes(rng.randrange(256) for _ in range(3000)),
             bytes(rng.choice(b"ACGTN") for _ in range(9001)), b"\x07" * 777]
    for order in (0, 1):
        for data in cases:
            o = 0 if (order == 1 and len(data) < 4) else order
            payload = _rans_encode_0(data) if o == 0 else _rans_encode_1(data)
            py_enc = struct.pack("<BII", o, len(payload), len(data)) + payload
            native_enc = rans_encode(data, order)   # dispatches to C
            assert native_enc == py_enc, (order, len(data))
            assert rans_decode(py_enc) == data      # C decode of Python stream
            dec = (_rans_decode_0 if o == 0 else _rans_decode_1)(
                memoryview(native_enc)[9:], len(data))
            assert bytes(dec) == data               # Python decode of C stream


def test_reference_required_guard(tmp_path):
    """A reference-based CRAM without --reference must fail loudly, not
    silently decode bases as N (htslib behavior)."""
    from sniffles_tpu.sim import write_dataset, PlantedSV
    bam_path, fasta_path = write_dataset(str(tmp_path), ref_len=40_000,
                                         svs=[PlantedSV(svtype="DEL", pos=20_000,
                                                        svlen=100)],
                                         depth=5, seed=9)
    cram_path = str(tmp_path / "rr.cram")
    bam_to_cram(bam_path, cram_path, reference_filename=fasta_path)
    cram = CramFile(cram_path, require_index=True)  # no reference passed
    with pytest.raises(ValueError, match="reference"):
        list(cram.fetch())


def test_embedded_reference_roundtrip(tmp_path):
    """embed_reference=True stores per-slice reference segments so the
    CRAM decodes with full fidelity without the external FASTA."""
    from sniffles_tpu.sim import write_dataset, PlantedSV
    bam_path, fasta_path = write_dataset(str(tmp_path), ref_len=50_000,
                                         svs=[PlantedSV(svtype="INS", pos=25_000,
                                                        svlen=80)],
                                         depth=6, seed=4)
    cram_path = str(tmp_path / "emb.cram")
    bam_to_cram(bam_path, cram_path, reference_filename=fasta_path,
                records_per_slice=19, embed_reference=True)
    bam = AlignmentFile(bam_path)
    cram = CramFile(cram_path, require_index=True)  # NO external reference
    breads = list(bam.fetch())
    creads = list(cram.fetch())
    assert len(breads) == len(creads) and breads
    for b, c in zip(breads, creads):
        assert b.query_name == c.query_name
        assert b.query_sequence == c.query_sequence, b.query_name
        assert _norm_cigar(b.cigartuples) == _norm_cigar(c.cigartuples)


def test_corruption_detected(tmp_path):
    """A bit flip ANYWHERE in the file must raise ValueError (header CRC,
    block CRC checked before decompression, magic/version checks) —
    never reach the entropy decoders or yield wrong records."""
    import shutil
    bam_path = _make_fuzz_bam(tmp_path, seed=6, n=30)
    cram_path = str(tmp_path / "c.cram")
    bam_to_cram(bam_path, cram_path)
    orig = open(cram_path, "rb").read()
    bad_path = str(tmp_path / "bad.cram")
    shutil.copy(cram_path + ".crai", bad_path + ".crai")
    rng = random.Random(13)
    positions = [rng.randrange(len(orig)) for _ in range(40)] + [0, 4, len(orig) - 1]
    for flip in positions:
        raw = bytearray(orig)
        raw[flip] ^= 0xFF
        open(bad_path, "wb").write(bytes(raw))
        with pytest.raises(ValueError):
            cram = CramFile(bad_path, require_index=True)
            list(cram.fetch())

    trunc_path = str(tmp_path / "trunc.cram")
    open(trunc_path, "wb").write(bytes(raw[: len(raw) * 2 // 3]))
    shutil.copy(cram_path + ".crai", trunc_path + ".crai")
    # truncation anywhere must raise (never yield silently wrong records)
    with pytest.raises(Exception):
        cram = CramFile(trunc_path, require_index=True)
        list(cram.fetch())
