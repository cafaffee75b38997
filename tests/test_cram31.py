"""
CRAM 3.1 codec tests: rANS Nx16, adaptive arithmetic, fqzcomp, tok3.

No htslib or external 3.1 fixtures exist in this environment, so
compliance is established by spec-derived unit vectors (uint7,
alphabet RLE) plus exhaustive encoder->decoder round trips over
adversarial inputs and every transform-flag combination.
"""
import random
import struct

import pytest

from sniffles_tpu.io.cram31 import (
    uint7_encode, uint7_decode, _Src, _write_alphabet, _read_alphabet,
    rans_nx16_encode, rans_nx16_decode,
    RANS_NX16_ORDER1, RANS_NX16_X32, RANS_NX16_STRIPE, RANS_NX16_NOSZ,
    RANS_NX16_CAT, RANS_NX16_RLE, RANS_NX16_PACK,
)


def corpus():
    rng = random.Random(42)
    quals = bytes(rng.choice(b"\x16\x19\x1b\x28") for _ in range(5000))
    seq = bytes(rng.choice(b"ACGTN") for _ in range(4096))
    runs = b"".join(bytes([rng.randrange(4)]) * rng.randrange(1, 40)
                    for _ in range(300))
    txt = (b"read1.2827 maps to chr20:5000-6000 MAPQ 60 " * 64)
    rand = bytes(rng.randrange(256) for _ in range(3000))
    skew = bytes(rng.choices(range(256), weights=[1000] + [1] * 255, k=4000))
    return {
        "empty": b"", "one": b"A", "tiny": b"ACGT", "quals": quals,
        "seq": seq, "runs": runs, "text": txt, "random": rand, "skew": skew,
        "allsame": b"\x00" * 2048, "ff": b"\xff" * 999,
        "edge255": bytes(range(250, 256)) * 100,
    }


class TestUint7:
    def test_vectors(self):
        # 7 bits per byte, most significant first, high bit = continuation
        assert uint7_encode(0) == b"\x00"
        assert uint7_encode(127) == b"\x7f"
        assert uint7_encode(128) == b"\x81\x00"
        assert uint7_encode(16384) == b"\x81\x80\x00"

    def test_roundtrip(self):
        for v in [0, 1, 127, 128, 255, 4095, 4096, 10**6, 2**35]:
            enc = uint7_encode(v)
            dec, off = uint7_decode(enc, 0)
            assert dec == v and off == len(enc)


class TestAlphabet:
    @pytest.mark.parametrize("syms", [
        [65], [0], [0, 1, 2, 3], [3, 4, 5, 6], [1, 100, 200],
        list(range(33, 127)), list(range(256)), [0, 2, 3, 4, 10, 11, 255],
    ])
    def test_roundtrip(self, syms):
        enc = _write_alphabet(syms)
        assert _read_alphabet(_Src(bytes(enc))) == syms


class TestRansNx16:
    @pytest.mark.parametrize("flags", [
        0,
        RANS_NX16_ORDER1,
        RANS_NX16_X32,
        RANS_NX16_ORDER1 | RANS_NX16_X32,
        RANS_NX16_CAT,
        RANS_NX16_RLE,
        RANS_NX16_RLE | RANS_NX16_ORDER1,
        RANS_NX16_PACK,
        RANS_NX16_PACK | RANS_NX16_ORDER1,
        RANS_NX16_PACK | RANS_NX16_RLE,
        RANS_NX16_STRIPE,
        RANS_NX16_STRIPE | RANS_NX16_ORDER1,
        RANS_NX16_STRIPE | RANS_NX16_X32,
    ])
    def test_roundtrip_all_corpora(self, flags):
        for name, data in corpus().items():
            enc = rans_nx16_encode(data, flags)
            dec = rans_nx16_decode(enc)
            assert dec == data, (name, flags)

    def test_nosz(self):
        data = corpus()["seq"]
        enc = rans_nx16_encode(data, RANS_NX16_NOSZ)
        assert rans_nx16_decode(enc, expected_len=len(data)) == data
        with pytest.raises(ValueError):
            rans_nx16_decode(enc)

    def test_compresses(self):
        c = corpus()
        for name in ("quals", "seq", "allsame", "text"):
            data = c[name]
            enc = rans_nx16_encode(data, 0)
            assert len(enc) < len(data), name
        # order-1 beats order-0 on correlated text
        e0 = rans_nx16_encode(c["text"], 0)
        e1 = rans_nx16_encode(c["text"], RANS_NX16_ORDER1)
        assert len(e1) < len(e0)
        # PACK helps 2-bit alphabets (4 distinct quality values)
        ep = rans_nx16_encode(c["quals"], RANS_NX16_PACK)
        assert len(ep) < len(c["quals"])

    def test_fuzz_roundtrip(self):
        rng = random.Random(7)
        all_flags = [0, RANS_NX16_ORDER1, RANS_NX16_X32, RANS_NX16_RLE,
                     RANS_NX16_PACK, RANS_NX16_STRIPE,
                     RANS_NX16_ORDER1 | RANS_NX16_RLE | RANS_NX16_PACK]
        for trial in range(60):
            n = rng.randrange(0, 2000)
            alpha = rng.choice([2, 4, 5, 16, 64, 256])
            data = bytes(rng.randrange(alpha) for _ in range(n))
            flags = rng.choice(all_flags)
            assert rans_nx16_decode(rans_nx16_encode(data, flags)) == data, \
                (trial, n, alpha, flags)

    def test_truncation_never_roundtrips(self):
        # corruption is caught by the CRAM block CRC32 upstream; here we
        # only require that a truncated stream either raises or decodes
        # to something other than the original (no silent false success)
        data = corpus()["quals"]
        enc = rans_nx16_encode(data, RANS_NX16_ORDER1)
        for cut in (1, len(enc) // 2, len(enc) - 1):
            try:
                out = rans_nx16_decode(enc[:cut])
            except (ValueError, IndexError, struct.error):
                continue
            assert out != data


from sniffles_tpu.io.cram31 import (  # noqa: E402
    arith_encode, arith_decode,
    ARITH_ORDER1, ARITH_EXT, ARITH_STRIPE, ARITH_NOSZ, ARITH_CAT,
    ARITH_RLE, ARITH_PACK,
)


class TestArith:
    @pytest.mark.parametrize("flags", [
        0,
        ARITH_ORDER1,
        ARITH_RLE,
        ARITH_RLE | ARITH_ORDER1,
        ARITH_PACK,
        ARITH_PACK | ARITH_ORDER1,
        ARITH_CAT,
        ARITH_EXT,
        ARITH_STRIPE,
        ARITH_STRIPE | ARITH_ORDER1,
    ])
    def test_roundtrip_all_corpora(self, flags):
        for name, data in corpus().items():
            enc = arith_encode(data, flags)
            dec = arith_decode(enc)
            assert dec == data, (name, flags)

    def test_compresses(self):
        c = corpus()
        for name in ("quals", "seq", "allsame", "text"):
            assert len(arith_encode(c[name], 0)) < len(c[name]), name
        # adaptive order-1 beats order-0 on correlated text
        assert (len(arith_encode(c["text"], ARITH_ORDER1))
                < len(arith_encode(c["text"], 0)))
        # RLE mode wins on run-heavy data
        assert (len(arith_encode(c["runs"], ARITH_RLE))
                < len(arith_encode(c["runs"], 0)))

    def test_nosz(self):
        data = corpus()["quals"]
        enc = arith_encode(data, ARITH_NOSZ)
        assert arith_decode(enc, expected_len=len(data)) == data

    def test_fuzz_roundtrip(self):
        rng = random.Random(9)
        all_flags = [0, ARITH_ORDER1, ARITH_RLE, ARITH_PACK, ARITH_STRIPE,
                     ARITH_RLE | ARITH_ORDER1, ARITH_PACK | ARITH_RLE]
        for trial in range(40):
            n = rng.randrange(0, 1200)
            alpha = rng.choice([2, 4, 5, 16, 64, 256])
            data = bytes(rng.randrange(alpha) for _ in range(n))
            flags = rng.choice(all_flags)
            assert arith_decode(arith_encode(data, flags)) == data, \
                (trial, n, alpha, flags)


from sniffles_tpu.io.cram31 import tok3_encode, tok3_decode  # noqa: E402


class TestTok3:
    def make_names(self, n=2000, style="illumina"):
        rng = random.Random(5)
        names = []
        if style == "illumina":
            tile = 1101
            for i in range(n):
                x, y = rng.randrange(30000), rng.randrange(30000)
                names.append(f"A00111:37:H3VVJDSXX:1:{tile}:{x}:{y}".encode())
                if i % 97 == 0:
                    tile += 1
        elif style == "ont":
            import uuid
            rng2 = random.Random(11)
            for i in range(n):
                names.append(str(uuid.UUID(int=rng2.getrandbits(128))).encode())
        else:  # serial
            for i in range(n):
                names.append(f"read{i:06d}".encode())
        return names

    @pytest.mark.parametrize("style", ["illumina", "ont", "serial"])
    @pytest.mark.parametrize("sep", [b"\n", b"\x00"])
    def test_roundtrip(self, style, sep):
        names = self.make_names(500, style)
        blob = sep.join(names) + sep
        assert tok3_decode(tok3_encode(blob)) == blob
        # without trailing separator
        blob2 = sep.join(names)
        assert tok3_decode(tok3_encode(blob2)) == blob2

    def test_compresses_structured_names(self):
        names = self.make_names(2000, "illumina")
        blob = b"\n".join(names) + b"\n"
        enc = tok3_encode(blob)
        import zlib
        assert len(enc) < len(zlib.compress(blob, 6))

    def test_duplicates_and_oddities(self):
        names = [b"r1", b"r1", b"r1", b"", b"x-y:z#7", b"0007", b"0008",
                 b"9999999999999999999999", b"a" * 300, b"r1"]
        blob = b"\n".join(names)
        assert tok3_decode(tok3_encode(blob)) == blob

    def test_fuzz(self):
        rng = random.Random(13)
        alphabet = b"ABCxyz0123456789_.:#-/"
        for trial in range(30):
            names = [bytes(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
                     for _ in range(rng.randrange(1, 60))]
            blob = b"\n".join(names)
            assert tok3_decode(tok3_encode(blob)) == blob, trial


from sniffles_tpu.io.cram31 import fqzcomp_encode, fqzcomp_decode  # noqa: E402


class TestFqzcomp:
    def make_quals(self, n_rec=60, mean_len=150, seed=3):
        rng = random.Random(seed)
        lens, quals = [], bytearray()
        for _ in range(n_rec):
            ln = max(1, int(rng.gauss(mean_len, 30)))
            lens.append(ln)
            q = 30
            for _ in range(ln):
                q = min(50, max(2, q + rng.choice([-2, -1, 0, 0, 0, 1, 2])))
                quals.append(q)
        return bytes(quals), lens

    def test_roundtrip(self):
        quals, lens = self.make_quals()
        enc = fqzcomp_encode(quals, lens)
        dec, dlens = fqzcomp_decode(enc, return_lengths=True)
        assert dec == quals and dlens == lens

    def test_compresses_correlated_quals(self):
        quals, lens = self.make_quals(120, 200)
        enc = fqzcomp_encode(quals, lens)
        import zlib
        assert len(enc) < len(zlib.compress(quals, 6))

    def test_edge_cases(self):
        assert fqzcomp_decode(fqzcomp_encode(b"", [])) == b""
        assert fqzcomp_decode(fqzcomp_encode(b"\x00", [1])) == b"\x00"
        # uniform lengths exercise the dup-length model
        q = bytes([17] * 500)
        assert fqzcomp_decode(fqzcomp_encode(q, [50] * 10)) == q
        # binary quals
        rng = random.Random(1)
        q = bytes(rng.choice((7, 45)) for _ in range(400))
        assert fqzcomp_decode(fqzcomp_encode(q, [100] * 4)) == q

    def test_length_mismatch_raises(self):
        with pytest.raises(ValueError):
            fqzcomp_encode(b"abc", [2])


class TestCram31EndToEnd:
    def test_bam_to_cram31_roundtrip(self, tmp_path):
        from sniffles_tpu.io.cramwrite import bam_to_cram
        from sniffles_tpu.io.cram import CramFile
        from sniffles_tpu.io.bam import AlignmentFile
        from sniffles_tpu.io.cram_codecs import (METHOD_RANS_NX16,
                                                 METHOD_FQZCOMP, METHOD_TOK3)

        bam_path = "/root/reference/src/tests/data/hg008.bam"
        cram_path = str(tmp_path / "hg008.31.cram")
        bam_to_cram(bam_path, cram_path, version=(3, 1))

        raw = open(cram_path, "rb").read()
        assert raw[4:6] == bytes((3, 1))

        cram = CramFile(cram_path)
        bam = AlignmentFile(bam_path)
        from tests.test_cram import _norm_cigar
        crecs = list(cram.fetch())
        brecs = list(bam.fetch())
        assert len(crecs) == len(brecs) > 0
        for c, b in zip(crecs, brecs):
            assert (c.query_name, c.flag, c.reference_id, c.reference_start,
                    c.mapping_quality, _norm_cigar(c.cigartuples),
                    c.query_sequence) == \
                   (b.query_name, b.flag, b.reference_id, b.reference_start,
                    b.mapping_quality, _norm_cigar(b.cigartuples),
                    b.query_sequence)

        # the 3.1 file actually exercises the new codecs
        methods = self._block_methods(raw)
        assert METHOD_RANS_NX16 in methods or METHOD_TOK3 in methods \
            or METHOD_FQZCOMP in methods, methods

    @staticmethod
    def _block_methods(raw):
        # walk containers/blocks collecting the method byte of each block
        from sniffles_tpu.io.cram import read_container_header
        from sniffles_tpu.io.cram_codecs import itf8_decode
        methods = set()
        off = 26
        while off < len(raw) - 38:
            hdr = read_container_header(raw, off)
            boff = off + hdr.header_size
            end = boff + hdr.length
            while boff < end:
                method = raw[boff]
                ctype = raw[boff + 1]
                o = boff + 2
                _, o = itf8_decode(raw, o)       # content id
                csize, o = itf8_decode(raw, o)   # compressed size
                _, o = itf8_decode(raw, o)       # raw size
                methods.add(method)
                boff = o + csize + 4             # + CRC32
            off = end
            if hdr.ref_seq_id == -1 and hdr.length <= 15:
                break
        return methods

    def test_e2e_vcf_identical_bam_vs_cram31(self, tmp_path):
        import subprocess, sys, os
        from sniffles_tpu.io.cramwrite import bam_to_cram
        bam_path = "/root/reference/src/tests/data/hg008.bam"
        cram_path = str(tmp_path / "hg008.31.cram")
        bam_to_cram(bam_path, cram_path, version=(3, 1))
        env = dict(os.environ)
        env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
        outs = {}
        for name, inp in (("bam", bam_path), ("cram", cram_path)):
            out = str(tmp_path / f"{name}.vcf")
            r = subprocess.run([sys.executable, "-m", "sniffles_tpu.cli",
                                "--input", inp, "--vcf", out, "--threads", "0"],
                               env=env, capture_output=True, text=True, timeout=300)
            assert r.returncode == 0, r.stderr[-2000:]
            outs[name] = [ln for ln in open(out) if not ln.startswith("##")]
        assert outs["bam"] == outs["cram"]
        assert sum(1 for ln in outs["bam"] if not ln.startswith("#")) == 4


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_roundtrip_cram31(tmp_path, seed):
    """Fuzzed records through the 3.1 writer -> reader (same battery as
    the 3.0 fuzz round trip in test_cram.py)."""
    from tests.test_cram import _make_fuzz_bam, _norm_cigar
    from sniffles_tpu.io.cramwrite import bam_to_cram
    from sniffles_tpu.io.bam import AlignmentFile

    bam_path = _make_fuzz_bam(tmp_path, seed)
    cram_path = str(tmp_path / "fuzz31.cram")
    bam_to_cram(bam_path, cram_path, records_per_slice=17, version=(3, 1))
    assert open(cram_path, "rb").read(6)[4:6] == bytes((3, 1))
    bam = AlignmentFile(bam_path)
    cram = AlignmentFile(cram_path, mode="rc", require_index=True)
    breads = list(bam.fetch())
    creads = list(cram.fetch())
    assert len(breads) == len(creads) > 0
    for b, c in zip(breads, creads):
        assert (b.query_name, b.flag, b.reference_id, b.reference_start,
                b.mapping_quality) == \
               (c.query_name, c.flag, c.reference_id, c.reference_start,
                c.mapping_quality)
        assert _norm_cigar(b.cigartuples) == _norm_cigar(c.cigartuples)
        assert b.query_sequence == c.query_sequence
        assert b.tags.keys() == c.tags.keys()
