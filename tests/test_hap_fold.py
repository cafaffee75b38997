"""Batched REF-haplotype bin counting (LeadProvider.fold_hap_spans) must
equal the per-read scalar form (record_hap_ref; reference:
leadprov.py:387-398)."""
import numpy as np

from sniffles_tpu.config import SnifflesConfig
from sniffles_tpu.leads import LeadProvider


def _cfg():
    return SnifflesConfig("--input", "x.bam", "--vcf", "y.vcf")


def test_fold_hap_spans_matches_scalar():
    rng = np.random.default_rng(2)
    for trial in range(30):
        spans = []
        for _ in range(int(rng.integers(0, 300))):
            hp = int(rng.integers(0, 3))
            s = int(rng.integers(0, 50_000)) // 100 * 100
            e = s + int(rng.integers(0, 15_000)) // 100 * 100
            spans.append((hp, s, e))
        a = LeadProvider(_cfg(), 0, "chr1")
        for h, s, e in spans:
            a.record_hap_ref(h, s, e, 100)
        b = LeadProvider(_cfg(), 0, "chr1")
        b.fold_hap_spans(spans, 100)
        assert a.leadhapcount["REF"] == b.leadhapcount["REF"], trial


def test_fold_hap_spans_empty():
    p = LeadProvider(_cfg(), 0, "chr1")
    p.fold_hap_spans([], 100)
    assert p.leadhapcount["REF"] == {}
