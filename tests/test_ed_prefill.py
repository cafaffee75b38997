"""Eager device ED-cache prefill for the combine identity gate
(CombineTask._prefill_ed_cache): pair selection matches the greedy's
probe radius and cached distances are exact."""
import numpy as np
import pytest

from sniffles_tpu.config import SnifflesConfig
from sniffles_tpu.ops import edit_distance_jax
from sniffles_tpu.ops.edit_distance import edit_distance
from sniffles_tpu.pipeline.tasks import CombineTask


class _Cand:
    def __init__(self, alt, pos, svlen):
        self.alt, self.pos, self.svlen = alt, pos, svlen


class _Group:
    def __init__(self, alt, pos_mean, len_mean):
        self.candidates = [_Cand(alt, pos_mean, len_mean)]
        self.pos_mean, self.len_mean = pos_mean, len_mean


def _rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture
def config():
    cfg = SnifflesConfig("--input", "x.snf", "--vcf", "y.vcf")
    cfg.tpu_combine = True
    return cfg


def test_prefill_exact_and_radius_gated(config, monkeypatch):
    monkeypatch.setattr(edit_distance_jax, "DEVICE_MIN_CELLS", 0)
    rng = np.random.default_rng(9)

    near = [_Cand(_rand_seq(rng, 120), 10_000 + i * 50, 120) for i in range(4)]
    far = [_Cand(_rand_seq(rng, 120), 900_000, 120)]
    keep = [_Group(_rand_seq(rng, 118), 10_050, 119)]

    task = CombineTask.__new__(CombineTask)
    cache = {}
    task._prefill_ed_cache(near + far, keep, cache, config)

    # every within-radius (lead, cand) pair is present and exact
    for lead in [keep[0].candidates[0]] + near:
        for cand in near:
            if lead.alt == cand.alt:
                continue
            key = (lead.alt, cand.alt)
            assert key in cache
            assert cache[key] == edit_distance(lead.alt, cand.alt)

    # the far candidate is outside every probe radius as a target of the
    # near leads
    for lead in near:
        assert (lead.alt, far[0].alt) not in cache


def test_prefill_skips_below_device_threshold(config):
    rng = np.random.default_rng(10)
    cands = [_Cand(_rand_seq(rng, 60), 5_000 + i * 40, 60) for i in range(3)]
    task = CombineTask.__new__(CombineTask)
    cache = {}
    # tiny batch: far below DEVICE_MIN_CELLS -> lazy host fill preferred
    task._prefill_ed_cache(cands, [], cache, config)
    assert cache == {}
