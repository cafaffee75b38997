"""
Binomial-likelihood genotyping.

Host-side exact port of the reference genotyper hierarchy (reference:
genotyping.py:22-241). A vectorized jnp version covering the same math
over candidate batches lives in ops/genotype_batch.py and is the device
path used by the TPU pipeline.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

from sniffles_tpu.postprocess import rescale_support
from sniffles_tpu.svcall import SVCall


class UnknownGenotypeError(Exception):
    """Unable to determine genotype."""


def binomial_probability(k, n, p):
    """Binomial coefficient cancels out for likelihood ratios (reference: genotyping.py:28-33)."""
    try:
        return (p ** k) * ((1.0 - p) ** (n - k))
    except OverflowError:
        return 1.0


def likelihood_ratio(q1, q2):
    if q1 / q2 > 0:
        try:
            return math.log(q1 / q2, 10)
        except ValueError:
            return 0
    else:
        return 0


@dataclass
class Genotype:
    a: int
    b: int
    qual: int  # GQ, 0-60
    dr: int
    dv: int
    phase: Any


class Genotyper:
    """Generic genotyping (reference: genotyping.py:62-183)."""
    _support: int
    _coverage: float

    def __init__(self, svcall: SVCall, config, phase: tuple | None):
        self.svcall = svcall
        self.config = config
        self.phase = phase if phase is not None else self._get_phase()

    def _get_phase(self) -> tuple | None:
        try:
            return self.svcall.genotypes[0][5]
        except (KeyError, IndexError):
            return None

    def _calculate_support(self) -> int:
        return self.svcall.support

    def _calculate_coverage(self, support: int) -> int:
        return self._get_coverage_from_list()

    @staticmethod
    def _calculate_af(support: int, coverage: int) -> float:
        return support / float(coverage)

    def _get_coverage_from_list(self, coverage_list: list = None) -> int:
        svcall = self.svcall
        if coverage_list is None:
            coverage_list = [svcall.coverage_start, svcall.coverage_center, svcall.coverage_end]

        coverage_list = [c for c in coverage_list if c != 0]

        if len(coverage_list) > 0:
            if None in coverage_list:
                new_coverage_list = [c for c in coverage_list if c is not None]
                if len(new_coverage_list) > 0:
                    return round(sum(new_coverage_list) / len(new_coverage_list))
                raise UnknownGenotypeError()
            return round(sum(coverage_list) / len(coverage_list))
        raise UnknownGenotypeError()

    def _filter_by_z_score(self, z_score: float) -> bool:
        return z_score < self.config.genotype_min_z_score and not self.config.mosaic

    def calculate(self):
        config = self.config
        normalization_target = 250
        hom_ref_p = config.genotype_error
        het_p = (1.0 / config.genotype_ploidy)
        hom_var_p = 1.0 - config.genotype_error
        svcall = self.svcall

        support = self._calculate_support()
        try:
            coverage = self._calculate_coverage(support)
        except UnknownGenotypeError:
            svcall.filter = 'GT_FAILED'
            svcall.qc = False
            return

        if support > coverage:
            coverage = support

        af = self._calculate_af(support, coverage)

        genotype_p = [((0, 0), hom_ref_p),
                      ((0, 1), het_p),
                      ((1, 1), hom_var_p)]

        max_lead = max(support, coverage)
        if max_lead > normalization_target:
            norm = normalization_target / float(max_lead)
            normalized_support = round(support * norm)
            normalized_coverage = round(coverage * norm)
        else:
            normalized_support = support
            normalized_coverage = coverage

        genotype_likelihoods = []
        for gt, p in genotype_p:
            q = binomial_probability(normalized_support, normalized_coverage, p)
            genotype_likelihoods.append((gt, q))
        genotype_likelihoods.sort(key=lambda k: k[1], reverse=True)

        sum_likelihoods = sum(q for gt, q in genotype_likelihoods)
        normalized_likelihoods = [(gt, (q / sum_likelihoods)) for gt, q in genotype_likelihoods]

        gt1, q1 = normalized_likelihoods[0]
        gt2, q2 = normalized_likelihoods[1]
        qz = [q for gt, q in normalized_likelihoods if gt == (0, 0)][0]
        genotype_z_score = min(60, int((-10) * likelihood_ratio(qz, q1)))
        genotype_quality = min(60, int((-10) * likelihood_ratio(q2, q1)))
        update_this_dup = "DUP" == svcall.svtype and af >= self.config.dev_min_dup_vaf

        if svcall.filter == "PASS" and self._filter_by_z_score(genotype_z_score):
            svcall.filter = "GT" if not update_this_dup else "PASS"
            svcall.qc = not config.pass_only

        a, b = gt1
        if update_this_dup and (0, 0) == gt1:
            a, b = (0, 1)
        svcall.genotypes[0] = (a, b, genotype_quality, coverage - support, support, self.phase)
        svcall.set_info("VAF", af)


class InsertionGenotyper(Genotyper):
    """(reference: genotyping.py:186-203)"""

    def _calculate_support(self):
        return rescale_support(self.svcall, self.config)

    def _calculate_coverage(self, coverage_list: list = None) -> float:
        return self._get_coverage_from_list([self.svcall.coverage_center])

    def _filter_by_z_score(self, z_score: float) -> bool:
        flt = super()._filter_by_z_score(z_score)
        if flt and self.svcall.svlen >= self.config.long_ins_length and self.config.detect_large_ins:
            return False
        return flt


class DuplicationGenotyper(Genotyper):
    """(reference: genotyping.py:206-215)"""

    def _calculate_coverage(self, support: int) -> float:
        svcall = self.svcall
        return self._get_coverage_from_list([svcall.coverage_start, svcall.coverage_end]) + round(support * 0.75)


class InversionGenotyper(Genotyper):
    """(reference: genotyping.py:218-223)"""

    def _calculate_coverage(self, support: int) -> int:
        svcall = self.svcall
        return self._get_coverage_from_list([svcall.coverage_upstream, svcall.coverage_downstream]) + round(support * 0.5)


class DeletionGenotyper(Genotyper):
    """(reference: genotyping.py:226-233)"""

    def _calculate_coverage(self, support: int) -> int:
        svcall = self.svcall
        if support_sa := svcall.get_info('SUPPORT_SA'):
            return self._get_coverage_from_list([svcall.coverage_start + support_sa,
                                                 svcall.coverage_center + support_sa,
                                                 svcall.coverage_end + support_sa])
        return super()._calculate_coverage(support)


GENOTYPER_BY_TYPE = {
    'INS': InsertionGenotyper,
    'DEL': DeletionGenotyper,
    'DUP': DuplicationGenotyper,
    'INV': InversionGenotyper,
}
