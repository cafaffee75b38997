"""
Population SNF: population-scale allele-frequency annotation
(reference: snfp.py:25-201).
"""
from __future__ import annotations

import logging
import math
from dataclasses import dataclass, asdict
from typing import Optional

from sniffles_tpu.config import SnifflesConfig
from sniffles_tpu.io.snf import SNFileBase
from sniffles_tpu.svcall import SVCall
from sniffles_tpu.ops.edit_distance import edit_distance

log = logging.getLogger(__name__)


@dataclass
class PopulationVariant:
    """(reference: snfp.py:25-107)"""
    contig: str
    pos: int
    id: str
    alt: str

    svtype: str
    svlen: int
    end: int

    af: float
    genotyped_sample_count: int
    variant_sample_count: int

    @staticmethod
    def _calculate_frequency(genotypes: dict[int, tuple]) -> tuple[float, int, int]:
        total_alleles = 0
        variant_alleles = 0
        genotyped_samples = 0
        variant_samples = 0
        gp = SnifflesConfig.GLOBAL.genotype_ploidy

        for gt in genotypes.values():
            if gt[0] == '.':
                continue
            genotyped_samples += 1
            variant_number = gt[0] + gt[1]
            total_alleles += gp
            variant_alleles += variant_number
            if variant_number > 0:
                variant_samples += 1

        return variant_alleles / total_alleles, genotyped_samples, variant_samples

    @classmethod
    def from_svcall(cls, svcall: SVCall) -> Optional['PopulationVariant']:
        af, genotyped_samples, variant_samples = cls._calculate_frequency(svcall.genotypes)
        population_size = len(SnifflesConfig.GLOBAL.snf_input_info)

        if (genotyped_samples / population_size) < SnifflesConfig.GLOBAL.dev_population_min_gt:
            return None

        return cls(
            contig=svcall.contig,
            pos=svcall.pos,
            id=svcall.id,
            alt=svcall.alt,
            svtype=svcall.svtype,
            svlen=svcall.svlen,
            end=svcall.end,
            af=af,
            genotyped_sample_count=genotyped_samples,
            variant_sample_count=variant_samples,
        )

    def match(self, svcall: SVCall) -> int | None:
        """Distance if svcall is the same variant, else None (reference: snfp.py:91-107)."""
        config = SnifflesConfig.GLOBAL
        dist = abs(self.pos - svcall.pos) + abs(abs(self.svlen) - abs(svcall.svlen))
        minlen = float(min(abs(self.svlen), abs(svcall.svlen)))
        if dist > config.combine_match * math.sqrt(minlen) or dist > config.combine_match_max:
            return None

        if self.svtype == 'INS' and (limit := config.combine_pctseq):
            # bounded form: the gate only needs d vs svlen*(1-limit)
            k = int(math.ceil(self.svlen * (1.0 - limit)))
            distance = edit_distance(self.alt, svcall.alt, k=k)
            if (self.svlen - distance) / self.svlen <= limit:
                return None

        return dist


@dataclass
class PopulationInfo:
    version: int
    name: str
    description: str
    size: int


class PopulationSNF(SNFileBase):
    """(reference: snfp.py:118-192)"""
    _blocks = None

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._blocks = {}

    def _calculate_block_index(self, pos: int) -> int:
        return int(pos / self.config.snf_block_size) * self.config.snf_block_size

    def get_population_AF(self, svcall: SVCall) -> tuple[float, int] | None:
        if svcall.contig not in self._blocks:
            self._blocks[svcall.contig] = self.get_all_blocks(svcall.contig)

        block = str(self._calculate_block_index(svcall.pos))
        best_dist = None
        best_variant = None
        try:
            for pv in self._blocks[svcall.contig][block][svcall.svtype]:
                dist = pv.match(svcall)
                if dist is not None:
                    if best_dist is None or dist < best_dist:
                        best_dist = dist
                        best_variant = pv
        except KeyError:
            ...
        else:
            if best_variant is not None:
                return round(best_variant.af, 5), best_variant.genotyped_sample_count

        return None

    def _create_header(self, config: SnifflesConfig, main_index: dict, snf_candidate_count: int) -> dict:
        d = super()._create_header(config, main_index, snf_candidate_count)
        d['population'] = asdict(PopulationInfo(
            version=1,
            name='Population',
            description='A sample population',
            size=len(config.snf_input_info)
        ))
        return d

    def read_header(self):
        super().read_header()
        try:
            self.header['population'] = PopulationInfo(**self.header['population'])
        except Exception:
            log.warning('Unable to deserialize population information from SNF header.', exc_info=True)

    def _calculate_contig_coverages(self, *args, **kwargs) -> dict:
        return {}

    def store(self, svcand: SVCall) -> bool:
        if (variant := PopulationVariant.from_svcall(svcand)) is not None:
            super().store(variant)
        return variant is not None

    @classmethod
    def create(cls, config: SnifflesConfig, svcalls: list[SVCall]) -> 'PopulationSNF':
        """Build an in-memory population SNF from merged calls."""
        psnf = cls(config, False)
        for call in svcalls:
            psnf.store(call)
        return psnf


from sniffles_tpu.compat import alias_module_for_pickle

alias_module_for_pickle("sniffles.snfp", __name__,
                        [PopulationVariant, PopulationInfo])
