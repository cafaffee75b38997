"""
Genomic region model (reference: region.py).

0-based, half-open intervals.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

log = logging.getLogger(__name__)


@dataclass
class Region:
    """A genomic region; coordinates are 0-based, half open (reference: region.py:18-57)."""
    contig: str
    start: int
    end: int

    @classmethod
    def from_bed_line(cls, line: str) -> Optional['Region']:
        try:
            contig, start, end = line.split('\t')[:3]
            return Region(contig=contig, start=int(start), end=int(end))
        except ValueError as ex:
            log.warning(f'Invalid region line: {line} ({ex})')
            return None

    @classmethod
    def from_string(cls, value: str) -> Optional['Region']:
        try:
            contig, pos = value.split(':')
            start, end = map(int, pos.split('-'))
            return Region(contig=contig, start=start, end=end)
        except ValueError as ex:
            log.warning(f'Invalid region string: {value} ({ex})')
            return None

    def __str__(self) -> str:
        return f'{self.contig}:{self.start}-{self.end}'


from sniffles_tpu.compat import alias_module_for_pickle

alias_module_for_pickle("sniffles.region", __name__, [Region])
