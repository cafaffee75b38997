"""
BND alt syntax for all four orientations (VCF 4.2 §5.4) and BND cluster
re-splitting; ports reference src/tests/test_bnd.py.
"""
from dataclasses import dataclass
from unittest.mock import MagicMock

import pytest

from sniffles_tpu.cluster import Cluster, resplit_bnd
from sniffles_tpu.leads import Lead
from sniffles_tpu.svcall import SVCall, SVCallBNDInfo, resolve_bnd


@dataclass
class Info:
    id: str
    contig: str
    pos: int
    mate_contig: str
    mate_pos: int
    is_first: bool
    is_reverse: bool
    expected_alt: str = None
    expected_orientation: str = None


def make_test(info: Info):
    svcall = SVCall(
        contig=info.contig, pos=info.pos, id=info.id, ref='N', alt='<BND>', qual=60,
        filter='PASS', info={}, svtype='BND', svlen=0, end=info.pos, genotypes={},
        precise=True, support=10, rnames=None, qc=True, nm=-1, postprocess=MagicMock())
    ld = Lead(read_id=1, read_qname='read1', contig=info.contig, ref_start=info.pos,
              ref_end=info.pos, qry_start=1000, qry_end=1000, strand='+', mapq=60, nm=100)
    ld.bnd_info = SVCallBNDInfo(mate_contig=info.mate_contig, mate_ref_start=info.mate_pos,
                                is_first=info.is_first, is_reverse=info.is_reverse)
    cluster = Cluster(id=info.id[-1:], svtype='BND', contig=info.contig, start=info.pos,
                      end=info.pos, seed=info.pos, leads=[ld], repeat=False, leads_long=None,
                      hap_counts=(0, 0, 0, 0, 0, 0))
    svcall.postprocess.cluster = cluster
    return svcall, cluster


BND_CASES = [
    Info('bnd_W', 'chr2', 321681, 'chr17', 198982, True, True, 'N]chr17:198982]', '++'),
    Info('bnd_V', 'chr2', 321682, 'chr13', 123456, False, True, ']chr13:123456]N', '-+'),
    Info('bnd_U', 'chr13', 123456, 'chr2', 321682, True, False, 'N[chr2:321682[', '+-'),
    Info('bnd_X', 'chr13', 123457, 'chr17', 198983, False, False, '[chr17:198983[N', '--'),
    Info('bnd_Y', 'chr17', 198982, 'chr2', 321681, True, True, 'N]chr2:321681]', '++'),
    Info('bnd_Z', 'chr17', 198983, 'chr13', 123457, False, False, '[chr13:123457[N', '--'),
]


@pytest.mark.parametrize("ti", BND_CASES, ids=[t.id for t in BND_CASES])
def test_resolve_bnd(ti):
    svcall, cluster = make_test(ti)
    resolve_bnd(svcall, cluster)

    assert svcall.alt == ti.expected_alt
    assert svcall.info['CHR2'] == ti.mate_contig
    csv_fields = svcall._to_csv_line()
    assert csv_fields[:7] == ('BND', ti.expected_orientation[0], ti.contig, str(ti.pos),
                              ti.expected_orientation[1], ti.mate_contig, str(ti.mate_pos))


def _bnd_lead(read_id, qname, mate_contig, mate_pos, is_first=True, is_reverse=False):
    return Lead(read_id=read_id, read_qname=qname, contig='chr1', ref_start=10_000,
                ref_end=10_000, qry_start=read_id * 1000, qry_end=read_id * 1000, strand='+',
                mapq=60, nm=100,
                bnd_info=SVCallBNDInfo(mate_contig, mate_pos, is_first, is_reverse))


def test_resplit_bnd_single_cluster():
    cluster = Cluster(id='1', svtype='BND', contig='chr1', start=10_000, end=10_000,
                      seed=10_000,
                      leads=[_bnd_lead(1, 'read1', 'chr2', 20_000),
                             _bnd_lead(2, 'read2', 'chr2', 20_000)],
                      repeat=False, leads_long=None, hap_counts=(0, 0, 0, 0, 0, 0))
    res = list(resplit_bnd(cluster, 1000))
    assert len(res) == 1
    assert len(res[0].leads) == 2
    assert res[0].leads[0].bnd_info.mate_contig == 'chr2'


def test_resplit_bnd_separates_mates():
    """Leads with distant mates / different mate contigs split into distinct clusters."""
    cluster = Cluster(id='1', svtype='BND', contig='chr1', start=10_000, end=10_000,
                      seed=10_000,
                      leads=[_bnd_lead(1, 'r1', 'chr2', 20_000),
                             _bnd_lead(2, 'r2', 'chr2', 20_100),
                             _bnd_lead(3, 'r3', 'chr2', 90_000),
                             _bnd_lead(4, 'r4', 'chr3', 20_000)],
                      repeat=False, leads_long=None, hap_counts=(0, 0, 0, 0, 0, 0))
    res = list(resplit_bnd(cluster, 1000))
    assert len(res) == 3
    sizes = sorted(len(c.leads) for c in res)
    assert sizes == [1, 1, 2]
