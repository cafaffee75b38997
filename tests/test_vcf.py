"""
VCF serialization vs VCF 4.2 spec examples; ports the reference's
output-contract tests (reference: src/tests/test_vcf.py) including the
regressions for issues #31, #501, #580.
"""
from unittest.mock import Mock

import pytest

from sniffles_tpu.svcall import SVCall
from sniffles_tpu.io.vcf import VCF


def get_config():
    config = Mock()
    config.sample_ids_vcf = []
    config.output_rnames = True
    config.mosaic_af_max = 0.3
    config.mosaic = False
    config.id_prefix = 'Sniffles.'
    config.symbolic = False
    config.max_del_seq_len = 50000
    config.genotype_format = "GT:GQ:DR:DV"
    config.minsvlen = 1
    config.qc_nm_measure = False
    config.dev_emit_sv_lengths = False
    config.phase = False
    config.mode = "call_sample"
    config.genotype_none = (".", ".", 0, 0, 0, (None, None))
    return config


def get_vcf(reference: str):
    vcf = VCF(get_config(), None)
    vcf.reference_handle = Mock()
    vcf.reference_handle.fetch = Mock(side_effect=lambda refname, start, end: reference[start:end])
    return vcf


def get_svcall(**kwargs):
    sv_kwargs = {
        'contig': 'chr1',
        'id': 'unittest-1',
        'qual': 10,
        'filter': 'PASS',
        'info': {},
        'genotypes': {},
        'precise': True,
        'support': 100,
        'rnames': ['ut'],
        'postprocess': None,
        'qc': True,
        'nm': -1,
        'fwd': 1,
        'rev': 1,
    }
    sv_kwargs.update(kwargs)
    return SVCall(**sv_kwargs)


def parse_written(mock_write_raw):
    (args, _), = [mock_write_raw.call_args]
    flds = args[0].split('\t')
    assert len(flds) > 8
    contig, pos, id_, ref, alt, qual, filter_, info = flds[:8]
    return contig, int(pos), id_, ref, alt, qual, filter_, info


def parse_info(info: str):
    flags, flds = set(), {}
    for fld in info.split(';'):
        if '=' in fld:
            k, v = fld.split('=')
            flds[k] = v
        else:
            flags.add(fld)
    return flags, flds


def test_spec_ins():
    """VCF spec 4.2, chapter 5.2.2: anchor base prefixed to INS alt."""
    vcf = get_vcf('atCga')
    vcf.write_raw = Mock()
    vcf.write_call(get_svcall(svtype='INS', ref='N', alt='TAG', pos=3, svlen=3, end=3))
    contig, pos, id_, ref, alt, *_ = parse_written(vcf.write_raw)
    assert (contig, id_) == ('chr1', 'Sniffles.unittest-1')
    assert pos == 3 and ref == 'C' and alt == 'CTAG'
    vcf.reference_handle.fetch.assert_called_with('chr1', 2, 3)


def test_spec_del():
    """VCF spec 4.2, chapter 5.2.3: DEL ref sequence resolution."""
    vcf = get_vcf('aTCGa')
    vcf.write_raw = Mock()
    vcf.write_call(get_svcall(svtype='DEL', ref='N', alt='<DEL>', pos=2, svlen=-2, end=4))
    _, pos, _, ref, alt, _, _, info = parse_written(vcf.write_raw)
    assert pos == 2 and ref == 'TCG' and alt == 'T'
    _, fields = parse_info(info)
    assert fields['SVLEN'] == '-2'
    assert fields['END'] == '4'


def test_del_issue31():
    """Long DEL ref sequence at genomic offset (reference issue #31)."""
    reference = ('CAGTGGGGATGTGCTGCGGGGAGGGGGGCGCGGGTCCGCAGTGGGGATGTGCTGCCGGGAGGGGGGCGCGGGTCCGCAGTGGGG'
                 'ATGTGCTGCCGGGAGGGGGGCGCGGGTCCGCAGTGGGGATGTGCTGCCGGGAGGGGGGCGCGGGTCCGCAGTGGGGATGTGCTG'
                 'CCGGGAGGGGGGCGCGGGTCCGCAGTGGGGAT')

    vcf = VCF(get_config(), None)
    vcf.reference_handle = Mock()
    vcf.reference_handle.fetch = Mock(
        side_effect=lambda refname, start, end: reference[start - 964600:end - 964600])
    vcf.write_raw = Mock()
    vcf.write_call(get_svcall(svtype='DEL', ref='N', alt='<DEL>', pos=964631, svlen=-75,
                              end=964631 - 75))
    _, pos, _, ref, alt, *_ = parse_written(vcf.write_raw)
    assert pos == 964631
    assert ref == 'CGGGTCCGCAGTGGGGATGTGCTGCCGGGAGGGGGGCGCGGGTCCGCAGTGGGGATGTGCTGCCGGGAGGGGGGCG'
    assert alt == 'C'


def test_unresolved_ins():
    """Unresolved INS stays symbolic with anchor ref base (reference issue #501)."""
    vcf = get_vcf('T' * 50)
    vcf.write_raw = Mock()
    vcf.write_call(get_svcall(svtype='INS', ref='N', alt='<INS>', pos=2, svlen=20, end=22))
    _, pos, _, ref, alt, *_ = parse_written(vcf.write_raw)
    assert pos == 2 and ref == 'T' and alt == '<INS>'


def test_del_end_issue580():
    """END consistency for precise DELs (reference issue #580)."""
    reference = ('TTAACCCCTAACCCTAACCCTTGACCCTAACCCTTGACCCTAACCCCTGACCCTGACCCTTAACCCTAACCCCTAACCCTTAAC'
                 'CCTTAAACCTTAACCCTCATCCTCACCCTCACCCTCACCCCTAACCCTAACCCCTAACCCCTAACCCAAACCCTAACCCTAAAC'
                 'CCTAACCCTAAACCCAACCCAAACCCTAACCT')
    vcf = VCF(get_config(), None)
    vcf.reference_handle = Mock()
    vcf.reference_handle.fetch = Mock(
        side_effect=lambda refname, start, end: reference[start - 180400:end - 180400])
    vcf.write_raw = Mock()
    vcf.write_call(get_svcall(svtype='DEL', ref='N', alt='<DEL>', pos=180431, svlen=-91,
                              end=180521))
    _, pos, _, ref, alt, _, _, info = parse_written(vcf.write_raw)
    assert pos == 180431
    assert ref == ('CCCTTGACCCTAACCCCTGACCCTGACCCTTAACCCTAACCCCTAACCCTTAACCCTTAAACCTTAACCCTCATCCTC'
                   'ACCCTCACCCTCAC')
    assert alt == 'C'
    assert 'END=180522' in info


def test_iupac_cleanup():
    """Ambiguous IUPAC symbols in ref/alt become N."""
    vcf = get_vcf('aR' + 'G' * 50)
    vcf.write_raw = Mock()
    vcf.write_call(get_svcall(svtype='INS', ref='N', alt='TAG', pos=2, svlen=3, end=2))
    _, pos, _, ref, alt, *_ = parse_written(vcf.write_raw)
    assert ref == 'N'
    assert alt == 'NTAG'


def test_qual_clamped():
    vcf = get_vcf('A' * 10)
    vcf.write_raw = Mock()
    vcf.write_call(get_svcall(svtype='INS', ref='N', alt='GGG', pos=3, svlen=3, end=3, qual=1000))
    *_, qual, _, _ = parse_written(vcf.write_raw)[:8][:8]
    flds = vcf.write_raw.call_args[0][0].split('\t')
    assert flds[5] == '60'
