"""Native C++ decoder vs pure-Python path: records and extracted leads
must be identical."""
import dataclasses

import pytest

from sniffles_tpu.io import native
from sniffles_tpu.io.bam import AlignmentFile
from sniffles_tpu.leads import LeadProvider
from sniffles_tpu.region import Region
from sniffles_tpu.config import SnifflesConfig

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built (make -C native)")

HG008 = "/root/reference/src/tests/data/hg008.bam"


def lead_key(ld):
    d = dataclasses.asdict(ld)
    d.pop("read_id")  # ids depend on iteration counter only
    bnd = d.pop("bnd_info")
    if bnd:
        d["bnd"] = tuple(sorted(bnd.items()))
    d.pop("svtypes_starts_lens")
    return tuple(sorted((k, v) for k, v in d.items()))


@pytest.mark.parametrize("contig", ["chr1", "chr18", "chrX"])
def test_native_leads_match_python(contig):
    config = SnifflesConfig("--input", HG008, "--vcf", "x.vcf")
    bam = AlignmentFile(HG008, require_index=True)
    region = Region(contig, 0, bam.get_reference_length(contig))

    p_native = LeadProvider(config, 0, contig)
    p_native.coverage = __import__("numpy").zeros(region.end, dtype="uint16")
    native_leads = list(p_native._iter_region_native(bam, region))

    config2 = SnifflesConfig("--input", HG008, "--vcf", "x.vcf")
    p_py = LeadProvider(config2, 0, contig)
    p_py.coverage = __import__("numpy").zeros(region.end, dtype="uint16")
    py_leads = list(p_py._iter_region_python(bam, region))

    assert len(native_leads) == len(py_leads)
    for a, b in zip(native_leads, py_leads):
        assert lead_key(a) == lead_key(b)

    # coverage arrays identical
    assert (p_native.coverage == p_py.coverage).all()
    # NM statistics identical
    assert abs(config.average_regional_nm - config2.average_regional_nm) < 1e-12


def test_native_scan_counts():
    bam = AlignmentFile(HG008, require_index=True)
    total = 0
    for res, mask in bam.scan_region("chr18", 0, bam.get_reference_length("chr18"),
                                     min_event_len=45):
        total += int(mask.sum())
    assert total == 8
