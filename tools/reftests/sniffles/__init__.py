"""Facade package mapping the reference's module layout
(sniffles.config/region/cluster/sv/leadprov/vcf/util, reference:
src/sniffles/) onto this framework's implementations, so the
REFERENCE'S OWN unit test suite (reference: src/tests/) runs unchanged
against sniffles-tpu (tests/test_reference_suite.py). Not installed;
only put on sys.path by that test and by tools that need it."""
