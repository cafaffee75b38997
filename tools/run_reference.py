#!/usr/bin/env python3
"""Run the REAL reference Sniffles2 (/root/reference/src) in this
environment, backed by sniffles-tpu's I/O stack via tools/refshim
(pysam/edlib/spoa facades). Used by the differential e2e tests to diff
reference VCF output against ours byte-for-byte.

Usage: python tools/run_reference.py <sniffles args...>

One documented deviation from pristine reference behavior: reference
postprocessing.py:84-92 never assigns `end` for BND calls, so the first
BND in a task raises UnboundLocalError and later BNDs silently reuse
the PREVIOUS call's `end` for coverage lookups. We patch coverage() so
each BND is annotated with end == its own pos (the same semantics as
sniffles_tpu/postprocess.py:71), by annotating calls one at a time with
a sacrificial zero-length DEL seeded in front of each BND. Everything
else runs the pristine reference code.
"""
import copy
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
REF_SRC = os.environ.get("SNIFFLES_REF_SRC", "/root/reference/src")

sys.path.insert(0, _REPO)
sys.path.insert(0, REF_SRC)
sys.path.insert(0, os.path.join(_HERE, "refshim"))


def _patch_bnd_coverage():
    from sniffles import postprocessing

    orig = postprocessing.coverage

    def coverage_bnd_safe(calls, lead_provider):
        ret = lead_provider.coverage.mean()
        for c in calls:
            if c.svtype == "BND":
                seed = copy.copy(c)
                seed.svtype = "DEL"
                seed.svlen = 0
                orig([seed, c], lead_provider)
            else:
                orig([c], lead_provider)
        return ret

    postprocessing.coverage = coverage_bnd_safe


def main():
    import runpy
    _patch_bnd_coverage()
    sys.argv = ["sniffles"] + sys.argv[1:]
    runpy.run_path(os.path.join(REF_SRC, "sniffles", "sniffles"),
                   run_name="__main__")


if __name__ == "__main__":
    main()
