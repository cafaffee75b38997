"""Run the REFERENCE'S OWN unit test suite (reference: src/tests/)
against BOTH implementations and require identical per-test outcomes:

  * "ref"  — the genuine reference package at /root/reference/src
    (through tools/refshim's pysam facade, since htslib is absent here);
  * "ours" — this framework, through tools/reftests' `sniffles` facade
    package that maps the reference module layout onto sniffles_tpu.

Parity, not all-pass, is the assertion: the upstream snapshot's own
tests are partially stale against its own code (test_bnd constructs
Cluster without the hap_counts field added later), so the requirement
is that our implementation behaves exactly as the reference does on
every test id — same passes, same failures, same error types.
"""
import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"

RUNNER = textwrap.dedent("""
    import json, os, sys, unittest

    impl = sys.argv[1]
    os.chdir(os.path.join({ref_src!r}, "tests"))
    paths = [os.getcwd()]
    if impl == "ours":
        # the facade must shadow the real `sniffles` package
        paths.append(os.path.join({repo!r}, "tools", "reftests"))
    paths += [os.path.join({repo!r}, "tools", "refshim"), {repo!r},
              {ref_src!r}]  # ref_src last: `tests.common` for both sides,
                            # `sniffles` only when no facade shadows it
    sys.path[:0] = paths

    import sniffles.sv
    origin = sniffles.sv.__file__
    if impl == "ours":
        assert "reftests" in origin, origin
    else:
        assert "reference" in origin, origin

    outcomes = {{}}

    class Result(unittest.TestResult):
        def addSuccess(self, test):
            outcomes[test.id()] = "pass"
        def addFailure(self, test, err):
            outcomes[test.id()] = f"fail:{{err[0].__name__}}"
        def addError(self, test, err):
            outcomes[test.id()] = f"error:{{err[0].__name__}}"
        def addSkip(self, test, reason):
            outcomes[test.id()] = "skip"
        def addSubTest(self, test, subtest, err):
            key = test.id()
            if err is None:
                outcomes.setdefault(key, "pass")
            else:
                outcomes[key] = f"error:{{err[0].__name__}}"

    loader = unittest.TestLoader()
    suite = unittest.TestSuite()
    for name in ["test_bnd", "test_regions", "test_vcf", "test_bnd_leads",
                 "tests.test_params"]:
        suite.addTests(loader.loadTestsFromName(name))
    suite.run(Result())
    # normalize the two load paths of test_params
    norm = {{k.replace("tests.test_params", "test_params"): v
             for k, v in outcomes.items()}}
    print("OUTCOMES " + json.dumps(norm, sort_keys=True))
""").format(repo=REPO, ref_src=REF_SRC)


def run_suite(impl: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run([sys.executable, "-c", RUNNER, impl],
                       capture_output=True, text=True, timeout=600, env=env)
    for line in p.stdout.splitlines():
        if line.startswith("OUTCOMES "):
            return json.loads(line[len("OUTCOMES "):])
    raise AssertionError(f"{impl} runner produced no outcomes:\n"
                         f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


# Reference-test ids the reference itself cannot pass but this framework
# does: the same-strand BND truth cases (reference leadprov.py:83-84
# bails with None, its own tests then crash on lead.bnd_info; our
# Lead.for_bnd extracts them — leads.py:57) and the unresolved-<INS>
# serialization case (reference fails its own spec assertion).
OURS_STRICTLY_BETTER = {
    "test_bnd_leads.TestBNDLeadsRedLeft.test_LeadsPrimaryForward",
    "test_bnd_leads.TestBNDLeadsRedLeft.test_LeadsPrimaryReverse",
    "test_bnd_leads.TestBNDLeadsRedLeft.test_LeadsSupplementaryForward",
    "test_bnd_leads.TestBNDLeadsRedLeft.test_LeadsSupplementaryReverse",
    "test_bnd_leads.TestBNDLeadsRedRight.test_LeadsPrimaryForward",
    "test_bnd_leads.TestBNDLeadsRedRight.test_LeadsPrimaryReverse",
    "test_bnd_leads.TestBNDLeadsRedRight.test_LeadsSupplementaryForward",
    "test_bnd_leads.TestBNDLeadsRedRight.test_LeadsSupplementaryReverse",
    "test_bnd_leads.TestBNDLeadsRedRightHG002.test_LeadsPrimaryForward",
    "test_vcf.TestVCFFormat.test_unresolved_ins",
}


@pytest.mark.skipif(not os.path.isdir(REF_SRC), reason="reference not mounted")
def test_reference_suite_parity():
    ref = run_suite("ref")
    ours = run_suite("ours")
    assert set(ref) == set(ours), (set(ref) ^ set(ours))
    diffs = {k: (ref[k], ours[k]) for k in ref if ref[k] != ours[k]}
    unexpected = {k: v for k, v in diffs.items()
                  if not (k in OURS_STRICTLY_BETTER and v[1] == "pass")}
    assert not unexpected, unexpected
    # the documented improvements must actually hold (and the reference
    # must still fail them — if upstream fixes these, drop them here)
    for k in OURS_STRICTLY_BETTER:
        assert ours[k] == "pass", (k, ours[k])
        assert ref[k] != "pass", (k, ref[k])
    # sanity: the suite genuinely ran
    assert len(ref) >= 20, len(ref)
    assert sum(1 for v in ours.values() if v == "pass") >= 25, ours
