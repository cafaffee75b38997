"""CI guard: no contiguous run of >= 5 identical substantive lines may
appear between any pipeline module and its reference counterpart.

Uses the same difflib methodology as tools/copycheck.py (which the
round-2 audit used): blank/comment/trivial lines are excluded, matching
is on exact line text.  Matching the reference's *behavior* is the
acceptance criterion; matching its *text* is not allowed.
"""
import importlib.util
import pathlib

import pytest

TOOLS = pathlib.Path(__file__).resolve().parent.parent / "tools" / "copycheck.py"
spec = importlib.util.spec_from_file_location("copycheck", TOOLS)
copycheck = importlib.util.module_from_spec(spec)
spec.loader.exec_module(copycheck)

MAX_IDENTICAL_BLOCK = 4


@pytest.mark.parametrize("repo_rel,ref_rel", sorted(copycheck.PAIRS.items()))
def test_no_copied_blocks(repo_rel, ref_rel):
    report = copycheck.audit(repo_rel, ref_rel)
    if report is None:
        pytest.skip(f"reference file {ref_rel} not present")
    assert report["largest_block"] <= MAX_IDENTICAL_BLOCK, (
        f"{repo_rel}: {report['largest_block']}-line identical block vs "
        f"reference {ref_rel} (limit {MAX_IDENTICAL_BLOCK}); "
        f"run tools/copycheck.py --verbose for locations")
