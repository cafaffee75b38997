"""edlib-compatible facade over sniffles_tpu's Myers bit-parallel edit
distance (ops/edit_distance.py), for running the reference Sniffles2 in
this environment. The reference uses only `align(a, b)['editDistance']`
(reference sv.py:287, snfp.py:103; global/NW distance-task semantics).
"""
import os
import sys

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from sniffles_tpu.ops.edit_distance import edit_distance  # noqa: E402


def align(query: str, target: str, mode: str = "NW", task: str = "distance",
          k: int = -1, additionalEqualities=None) -> dict:
    return {"editDistance": edit_distance(query, target)}
