"""pyspoa-compatible facade over sniffles_tpu's POA work-alike
(ops/poa.py), for running the reference Sniffles2 in this environment.
The reference uses only `poa(sequences, algorithm=, genmsa=, min_coverage=,
m=, n=, g=, e=, q=, c=)` (reference local_asm.py:287-291).
"""
import os
import sys

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from sniffles_tpu.ops.poa import poa  # noqa: E402,F401
