from sniffles_tpu.svcall import *  # noqa: F401,F403
from sniffles_tpu.svcall import SVCall, SVCallBNDInfo, SVGroup, resolve_bnd, call_from, call_groups, classify_splits, calculate_bounds  # noqa: F401
