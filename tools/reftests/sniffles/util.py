from sniffles_tpu.util import *  # noqa: F401,F403
