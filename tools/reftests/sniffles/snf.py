from sniffles_tpu.io.snf import *  # noqa: F401,F403
