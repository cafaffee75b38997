from sniffles_tpu.region import *  # noqa: F401,F403
