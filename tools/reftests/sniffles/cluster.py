from sniffles_tpu.cluster import *  # noqa: F401,F403
