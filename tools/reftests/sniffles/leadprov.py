from sniffles_tpu.leads import *  # noqa: F401,F403
