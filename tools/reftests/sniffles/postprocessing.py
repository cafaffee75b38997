from sniffles_tpu.postprocess import *  # noqa: F401,F403
