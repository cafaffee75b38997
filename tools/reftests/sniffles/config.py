from sniffles_tpu.config import *  # noqa: F401,F403
