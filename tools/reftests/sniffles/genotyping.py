from sniffles_tpu.genotype import *  # noqa: F401,F403
