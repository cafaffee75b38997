from sniffles_tpu.io.vcf import *  # noqa: F401,F403
from sniffles_tpu.io.vcf import VCF  # noqa: F401
