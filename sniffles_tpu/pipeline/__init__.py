"""Run-mode pipelines: call_sample, genotype_vcf, combine; task planning and host runtime."""
