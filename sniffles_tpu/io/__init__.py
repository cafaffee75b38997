"""I/O and file-format layer: BGZF, BAM/CRAM, FASTA, VCF, SNF, population SNF, tabix."""
