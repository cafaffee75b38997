"""`python -m sniffles_tpu` entry point."""
import sys

from sniffles_tpu.cli import main

sys.exit(main())
