"""`python -m sniffles_tpu` entry point."""
import os
import sys

from sniffles_tpu.cli import main


def _exit(code: int) -> None:
    # Hard exit: background JAX warmup/dispatcher threads may still be
    # inside native XLA code; normal interpreter finalization while a
    # daemon thread compiles segfaults at teardown. All outputs are
    # flushed/closed by main() before it returns.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)


_exit(main())
