"""
sniffles-tpu: A TPU-native structural variant caller for long-read sequencing data.

A ground-up re-design of the capabilities of Sniffles2 (reference:
/root/reference, fritzsedlazeck/Sniffles) for TPU hardware:

- Host ingest: a self-contained BGZF/BAM/CRAM decoder (pure Python + C++
  accelerated) that emits fixed-width *signature tensors* instead of
  per-read Python objects (reference: src/sniffles/leadprov.py).
- Device compute: signature clustering as sort-and-segment kernels,
  vectorized robust statistics, closed-form genotyping and QC cascades
  under jit (reference: cluster.py, sv.py, postprocessing.py,
  genotyping.py) plus Pallas banded DP kernels for edit-distance and
  POA consensus (replacing edlib / pyspoa).
- Distribution: genome-bin sharding over a jax.sharding.Mesh with XLA
  collectives for cross-shard boundary clusters and multi-sample merge
  (replacing the reference's multiprocessing Pipe runtime,
  parallel.py).
- Formats: VCF 4.2 writer/reader, SNF candidate files, population SNF
  (reference: vcf.py, snf.py, snfp.py).
"""

import os as _os
import sys as _sys

# The environment sets PYTHONDONTWRITEBYTECODE=1, which forces every
# process to re-compile all imported sources (importing jax alone costs
# ~2s of builtins.compile per run). Reading .pyc is unaffected by the
# flag, so cache bytecode under the same per-user cache directory the
# XLA compile cache already uses; imports that happen after this point
# (numpy, jax, the rest of this package) hit it on warm runs.
if _sys.dont_write_bytecode and "PYTHONPYCACHEPREFIX" not in _os.environ:
    _sys.dont_write_bytecode = False
    _sys.pycache_prefix = _os.path.join(
        _os.path.expanduser("~"), ".cache", "sniffles-tpu", "pycache")

# Large numpy allocations default to madvise(MADV_HUGEPAGE); with THP
# defrag=madvise every first-touch fault then goes through synchronous
# compaction, measured at 46us/page (60x slowdown) on virtualized hosts.
# The decoder's multi-100MB scratch buffers hit this hard, so opt out.
_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
try:  # numpy may already be imported by the embedding application
    from numpy._core import multiarray as _ma
    if hasattr(_ma, "_set_madvise_hugepage"):
        _ma._set_madvise_hugepage(False)
except Exception:
    pass

# Persist XLA compilations across processes: every worker/run otherwise
# pays the full compile cost (tens of seconds per kernel shape on TPU)
# for the same clustering/QC/genotype programs. Respect an explicit user
# setting; fall back to the XDG cache.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    _cache = _os.path.join(
        _os.environ.get("XDG_CACHE_HOME",
                        _os.path.join(_os.path.expanduser("~"), ".cache")),
        "sniffles-tpu", "jax")
    try:
        _os.makedirs(_cache, exist_ok=True)
        _os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache
        # The env var is only read at jax import; if an embedding
        # application (or sitecustomize) already imported jax, apply the
        # setting through the live config instead.
        import sys as _sys
        if "jax" in _sys.modules:
            _sys.modules["jax"].config.update("jax_compilation_cache_dir",
                                              _cache)
    except OSError:
        pass
    except Exception:
        pass

VERSION = "sniffles-tpu"
# Feature lineage 2.8 (reference parity target), our own build counter
# after the '+'. The leading component must compare >= "2.5.3" as a
# string: both this tool and reference Sniffles2 auto re-QC SNF files
# whose recorded build sorts below that (reference: snf.py:68-81).
BUILD = "2.8.0+tpu.0.1.0"
SNF_VERSION = "S2_rc4"  # SNF layout compatible with reference snf.py

__version__ = BUILD
