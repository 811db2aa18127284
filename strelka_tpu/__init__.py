"""strelka_tpu — a TPU-native small-variant calling engine.

A brand-new implementation of the capabilities of Strelka2
(Illumina/strelka, surveyed in SURVEY.md) designed TPU-first:

- batched, padded tensor programs over active-region tiles instead of
  the reference's per-position streaming engine
  (reference: starling_pos_processor_base.cpp)
- per-read likelihood evaluation as Pallas MXU kernels over
  read x haplotype tiles (reference: starling_read_align_score.cpp)
- genotyping/posterior models as vmapped dense tensor ops
  (reference: position_snp_call_pprob_digt.cpp, AlleleGroupGenotype.cpp,
  qscore_calculator.cpp)
- genome sharding over a jax.sharding.Mesh with halo'd region tiles
  instead of pyflow process fan-out.
"""

import jax as _jax

# Likelihood accumulation is float32 (the reference's blt_float_t is
# float, blt_util/blt_types.hh:27) but posterior normalization uses
# float64 (position_snp_call_pprob_digt.cpp:419 stores pprob as double).
# The tiny [loci, genotypes] posterior math is negligible on TPU; hot
# kernels pin f32/bf16 explicitly.
_jax.config.update("jax_enable_x64", True)

# f32 matmuls at full precision everywhere: TPU matmul defaults may
# round inputs to bf16, and the likelihood/grid matmuls feed
# exact-parity phred scores (one ulp flips a rounded Q at a boundary).
# Measured free on the scoring kernel (MXU already runs full f32
# passes for it); the grid/genotype matmuls are small.
_jax.config.update("jax_default_matmul_precision", "highest")

# persistent XLA compilation cache (opt-in): segment programs use
# fixed tile shapes, so with STRELKA_TPU_COMPILE_CACHE=<dir> every
# process after the first starts with warm compiles. Opt-in because
# XLA:CPU caches AOT machine code keyed loosely enough that a blob
# compiled under different reported CPU features can be loaded (and
# warn about possible SIGILL); on TPU the cache is safe and saves the
# 20-40s first compiles.
import os as _os

_cache_dir = _os.environ.get("STRELKA_TPU_COMPILE_CACHE")
if _cache_dir and _cache_dir != "0":
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass

# Crash observability for the native layer (blt_util/sig_handler.cpp
# analog): dump Python tracebacks on fatal signals so a fault inside
# ctypes-called C++ still leaves a usable context in the task log.
import faulthandler as _faulthandler

try:
    _faulthandler.enable()
except Exception:  # noqa: BLE001 - unavailable in exotic embeddings
    pass

# Keep glibc from munmap'ing the large per-region tables (expansion,
# pileup tiles) between calls: default malloc serves >128KB from mmap
# and returns it to the kernel on free, so every region re-pays the
# first-touch page-fault cost (tens of MB/s inside this VM). Raising
# M_MMAP_THRESHOLD and disabling trim keeps the heap pages resident,
# making every region after the first run at warm-allocation speed.
if _os.name == "posix":
    try:
        import ctypes as _ctypes
        _libc = _ctypes.CDLL(None, use_errno=True)
        _libc.mallopt(-1, -1)         # M_TRIM_THRESHOLD: never trim
        _libc.mallopt(-3, 1 << 30)    # M_MMAP_THRESHOLD: 1GB
    except Exception:  # noqa: BLE001 - allocator tuning is best-effort
        pass

__version__ = "0.1.0"
