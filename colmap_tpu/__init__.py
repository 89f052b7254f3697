"""colmap_tpu — a TPU-native Structure-from-Motion / Multi-View Stereo framework.

A from-scratch re-design of the COLMAP pipeline (reference:
/root/reference, COLMAP 3.11.0.dev0) for TPU hardware:

- All geometry/estimation math is written as batched, shape-static JAX
  programs that vmap/jit/shard cleanly (MXU-friendly GEMMs, lax control
  flow, fixed-capacity padding + masks instead of dynamic shapes).
- RANSAC is a *batched* hypothesis sweep (thousands of minimal problems
  solved in one program) instead of the reference's sequential trial loop
  (reference: src/colmap/optim/ransac.h).
- Bundle adjustment is a batched Levenberg-Marquardt with a matrix-free
  Schur-complement CG solver that shards over device meshes with psum
  collectives, replacing ceres (reference:
  src/colmap/estimators/bundle_adjustment.cc).
- The host orchestrates (incremental mapping decisions); the device does
  batched math.
"""

__version__ = "0.1.0"

import jax as _jax

# JAX's default matmul precision is bfloat16 on TPU (and surprisingly also on
# some CPU builds), which silently destroys the conditioning of DLT/SVD-based
# minimal solvers and BA normal equations (measured: 7e-2 abs error on a
# 64x64 f32 matmul). Geometry/estimation code requires true f32 matmuls
# (bf16x3 passes on the MXU — still fast). Throughput-critical GEMMs that
# tolerate bf16 (descriptor matching) opt back in explicitly with
# `precision=jax.lax.Precision.DEFAULT` / bf16 inputs.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compile cache: the mapper/BA programs are compiled per
# shape class and reused across processes and runs; on tunneled/remote
# TPU workers a cold compile takes seconds-to-minutes per program and
# dominated early scale runs. Opt out with COLMAP_TPU_NO_COMPILE_CACHE=1
# or point COLMAP_TPU_COMPILE_CACHE at a different directory.
import os as _os

if not _os.environ.get("COLMAP_TPU_NO_COMPILE_CACHE"):
    # One cache dir PER PLATFORM: XLA:CPU persists machine-feature-stamped
    # AOT executables, and loading one whose features mismatch the host
    # aborts the process (cpu_aot_loader). Keeping CPU-test entries out of
    # the TPU cache avoids that hazard and keeps the TPU dir small.
    _platform = _os.environ.get("JAX_PLATFORMS", "").split(",")[0] or "tpu"
    _cache_dir = _os.environ.get(
        "COLMAP_TPU_COMPILE_CACHE",
        _os.path.expanduser("~/.cache/jax_tpu_cache"
                            + ("" if _platform in ("tpu", "axon")
                               else f"_{_platform}")))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # only programs whose compile took >= 0.5 s are persisted: that is
        # every remote/TPU program but none of the thousands of sub-ms CPU
        # test programs (writing those to disk measurably slows the suite)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # older jax without the knobs
        pass
