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
