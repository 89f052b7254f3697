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
