"""Essential-matrix decomposition and pose recovery, batched.

Reference: src/colmap/geometry/essential_matrix.h:52-101.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from colmap_tpu.geometry import rigid3, rotation as rot
from colmap_tpu.geometry.triangulation import triangulate_point


def decompose_essential_matrix(E: jax.Array):
    """E (..., 3, 3) -> (R1, R2, t) with ||t|| = 1 (4 pose candidates R1/R2 x ±t)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce det +1
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
    return R1, R2, t


def essential_from_pose(cam2_from_cam1: jax.Array) -> jax.Array:
    """E = [t]_x R from a relative pose (reference: EssentialMatrixFromPose)."""
    R = rot.quat_to_rotmat(rigid3.quat(cam2_from_cam1))
    t = rigid3.trans(cam2_from_cam1)
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
    return rot.cross_matrix(t) @ R


def pose_from_essential_matrix(E: jax.Array, uv1: jax.Array, uv2: jax.Array,
                               mask: jax.Array | None = None):
    """Recover cam2_from_cam1 by cheirality voting over the 4 candidates.

    uv1/uv2: (N, 2) normalized rays; mask: (N,) valid flags.
    Returns (pose (7,), num_in_front (int), points3d (N, 3) in cam1 frame for
    the winning pose). Reference: PoseFromEssentialMatrix
    (geometry/essential_matrix.cc) — triangulates with each candidate and
    picks the one with most points in front of both cameras.
    """
    R1, R2, t = decompose_essential_matrix(E)
    q1 = rot.rotmat_to_quat(R1)
    q2 = rot.rotmat_to_quat(R2)
    cands = jnp.stack(
        [
            rigid3.make(q1, t),
            rigid3.make(q1, -t),
            rigid3.make(q2, t),
            rigid3.make(q2, -t),
        ]
    )  # (4, 7)
    identity = jnp.broadcast_to(rigid3.identity(E.dtype), (7,))

    if mask is None:
        mask = jnp.ones(uv1.shape[0], dtype=bool)

    def score(pose):
        X = triangulate_point(
            jnp.broadcast_to(identity, (uv1.shape[0], 7)),
            jnp.broadcast_to(pose, (uv1.shape[0], 7)),
            uv1,
            uv2,
        )
        z1 = X[..., 2]
        z2 = rigid3.apply(pose, X)[..., 2]
        # bound depth like the reference (kMinDepth/kMaxDepth gates)
        max_depth = 1000.0
        ok = (z1 > jnp.finfo(E.dtype).eps) & (z2 > jnp.finfo(E.dtype).eps)
        ok &= (z1 < max_depth) & (z2 < max_depth) & mask
        return jnp.sum(ok), X

    counts, Xs = jax.vmap(score)(cands)
    best = jnp.argmax(counts)
    return cands[best], counts[best], Xs[best]
