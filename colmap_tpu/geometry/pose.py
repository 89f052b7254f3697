"""Pose utilities: interpolation, relative poses, cheirality.

Reference: src/colmap/geometry/pose.h:45-110.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from colmap_tpu.geometry import rigid3, rotation as rot


def interpolate_pose(p1: jax.Array, p2: jax.Array, t) -> jax.Array:
    """Slerp rotation + lerp translation (reference: InterpolateCameraPoses)."""
    q = rot.quat_slerp(rigid3.quat(p1), rigid3.quat(p2), t)
    tt = jnp.asarray(t)
    tr = (1.0 - tt)[..., None] * rigid3.trans(p1) + tt[..., None] * rigid3.trans(p2)
    return rigid3.make(q, tr)


def relative_pose(cam1_from_world: jax.Array, cam2_from_world: jax.Array) -> jax.Array:
    """cam2_from_cam1."""
    return rigid3.compose(cam2_from_world, rigid3.inverse(cam1_from_world))


def check_cheirality(cam2_from_cam1: jax.Array, uv1: jax.Array, uv2: jax.Array,
                     min_depth: float = 1e-6, max_depth: float = 1000.0) -> jax.Array:
    """Boolean mask of correspondences triangulating in front of both cameras."""
    from colmap_tpu.geometry.triangulation import triangulate_point

    n = uv1.shape[0]
    identity = jnp.broadcast_to(rigid3.identity(uv1.dtype), (n, 7))
    pose = jnp.broadcast_to(cam2_from_cam1, (n, 7))
    X = triangulate_point(identity, pose, uv1, uv2)
    z1 = X[..., 2]
    z2 = rigid3.apply(pose, X)[..., 2]
    return (z1 > min_depth) & (z2 > min_depth) & (z1 < max_depth) & (z2 < max_depth)
