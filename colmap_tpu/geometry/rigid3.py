"""Rigid (SE3) transforms as flat (..., 7) arrays: [qw qx qy qz tx ty tz].

A transform `b_from_a` maps points as x_b = R x_a + t, matching the
reference's Rigid3d (src/colmap/geometry/rigid3.h:41). Image poses are
`cam_from_world` transforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from colmap_tpu.geometry import rotation as rot

DIM = 7


def identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def make(q: jax.Array, t: jax.Array) -> jax.Array:
    return jnp.concatenate([q, t], axis=-1)


def quat(p: jax.Array) -> jax.Array:
    return p[..., :4]


def trans(p: jax.Array) -> jax.Array:
    return p[..., 4:7]


def normalize(p: jax.Array) -> jax.Array:
    return make(rot.quat_normalize(quat(p)), trans(p))


def apply(p: jax.Array, x: jax.Array) -> jax.Array:
    """Apply transform to points x (..., 3)."""
    return rot.quat_rotate(quat(p), x) + trans(p)


def compose(b_from_a: jax.Array, a_from_c: jax.Array) -> jax.Array:
    """Compose: (b_from_a) * (a_from_c) = b_from_c."""
    q = rot.quat_multiply(quat(b_from_a), quat(a_from_c))
    t = rot.quat_rotate(quat(b_from_a), trans(a_from_c)) + trans(b_from_a)
    return make(rot.quat_normalize(q), t)


def inverse(p: jax.Array) -> jax.Array:
    qi = rot.quat_conjugate(rot.quat_normalize(quat(p)))
    ti = -rot.quat_rotate(qi, trans(p))
    return make(qi, ti)


def to_matrix(p: jax.Array) -> jax.Array:
    """(..., 7) -> (..., 3, 4) [R | t]."""
    R = rot.quat_to_rotmat(rot.quat_normalize(quat(p)))
    return jnp.concatenate([R, trans(p)[..., None]], axis=-1)


def from_matrix(m: jax.Array) -> jax.Array:
    """(..., 3, 4) -> (..., 7)."""
    q = rot.rotmat_to_quat(m[..., :3, :3])
    return make(q, m[..., :3, 3])


def projection_center(cam_from_world: jax.Array) -> jax.Array:
    """Camera center in world coordinates: -R^T t."""
    q = rot.quat_normalize(quat(cam_from_world))
    return -rot.quat_rotate(rot.quat_conjugate(q), trans(cam_from_world))


def exp_update(p: jax.Array, delta: jax.Array) -> jax.Array:
    """Left-multiplicative local update used by BA/pose refinement.

    delta (..., 6) = [omega (3), dt (3)]:
      R <- exp([omega]x) R,  t <- t + dt.
    This matches a quaternion manifold plus Euclidean translation, the same
    parameterization class the reference uses for ceres manifolds
    (src/colmap/estimators/manifold.h).
    """
    dq = rot.quat_from_axis_angle(delta[..., :3])
    q = rot.quat_multiply(dq, quat(p))
    t = trans(p) + delta[..., 3:6]
    return make(rot.quat_normalize(q), t)
