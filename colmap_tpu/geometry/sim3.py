"""Similarity (Sim3) transforms as flat (..., 8) arrays: [s, qw qx qy qz, tx ty tz].

x_b = s * R x_a + t. Matches the reference's Sim3d
(src/colmap/geometry/sim3.h:46).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from colmap_tpu.geometry import rotation as rot

DIM = 8


def identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 1.0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def make(scale: jax.Array, q: jax.Array, t: jax.Array) -> jax.Array:
    return jnp.concatenate([jnp.asarray(scale)[..., None], q, t], axis=-1)


def scale(p: jax.Array) -> jax.Array:
    return p[..., 0]


def quat(p: jax.Array) -> jax.Array:
    return p[..., 1:5]


def trans(p: jax.Array) -> jax.Array:
    return p[..., 5:8]


def apply(p: jax.Array, x: jax.Array) -> jax.Array:
    return scale(p)[..., None] * rot.quat_rotate(quat(p), x) + trans(p)


def compose(b_from_a: jax.Array, a_from_c: jax.Array) -> jax.Array:
    s = scale(b_from_a) * scale(a_from_c)
    q = rot.quat_multiply(quat(b_from_a), quat(a_from_c))
    t = scale(b_from_a)[..., None] * rot.quat_rotate(quat(b_from_a), trans(a_from_c)) + trans(b_from_a)
    return make(s, rot.quat_normalize(q), t)


def inverse(p: jax.Array) -> jax.Array:
    si = 1.0 / scale(p)
    qi = rot.quat_conjugate(rot.quat_normalize(quat(p)))
    ti = -si[..., None] * rot.quat_rotate(qi, trans(p))
    return make(si, qi, ti)


def transform_rigid(new_from_old: jax.Array, cam_from_world: jax.Array) -> jax.Array:
    """Update a cam_from_world pose when the world is remapped by a Sim3.

    new_world = sim3(old_world); the camera pose in the new world is
    cam_from_new = cam_from_old * old_from_new, with the translation scaled
    so projections are preserved (reference: src/colmap/geometry/sim3.h
    TransformCameraWorld).
    """
    from colmap_tpu.geometry import rigid3

    inv = inverse(new_from_old)
    q = rot.quat_multiply(rigid3.quat(cam_from_world), quat(inv))
    t = rot.quat_rotate(rigid3.quat(cam_from_world), trans(inv)) + rigid3.trans(
        cam_from_world
    )
    # fold the residual scale into the translation so depths follow new world
    return rigid3.make(rot.quat_normalize(q), t * scale(new_from_old)[..., None])
