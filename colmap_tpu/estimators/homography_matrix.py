"""Homography estimation (4-point DLT + weighted refit + transfer residual).

Reference: src/colmap/estimators/homography_matrix.h:32. Batched/vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from colmap_tpu.estimators.utils import least_singular_vector, normalize_points


def _dlt_rows(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Build the 2N x 9 DLT constraint rows for x2 ~ H x1."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    r1 = jnp.stack([-x1, -y1, -one, zero, zero, zero, x1 * x2, y1 * x2, x2], axis=-1)
    r2 = jnp.stack([zero, zero, zero, -x1, -y1, -one, x1 * y2, y1 * y2, y2], axis=-1)
    return jnp.concatenate([r1, r2], axis=-2)


def _solve_dlt(p1, p2, weights=None):
    p1n, T1 = normalize_points(p1, weights)
    p2n, T2 = normalize_points(p2, weights)
    A = _dlt_rows(p1n, p2n)  # (2N, 9)
    if weights is not None:
        w2 = jnp.concatenate([weights, weights], axis=-1)
        A = A * jnp.sqrt(w2)[..., None]
    h = least_singular_vector(A)
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.linalg.inv(T2) @ Hn @ T1
    # normalize scale: H[2,2] = 1 where possible
    s = H[..., 2:3, 2:3]
    H = H / jnp.where(jnp.abs(s) > 1e-8, s, 1.0)
    ok = jnp.isfinite(H).all(axis=(-2, -1))
    return H, ok


def solve_4pt(p1: jax.Array, p2: jax.Array):
    """Minimal 4-point homography. p1/p2 (4, 2) -> (1, 3, 3), (1,) valid."""
    H, ok = _solve_dlt(p1, p2)
    return H[None], ok[None]


def refit(model: jax.Array, data: tuple, weights: jax.Array):
    """Weighted non-minimal DLT over all points (LO step)."""
    del model
    p1, p2 = data
    return _solve_dlt(p1, p2, weights)


def residuals(H: jax.Array, data: tuple) -> jax.Array:
    """Squared transfer error ||x2 - proj(H x1)||^2 (reference residual)."""
    p1, p2 = data
    x = H[..., 0, 0] * p1[..., 0] + H[..., 0, 1] * p1[..., 1] + H[..., 0, 2]
    y = H[..., 1, 0] * p1[..., 0] + H[..., 1, 1] * p1[..., 1] + H[..., 1, 2]
    w = H[..., 2, 0] * p1[..., 0] + H[..., 2, 1] * p1[..., 1] + H[..., 2, 2]
    w = jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)
    dx = x / w - p2[..., 0]
    dy = y / w - p2[..., 1]
    return dx * dx + dy * dy
