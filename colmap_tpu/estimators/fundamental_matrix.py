"""Fundamental matrix estimation: 7-point, 8-point, Sampson residual.

Reference: src/colmap/estimators/fundamental_matrix.h:25,69. Batched JAX; the
7-point cubic is solved in closed form (math/polynomial.cubic_real_roots).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from colmap_tpu.estimators.utils import least_singular_vector, normalize_points, nullspace_from_rows
from colmap_tpu.math.polynomial import cubic_real_roots


def _epipolar_rows(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Rows a s.t. a . vec(F) = x2^T F x1 (vec row-major)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    one = jnp.ones_like(x1)
    return jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1
    )


def solve_7pt(p1: jax.Array, p2: jax.Array):
    """Minimal 7-point solver -> up to 3 F candidates.

    p1/p2: (7, 2). Returns ((3, 3, 3) models, (3,) valid).
    det(a F1 + (1 - a) F2) = 0 is a cubic in a.
    """
    A = _epipolar_rows(p1, p2)  # (7, 9)
    ns = nullspace_from_rows(A, 2)  # (9, 2)
    F1 = ns[:, 0].reshape(3, 3)
    F2 = ns[:, 1].reshape(3, 3)

    # det(a F1 + (1-a) F2) = c3 a^3 + c2 a^2 + c1 a + c0 via evaluation at
    # 4 points and polynomial interpolation (numerically robust, branch-free).
    ts = jnp.array([0.0, 1.0, -1.0, 2.0], dtype=p1.dtype)
    dets = jax.vmap(lambda t: jnp.linalg.det(t * F1 + (1.0 - t) * F2))(ts)
    # Vandermonde solve for coefficients [c3, c2, c1, c0]
    V = jnp.stack([ts**3, ts**2, ts, jnp.ones_like(ts)], axis=-1)
    coeffs = jnp.linalg.solve(V, dets)
    roots, valid = cubic_real_roots(coeffs[0], coeffs[1], coeffs[2], coeffs[3])

    def build(a):
        return a * F1 + (1.0 - a) * F2

    Fs = jax.vmap(build)(roots)
    # normalize to unit Frobenius norm
    Fs = Fs / (jnp.linalg.norm(Fs, axis=(-2, -1), keepdims=True) + 1e-12)
    valid &= jnp.isfinite(Fs).all(axis=(-2, -1))
    return Fs, valid


def _solve_8pt_normalized(p1, p2, weights=None):
    p1n, T1 = normalize_points(p1, weights)
    p2n, T2 = normalize_points(p2, weights)
    A = _epipolar_rows(p1n, p2n)
    if weights is not None:
        A = A * jnp.sqrt(weights)[..., None]
    f = least_singular_vector(A)
    F = f.reshape(f.shape[:-1] + (3, 3))
    # enforce rank 2
    U, s, Vt = jnp.linalg.svd(F)
    s = s.at[..., 2].set(0.0)
    F = U @ (s[..., :, None] * Vt)
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    F = F / (jnp.linalg.norm(F, axis=(-2, -1), keepdims=True) + 1e-12)
    ok = jnp.isfinite(F).all(axis=(-2, -1))
    return F, ok


def solve_8pt(p1: jax.Array, p2: jax.Array):
    """Normalized 8-point solver. p1/p2 (8+, 2) -> ((1,3,3), (1,))."""
    F, ok = _solve_8pt_normalized(p1, p2)
    return F[None], ok[None]


def refit(model: jax.Array, data: tuple, weights: jax.Array):
    del model
    p1, p2 = data
    return _solve_8pt_normalized(p1, p2, weights)


def sampson_residuals(F: jax.Array, data: tuple) -> jax.Array:
    """Squared Sampson error (first-order geometric; reference residual)."""
    p1, p2 = data
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    Fx1_0 = F[..., 0, 0] * x1 + F[..., 0, 1] * y1 + F[..., 0, 2]
    Fx1_1 = F[..., 1, 0] * x1 + F[..., 1, 1] * y1 + F[..., 1, 2]
    Fx1_2 = F[..., 2, 0] * x1 + F[..., 2, 1] * y1 + F[..., 2, 2]
    Ftx2_0 = F[..., 0, 0] * x2 + F[..., 1, 0] * y2 + F[..., 2, 0]
    Ftx2_1 = F[..., 0, 1] * x2 + F[..., 1, 1] * y2 + F[..., 2, 1]
    num = x2 * Fx1_0 + y2 * Fx1_1 + Fx1_2
    denom = Fx1_0**2 + Fx1_1**2 + Ftx2_0**2 + Ftx2_1**2
    return num * num / jnp.maximum(denom, 1e-12)


residuals = sampson_residuals
