"""Homography decomposition (Malis-Vargas), batched.

Reference: src/colmap/geometry/homography_matrix.h — DecomposeHomographyMatrix
returns up to 4 (R, t, n) solutions; PoseFromHomographyMatrix picks by
cheirality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from colmap_tpu.geometry import rigid3, rotation as rot
from colmap_tpu.geometry.triangulation import triangulate_point


def homography_from_pose(K1: jax.Array, K2: jax.Array, R: jax.Array,
                         t: jax.Array, n: jax.Array, d: jax.Array) -> jax.Array:
    """H = K2 (R - t n^T / d) K1^-1."""
    return K2 @ (R - t[..., :, None] @ n[..., None, :] / d[..., None, None]) @ jnp.linalg.inv(K1)


def _normalize_homography(H: jax.Array) -> jax.Array:
    """Scale H so its middle singular value is 1."""
    s = jnp.linalg.svd(H, compute_uv=False)
    return H / s[..., 1:2, None]


def decompose_homography(H: jax.Array):
    """Malis-Vargas analytic decomposition of a calibrated homography.

    H: (3, 3) normalized-coordinate homography (K2^-1 H_pix K1).
    Returns (R (4,3,3), t (4,3), n (4,3), valid (4,)) candidate solutions.
    """
    H = _normalize_homography(H)
    # If H is (close to) a pure rotation, S ~ 0.
    S = H.T @ H - jnp.eye(3, dtype=H.dtype)

    def opposite_of_minor(M, row, col):
        x1 = 2 if col == 0 else 0
        x2 = 1 if col == 2 else 2
        y1 = 2 if row == 0 else 0
        y2 = 1 if row == 2 else 2
        return M[y1, x2] * M[y2, x1] - M[y1, x1] * M[y2, x2]

    M00 = opposite_of_minor(S, 0, 0)
    M11 = opposite_of_minor(S, 1, 1)
    M22 = opposite_of_minor(S, 2, 2)
    rt00 = jnp.sqrt(jnp.maximum(M00, 0.0))
    rt11 = jnp.sqrt(jnp.maximum(M11, 0.0))
    rt22 = jnp.sqrt(jnp.maximum(M22, 0.0))
    M01 = opposite_of_minor(S, 0, 1)
    M12 = opposite_of_minor(S, 1, 2)
    M02 = opposite_of_minor(S, 0, 2)

    e12 = jnp.where(M12 >= 0, 1.0, -1.0)
    e02 = jnp.where(M02 >= 0, 1.0, -1.0)
    e01 = jnp.where(M01 >= 0, 1.0, -1.0)

    nS = jnp.array([jnp.abs(S[0, 0]), jnp.abs(S[1, 1]), jnp.abs(S[2, 2])])
    idx = jnp.argmax(nS)

    def np_case0():
        return jnp.stack([
            jnp.array([S[0, 0], S[0, 1] + rt22, S[0, 2] + e12 * rt11]),
            jnp.array([S[0, 0], S[0, 1] - rt22, S[0, 2] - e12 * rt11]),
        ])

    def np_case1():
        return jnp.stack([
            jnp.array([S[0, 1] + rt22, S[1, 1], S[1, 2] - e02 * rt00]),
            jnp.array([S[0, 1] - rt22, S[1, 1], S[1, 2] + e02 * rt00]),
        ])

    def np_case2():
        return jnp.stack([
            jnp.array([S[0, 2] + e01 * rt11, S[1, 2] + rt00, S[2, 2]]),
            jnp.array([S[0, 2] - e01 * rt11, S[1, 2] - rt00, S[2, 2]]),
        ])

    npa = jax.lax.switch(idx, [np_case0, np_case1, np_case2])  # (2, 3)

    traceS = jnp.trace(S)
    v = 2.0 * jnp.sqrt(jnp.maximum(1.0 + traceS - M00 - M11 - M22, 0.0))
    ESii = jnp.where(S[idx, idx] >= 0, 1.0, -1.0)
    r_2 = 2.0 + traceS + v
    nt_2 = 2.0 + traceS - v
    r = jnp.sqrt(jnp.maximum(r_2, 0.0))
    n_t = jnp.sqrt(jnp.maximum(nt_2, 0.0))

    # Malis-Vargas analytic assembly: the two t* candidates cross-couple the
    # two normal candidates (same formulas as the reference/OpenCV InriaDecomp).
    n1 = npa[0] / (jnp.linalg.norm(npa[0]) + 1e-12)
    n2 = npa[1] / (jnp.linalg.norm(npa[1]) + 1e-12)
    half_nt = 0.5 * n_t
    esii_t_r = ESii * r
    t1_star = half_nt * (esii_t_r * n2 - n_t * n1)
    t2_star = half_nt * (esii_t_r * n1 - n_t * n2)
    v_safe = jnp.where(jnp.abs(v) > 1e-12, v, 1e-12)

    def rmat_from_tstar_n(t_star, n):
        return H @ (jnp.eye(3, dtype=H.dtype) - (2.0 / v_safe) * t_star[:, None] @ n[None, :])

    R1 = rmat_from_tstar_n(t1_star, n1)
    t1 = R1 @ t1_star
    R2 = rmat_from_tstar_n(t2_star, n2)
    t2 = R2 @ t2_star
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t1, -t1, t2, -t2])
    ns = jnp.stack([n1, -n1, n2, -n2])
    pure_rot = jnp.linalg.norm(S) < 1e-4
    Rs = jnp.where(pure_rot, jnp.broadcast_to(H, Rs.shape), Rs)
    ts = jnp.where(pure_rot, jnp.zeros_like(ts), ts)
    return Rs, ts, ns


def pose_from_homography(H: jax.Array, uv1: jax.Array, uv2: jax.Array,
                         mask: jax.Array | None = None):
    """Pick the cheirality-consistent pose among homography decompositions.

    Returns (pose (7,), num_in_front, n (3,)). Degenerate H falls back to the
    best-scoring candidate regardless.
    """
    Rs, ts, ns = decompose_homography(H)
    # project candidate R to SO3 via SVD (numerical safety)
    U, _, Vt = jnp.linalg.svd(Rs)
    Rs = U @ Vt
    Rs = Rs * jnp.sign(jnp.linalg.det(Rs))[..., None, None]
    qs = rot.rotmat_to_quat(Rs)
    cands = rigid3.make(qs, ts)
    identity = rigid3.identity(H.dtype)
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
        ok = (z1 > 1e-6) & (z2 > 1e-6) & (z1 < 1000.0) & (z2 < 1000.0) & mask
        return jnp.sum(ok)

    counts = jax.vmap(score)(cands)
    best = jnp.argmax(counts)
    return cands[best], counts[best], ns[best]
