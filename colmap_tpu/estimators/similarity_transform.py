"""Similarity/affine/translation transform estimation + reconstruction
alignment.

Reference: src/colmap/estimators/similarity_transform.h,
estimators/alignment.h:15-69 (AlignReconstructionsViaProjCenters etc.).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from colmap_tpu.geometry import rigid3, rotation as rot, sim3


def estimate_sim3(src: jax.Array, dst: jax.Array,
                  weights: Optional[jax.Array] = None,
                  with_scale: bool = True) -> jax.Array:
    """Umeyama alignment: dst ~= s R src + t. Returns Sim3 (8,). Batched-safe."""
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    wsum = jnp.sum(weights, axis=-1, keepdims=True) + 1e-12
    mu_s = jnp.sum(src * weights[..., None], axis=-2) / wsum
    mu_d = jnp.sum(dst * weights[..., None], axis=-2) / wsum
    s_c = src - mu_s[..., None, :]
    d_c = dst - mu_d[..., None, :]
    cov = jnp.einsum("...ni,...nj,...n->...ij", d_c, s_c, weights) / wsum[..., None]
    U, S, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    D = jnp.ones(cov.shape[:-2] + (3,), cov.dtype).at[..., 2].set(jnp.sign(det))
    R = U @ (D[..., :, None] * Vt)
    var_s = jnp.sum(weights * jnp.sum(s_c * s_c, axis=-1), axis=-1) / wsum[..., 0]
    scale = jnp.where(
        jnp.asarray(with_scale),
        jnp.sum(S * D, axis=-1) / jnp.maximum(var_s, 1e-12),
        jnp.ones_like(var_s),
    )
    t = mu_d - scale[..., None] * jnp.einsum("...ij,...j->...i", R, mu_s)
    q = rot.rotmat_to_quat(R)
    return sim3.make(scale, q, t)


def align_reconstructions_via_proj_centers(rec_src, rec_dst, with_scale=True):
    """Sim3 aligning src model to dst using common registered images.

    Reference: AlignReconstructionsViaProjCenters (estimators/alignment.cc).
    Returns (sim3 (8,) numpy, common image ids).
    """
    common = sorted(
        set(rec_src.registered_image_ids()) & set(rec_dst.registered_image_ids())
    )
    if len(common) < 3:
        return None, common
    src = np.stack([rec_src.images[i].projection_center() for i in common])
    dst = np.stack([rec_dst.images[i].projection_center() for i in common])
    t = estimate_sim3(
        jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32),
        with_scale=with_scale,
    )
    return np.asarray(t, np.float64), common


def compare_reconstructions(rec_test, rec_gt):
    """Per-image rotation (deg) and projection-center errors after Sim3
    alignment — the `model_comparer` metric used by the reference's E2E gate
    (scripts/python/benchmark_eth3d.py; exe/model.cc:472).
    """
    t, common = align_reconstructions_via_proj_centers(rec_test, rec_gt)
    if t is None:
        return None
    rot_errors, center_errors = {}, {}
    tj = jnp.asarray(t, jnp.float32)
    for iid in common:
        im_t = rec_test.images[iid]
        im_g = rec_gt.images[iid]
        pose_t = np.asarray(
            sim3.transform_rigid(tj, jnp.asarray(im_t.cam_from_world, jnp.float32))
        )
        dq = abs(
            float(
                np.dot(
                    pose_t[:4] / np.linalg.norm(pose_t[:4]),
                    im_g.cam_from_world[:4] / np.linalg.norm(im_g.cam_from_world[:4]),
                )
            )
        )
        rot_errors[iid] = float(np.degrees(2 * np.arccos(min(1.0, dq))))
        c_t = np.asarray(
            rigid3.projection_center(jnp.asarray(pose_t, jnp.float32))
        )
        c_g = im_g.projection_center()
        center_errors[iid] = float(np.linalg.norm(c_t - c_g))
    return dict(
        sim3=t,
        common_images=common,
        rotation_errors_deg=rot_errors,
        center_errors=center_errors,
        max_rotation_error_deg=max(rot_errors.values()),
        max_center_error=max(center_errors.values()),
    )


def estimate_translation(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pure translation (reference: translation_transform.h)."""
    return jnp.mean(dst - src, axis=-2)


def estimate_affine2d(src: jax.Array, dst: jax.Array):
    """2D affine LS fit (reference: affine_transform.h). Returns (2, 3)."""
    n = src.shape[-2]
    A = jnp.concatenate([src, jnp.ones(src.shape[:-1] + (1,), src.dtype)], axis=-1)
    sol, *_ = jnp.linalg.lstsq(A, dst)
    return jnp.swapaxes(sol, -1, -2)
