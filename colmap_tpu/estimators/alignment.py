"""Reconstruction alignment + merging.

Reference: src/colmap/estimators/alignment.h:15-69 —
AlignReconstructionsViaProjCenters / ViaPoints, MergeReconstructions, and
the per-image alignment error report. The Sim3 estimation itself lives in
estimators/similarity_transform.py; this module adds robust (RANSAC)
alignment and model merging for the hierarchical mapper.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from colmap_tpu.estimators.similarity_transform import (
    align_reconstructions_via_proj_centers,
    estimate_sim3,
)
from colmap_tpu.geometry import sim3 as sim3_mod


def common_point_pairs(rec_src, rec_dst, max_pairs: int = 2000
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """3D point pairs whose tracks share a (image, point2D) observation.

    Reference: AlignReconstructionsViaPoints (alignment.h) uses common
    triangulated observations when too few images overlap."""
    src_pts, dst_pts = [], []
    dst_imgs = rec_dst.images
    for pid, pt in rec_src.points3D.items():
        for (iid, p2d) in pt.track:
            im = dst_imgs.get(iid)
            if im is None or len(im.point3D_ids) <= p2d:
                continue
            dpid = int(im.point3D_ids[p2d])
            if dpid >= 0 and dpid in rec_dst.points3D:
                src_pts.append(pt.xyz)
                dst_pts.append(rec_dst.points3D[dpid].xyz)
                break
        if len(src_pts) >= max_pairs:
            break
    if not src_pts:
        return np.zeros((0, 3)), np.zeros((0, 3))
    return np.stack(src_pts), np.stack(dst_pts)


def align_reconstructions_robust(rec_src, rec_dst, max_error: float = 0.1,
                                 num_trials: int = 256, seed: int = 0
                                 ) -> Optional[np.ndarray]:
    """RANSAC Sim3 alignment over common projection centers, falling back
    to common 3D points when fewer than 3 images overlap.

    Reference: AlignReconstructions with RANSAC on proj centers
    (alignment.cc) + AlignReconstructionsViaPoints. Minimal sample = 3;
    scored by distance."""
    common = sorted(set(rec_src.registered_image_ids())
                    & set(rec_dst.registered_image_ids()))
    if len(common) >= 3:
        src = np.stack([rec_src.images[i].projection_center()
                        for i in common])
        dst = np.stack([rec_dst.images[i].projection_center()
                        for i in common])
    else:
        src, dst = common_point_pairs(rec_src, rec_dst)
        if len(src) < 3:
            return None
    n = len(src)
    rng = np.random.default_rng(seed)
    best_inl = -1
    best_t = None
    for _ in range(num_trials):
        sel = rng.choice(n, 3, replace=False)
        t = np.asarray(estimate_sim3(jnp.asarray(src[sel], jnp.float32),
                                     jnp.asarray(dst[sel], jnp.float32)))
        pred = np.asarray(sim3_mod.apply(jnp.asarray(t),
                                         jnp.asarray(src, np.float32)))
        err = np.linalg.norm(pred - dst, axis=1)
        inl = int((err < max_error).sum())
        if inl > best_inl:
            best_inl = inl
            best_t = t
            if inl == n:
                break
    if best_t is None or best_inl < 3:
        return None
    # refit on inliers
    pred = np.asarray(sim3_mod.apply(jnp.asarray(best_t),
                                     jnp.asarray(src, np.float32)))
    mask = np.linalg.norm(pred - dst, axis=1) < max_error
    if mask.sum() >= 3:
        best_t = np.asarray(estimate_sim3(jnp.asarray(src[mask], jnp.float32),
                                          jnp.asarray(dst[mask], jnp.float32)))
    return np.asarray(best_t, np.float64)


def merge_reconstructions(rec_dst, rec_src, max_reproj_error: float = 8.0,
                          max_proj_center_error: float = 0.1,
                          precomputed_sim3: Optional[np.ndarray] = None) -> bool:
    """Merge rec_src INTO rec_dst (in place).

    Reference: MergeReconstructions (estimators/alignment.cc): align src to
    dst via common registered images, transform, transfer novel images, and
    fuse 3D points whose tracks share observations. `precomputed_sim3`
    skips the internal alignment (the hierarchical mapper's pose graph
    already placed every cluster in the global frame).
    """
    t = precomputed_sim3
    if t is None:
        t = align_reconstructions_robust(rec_src, rec_dst,
                                         max_error=max_proj_center_error)
    if t is None:
        return False
    import copy

    src = copy.deepcopy(rec_src)
    src.transform(t)

    for cid, cam in src.cameras.items():
        if cid not in rec_dst.cameras:
            rec_dst.cameras[cid] = cam

    common = set(rec_dst.registered_image_ids()) & set(src.registered_image_ids())
    for iid, img in src.images.items():
        if not img.registered or iid in common:
            continue
        if iid in rec_dst.images and rec_dst.images[iid].registered:
            continue
        import dataclasses as dc

        new_img = copy.deepcopy(img)
        new_img.point3D_ids = np.full(len(img.xys), -1, np.int64)
        rec_dst.images[iid] = new_img

    # fuse points: a src track observation (image, p2d) that already has a
    # dst point merges the tracks; otherwise a new point is added
    for pid, pt in src.points3D.items():
        dst_pid = -1
        for (iid, p2d) in pt.track:
            im = rec_dst.images.get(iid)
            if im is not None and len(im.point3D_ids) > p2d and im.point3D_ids[p2d] >= 0:
                dst_pid = int(im.point3D_ids[p2d])
                break
        new_obs = [(iid, p2d) for (iid, p2d) in pt.track
                   if iid in rec_dst.images
                   and rec_dst.images[iid].registered
                   and len(rec_dst.images[iid].point3D_ids) > p2d]
        if dst_pid >= 0:
            dst_pt = rec_dst.points3D[dst_pid]
            have = set(map(tuple, dst_pt.track))
            for obs in new_obs:
                if tuple(obs) not in have and rec_dst.images[obs[0]].point3D_ids[obs[1]] < 0:
                    dst_pt.track.append(obs)
                    rec_dst.images[obs[0]].point3D_ids[obs[1]] = dst_pid
            # average the positions
            dst_pt.xyz = 0.5 * (dst_pt.xyz + pt.xyz)
        else:
            obs = [o for o in new_obs
                   if rec_dst.images[o[0]].point3D_ids[o[1]] < 0]
            if len(obs) >= 2:
                rec_dst.add_point3D(pt.xyz, obs, color=pt.color)
    return True


def alignment_errors(rec_test, rec_gt) -> Optional[dict]:
    """Per-image errors after robust alignment (reference:
    ComputeImageAlignmentError, alignment.h)."""
    from colmap_tpu.estimators.similarity_transform import compare_reconstructions

    return compare_reconstructions(rec_test, rec_gt)
