"""Incremental mapper: the outer SfM loop.

Reference: src/colmap/sfm/incremental_mapper.h:63-340 (+ the
IncrementalTriangulator and ObservationManager responsibilities,
sfm/incremental_triangulator.h:42, sfm/observation_manager.h:44, folded in).

TPU architecture: the O(images) *decisions* stay on host (they're tiny);
every inner operation is a fixed-capacity batched device call —
  * initial-pair two-view geometry  -> one fused E/F/H RANSAC program,
  * PnP registration               -> batched P3P LO-RANSAC + GN refine,
  * triangulation of new tracks    -> one batched two-view DLT call per
                                      image (all candidate pairs at once),
  * local/global BA                -> the batched-LM Schur engine,
  * observation filtering          -> one batched reprojection pass.
Array shapes are bucketed (next power of two) so jit caches stay warm
across registrations.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from colmap_tpu.estimators import absolute_pose as apose
from colmap_tpu.estimators import bundle_adjustment as ba
from colmap_tpu.estimators import two_view_geometry as tvg
from colmap_tpu.geometry import rigid3, rotation as rot
from colmap_tpu.geometry.triangulation import (
    calculate_triangulation_angle,
    triangulate_point,
)
from colmap_tpu.optim.ransac import RansacOptions, ransac
from colmap_tpu.scene.database_cache import DatabaseCache
from colmap_tpu.scene.reconstruction import Reconstruction, Image as RecImage
from colmap_tpu.sensor import models as camera_models


# ---------------------------------------------------------------------------
# options
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class IncrementalMapperOptions:
    """Defaults mirror the reference (sfm/incremental_mapper.h:63-160)."""

    init_min_num_inliers: int = 100
    init_max_error: float = 4.0
    init_max_forward_motion: float = 0.95
    init_min_tri_angle_deg: float = 16.0
    abs_pose_max_error: float = 12.0
    abs_pose_min_num_inliers: int = 30
    abs_pose_min_inlier_ratio: float = 0.25
    filter_max_reproj_error: float = 4.0
    filter_min_tri_angle_deg: float = 1.5
    create_min_tri_angle_deg: float = 1.5  # triangulator min angle
    continue_max_reproj_error: float = 4.0
    local_ba_num_images: int = 6
    min_track_len: int = 2
    max_reg_trials: int = 3
    num_threads: int = -1  # API parity; host work is vectorized instead


def _bucket(n: int, lo: int = 64) -> int:
    n = max(n, lo)
    return 1 << (n - 1).bit_length()


# ---------------------------------------------------------------------------
# jitted device helpers (cached per bucketed shape)
# ---------------------------------------------------------------------------


@jax.jit
def _pnp_ransac(key, points3d, rays, valid, err_norm):
    """P3P LO-RANSAC + GN polish; residuals in normalized coords."""
    scale = 1.0 / jnp.maximum(err_norm, 1e-12) ** 2

    def scaled_res(model, data):
        return apose.residuals(model, data) * scale

    res = ransac(
        key,
        solver=apose.solve_p3p,
        residual_fn=scaled_res,
        refit_fn=apose.refit,
        data=(points3d, rays),
        valid=valid,
        sample_size=3,
        options=RansacOptions(max_error=1.0, num_samples=1024, lo_iterations=3),
    )
    w = jnp.where(res.inlier_mask, 1.0, 0.0)
    pose = apose.gn_refine_pose(res.model, points3d, rays, w, num_iters=10)
    # recompute inliers after polish; pack everything into ONE output array
    # (a single device->host transfer — the tunnel charges per transfer)
    r2 = apose.residuals(pose, (points3d, rays)) * scale
    inliers = (r2 < 1.0) & valid
    return jnp.concatenate([pose, inliers.astype(jnp.float32)])


@jax.jit
def _triangulate_candidates(pose_new, poses_other, rays_new, rays_other):
    """Batched two-view triangulation of K candidates against one new image.

    Returns world points + acceptance diagnostics (angles, depths, reproj
    errors in normalized coords).
    """
    K = rays_new.shape[0]
    pose_new_b = jnp.broadcast_to(pose_new, (K, 7))
    X = triangulate_point(pose_new_b, poses_other, rays_new, rays_other)
    c1 = rigid3.projection_center(pose_new_b)
    c2 = rigid3.projection_center(poses_other)
    angle = calculate_triangulation_angle(c1, c2, X)
    pc1 = rigid3.apply(pose_new_b, X)
    pc2 = rigid3.apply(poses_other, X)
    z1, z2 = pc1[:, 2], pc2[:, 2]
    e1 = jnp.linalg.norm(pc1[:, :2] / jnp.where(jnp.abs(z1) > 1e-9, z1, 1e-9)[:, None] - rays_new, axis=-1)
    e2 = jnp.linalg.norm(pc2[:, :2] / jnp.where(jnp.abs(z2) > 1e-9, z2, 1e-9)[:, None] - rays_other, axis=-1)
    # one (8, K) output = one device->host transfer
    return jnp.concatenate([X.T, jnp.stack([angle, z1, z2, e1, e2])])


@partial(jax.jit, static_argnames=("options",))
def _estimate_tvg_jit(key, rays1, rays2, pix1, pix2, valid, focal,
                      options: tvg.TwoViewGeometryOptions):
    return tvg.estimate_two_view_geometry(
        key, rays1, rays2, pix1, pix2, valid, focal, options
    )


@jax.jit
def _reproj_errors(poses, rays, X):
    """Per-observation normalized reprojection error + depth."""
    pc = rigid3.apply(poses, X)
    z = pc[:, 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    e = jnp.linalg.norm(pc[:, :2] / z_safe[:, None] - rays, axis=-1)
    return jnp.stack([e, z])  # one transfer


@jax.jit
def _pack_ba_state(state):
    """Flatten (poses, cam_params, points) into one vector (one transfer)."""
    pr = state.problem
    return jnp.concatenate([pr.poses.reshape(-1), pr.cam_params.reshape(-1),
                            pr.points.reshape(-1)])


# ---------------------------------------------------------------------------
# the mapper
# ---------------------------------------------------------------------------


class IncrementalMapper:
    def __init__(self, cache: DatabaseCache,
                 options: IncrementalMapperOptions = IncrementalMapperOptions(),
                 seed: int = 0):
        self.cache = cache
        self.options = options
        self.rec = Reconstruction()
        for cam in cache.cameras.values():
            # deep-copy: BA refines rec camera params in place; the cache
            # (and its precomputed rays) must stay pristine so it can back
            # other sub-models
            self.rec.add_camera(dataclasses.replace(
                cam, params=np.array(cam.params, np.float64, copy=True)))
        for im in cache.images.values():
            self.rec.add_image(
                RecImage(
                    image_id=im.image_id,
                    name=im.name,
                    camera_id=im.camera_id,
                    cam_from_world=None,
                    xys=im.xys.astype(np.float64),
                    point3D_ids=np.full(len(im.xys), -1, np.int64),
                )
            )
        self.registered: List[int] = []
        self._focal_cache: Dict[int, float] = {}
        # normalized rays under the CURRENT rec intrinsics; empty entries
        # fall through to the DB-cache rays (valid until intrinsics refine)
        self._rays_cache: Dict[int, np.ndarray] = {}
        self._db_cam_params: Dict[int, np.ndarray] = {
            cid: np.array(c.params, np.float64, copy=True)
            for cid, c in cache.cameras.items()
        }
        self.num_reg_trials: Dict[int, int] = {}
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        self._num_shared_points: Dict[Tuple[int, int], int] = {}

    # -- small helpers -------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _focal(self, image_id: int) -> float:
        f = self._focal_cache.get(image_id)
        if f is None:
            f = self.rec.cameras[
                self.cache.images[image_id].camera_id].mean_focal_length()
            self._focal_cache[image_id] = f
        return f

    def invalidate_focal_cache(self):
        self._focal_cache.clear()
        self._refresh_rays()

    def _rays(self, image_id: int) -> np.ndarray:
        """Normalized rays of the image's keypoints under CURRENT intrinsics.

        The DB-cache rays were computed with the database camera params; once
        BA refines intrinsics the two drift apart — filtering/triangulating
        against stale rays mismeasures every observation (at 3% focal drift
        that is ~9 px of phantom error, enough to delete the whole model).
        """
        r = self._rays_cache.get(image_id)
        return self.cache.images[image_id].rays if r is None else r

    def _refresh_rays(self):
        """Recompute rays for every image whose camera drifted from the DB
        params — one batched cam_from_img call per camera group (the tunnel
        costs ~65ms per device call; per-image calls would not scale)."""
        groups: Dict[int, List[int]] = {}
        for iid, cim in self.cache.images.items():
            cam = self.rec.cameras[cim.camera_id]
            if np.array_equal(np.asarray(cam.params, np.float64),
                              self._db_cam_params[cim.camera_id]):
                self._rays_cache.pop(iid, None)
            else:
                groups.setdefault(cim.camera_id, []).append(iid)
        for cid, iids in groups.items():
            cam = self.rec.cameras[cid]
            xys = np.concatenate(
                [self.cache.images[i].xys for i in iids]).astype(np.float32)
            cap = _bucket(len(xys))
            rays = np.asarray(camera_models.cam_from_img(
                int(cam.model_id),
                jnp.asarray(cam.padded_params()),
                jnp.asarray(self._pad(xys, cap)),
            ))[: len(xys)]
            off = 0
            for i in iids:
                n = len(self.cache.images[i].xys)
                self._rays_cache[i] = rays[off:off + n]
                off += n

    def _pose(self, image_id: int) -> np.ndarray:
        return self.rec.images[image_id].cam_from_world.astype(np.float32)

    def _pad(self, arr, cap, fill=0.0):
        out = np.full((cap,) + arr.shape[1:], fill, arr.dtype)
        out[: len(arr)] = arr
        return out

    # -- initial pair --------------------------------------------------------
    def find_initial_image_pair(self, max_candidates: int = 50, exclude=()):
        """Rank pairs by correspondence count; verify with the fused two-view
        program; gate on inliers + triangulation angle + forward motion.

        Reference: FindInitialImagePair + EstimateInitialTwoViewGeometry
        (sfm/incremental_mapper.cc).
        """
        pairs = sorted(
            self.cache.graph.image_pairs(),
            key=lambda p: -self.cache.graph.num_correspondences_between(*p),
        )[:max_candidates]
        opts = tvg.TwoViewGeometryOptions(
            min_num_inliers=self.options.init_min_num_inliers,
            max_error_px=self.options.init_max_error,
            compute_relative_pose=True,
        )
        exclude = set(exclude)
        for (i1, i2) in pairs:
            if (i1, i2) in exclude or (i2, i1) in exclude:
                continue
            g = self._estimate_pair_geometry(i1, i2, opts)
            if g is None:
                continue
            if int(g.config) not in (
                int(tvg.TwoViewConfig.CALIBRATED),
                int(tvg.TwoViewConfig.UNCALIBRATED),
                # planar/panoramic pairs initialize via homography
                # decomposition (reference: PoseFromHomographyMatrix path in
                # EstimateTwoViewGeometryPose); the tri-angle and
                # forward-motion gates below still reject panoramic pairs.
                int(tvg.TwoViewConfig.PLANAR),
                int(tvg.TwoViewConfig.PLANAR_OR_PANORAMIC),
            ):
                continue
            if int(g.num_inliers) < self.options.init_min_num_inliers:
                continue
            if np.degrees(float(g.tri_angle)) < self.options.init_min_tri_angle_deg:
                continue
            pose = np.asarray(g.cam2_from_cam1)
            # forward-motion gate: |tz|/|t| (reference init_max_forward_motion)
            t = pose[4:]
            if np.linalg.norm(t) > 1e-9 and abs(t[2]) / np.linalg.norm(t) > self.options.init_max_forward_motion:
                continue
            return (i1, i2), g
        return None, None

    def _estimate_pair_geometry(self, i1, i2, opts: tvg.TwoViewGeometryOptions):
        m = self.cache.graph._matches.get((min(i1, i2), max(i1, i2)))
        if m is None or len(m) < opts.min_num_inliers:
            return None
        if i1 > i2:
            m = m[:, ::-1]
        im1, im2 = self.cache.images[i1], self.cache.images[i2]
        cap = _bucket(len(m))
        rays1 = self._pad(self._rays(i1)[m[:, 0]].astype(np.float32), cap)
        rays2 = self._pad(self._rays(i2)[m[:, 1]].astype(np.float32), cap)
        pix1 = self._pad(im1.xys[m[:, 0]].astype(np.float32), cap)
        pix2 = self._pad(im2.xys[m[:, 1]].astype(np.float32), cap)
        valid = np.zeros(cap, bool)
        valid[: len(m)] = True
        focal = np.sqrt(self._focal(i1) * self._focal(i2)).astype(np.float32)
        g = _estimate_tvg_jit(
            self._next_key(),
            jnp.asarray(rays1), jnp.asarray(rays2),
            jnp.asarray(pix1), jnp.asarray(pix2),
            jnp.asarray(valid), jnp.asarray(focal), opts,
        )
        g = jax.tree.map(np.asarray, g)
        return g._replace(inlier_mask=g.inlier_mask[: len(m)])

    def register_initial_image_pair(self, i1: int, i2: int, g) -> bool:
        """Set identity + relative pose, triangulate the inlier matches."""
        m = self.cache.graph._matches.get((min(i1, i2), max(i1, i2)))
        if i1 > i2:
            m = m[:, ::-1]
        inl = np.asarray(g.inlier_mask)[: len(m)]
        m = m[inl]
        self.rec.images[i1].cam_from_world = np.asarray(rigid3.identity(), np.float64)
        self.rec.images[i2].cam_from_world = np.asarray(g.cam2_from_cam1, np.float64)
        self.registered = [i1, i2]

        im1, im2 = self.cache.images[i1], self.cache.images[i2]
        cap = _bucket(len(m))
        pose1 = jnp.asarray(self._pose(i1))
        poses2 = jnp.asarray(np.tile(self._pose(i2), (cap, 1)))
        rays1 = jnp.asarray(self._pad(self._rays(i1)[m[:, 0]].astype(np.float32), cap))
        rays2 = jnp.asarray(self._pad(self._rays(i2)[m[:, 1]].astype(np.float32), cap))
        packed = np.asarray(_triangulate_candidates(pose1, poses2, rays1, rays2))
        X, (angle, z1, z2, e1, e2) = packed[:3].T, packed[3:8]
        f1, f2 = self._focal(i1), self._focal(i2)
        min_angle = np.radians(self.options.create_min_tri_angle_deg)
        err_px = self.options.filter_max_reproj_error
        ok = (
            (angle[: len(m)] > min_angle)
            & (z1[: len(m)] > 0)
            & (z2[: len(m)] > 0)
            & (e1[: len(m)] * f1 < err_px)
            & (e2[: len(m)] * f2 < err_px)
        )
        for k in np.nonzero(ok)[0]:
            self.rec.add_point3D(
                X[k].astype(np.float64),
                [(i1, int(m[k, 0])), (i2, int(m[k, 1]))],
            )
        return int(ok.sum()) >= self.options.init_min_num_inliers // 2

    # -- next image selection --------------------------------------------------
    def find_next_images(self, max_images: int = 20) -> List[int]:
        """Rank unregistered images by visible-triangulated-point score.

        Score = visibility-pyramid style: count of features whose
        correspondences touch an existing 3D point, weighted by spatial
        spread over a multi-level grid (reference: VisibilityPyramid,
        scene/visibility_pyramid.h:51; ObservationManager ranking).
        """
        reg = set(self.registered)
        scores = []
        for iid, im in self.cache.images.items():
            if iid in reg:
                continue
            if self.num_reg_trials.get(iid, 0) >= self.options.max_reg_trials:
                continue
            vis_feats = self._visible_point_features(iid)
            if len(vis_feats) == 0:
                continue
            score = self._pyramid_score(iid, vis_feats)
            scores.append((score, iid))
        scores.sort(reverse=True)
        return [iid for _, iid in scores[:max_images]]

    def _visible_point_features(self, image_id: int) -> np.ndarray:
        """Feature indices of image whose correspondences see a 3D point."""
        offsets, imgs, feats = self.cache.graph.find_correspondences_all(image_id)
        if len(imgs) == 0:
            return np.zeros(0, np.int64)
        # vectorized: for each edge, does (other image, other feat) have a point?
        has_pt = np.zeros(len(imgs), bool)
        for oi in np.unique(imgs):
            if oi not in set(self.registered):
                continue
            sel = imgs == oi
            pids = self.rec.images[int(oi)].point3D_ids[feats[sel]]
            has_pt[sel] = pids >= 0
        # map edges back to features via offsets
        edge_feat = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
        return np.unique(edge_feat[has_pt])

    def _pyramid_score(self, image_id: int, feat_idx: np.ndarray) -> float:
        im = self.cache.images[image_id]
        cam = self.rec.cameras[im.camera_id]
        xy = im.xys[feat_idx]
        score = 0.0
        for level in range(2, 7):
            g = 1 << level
            cx = np.clip((xy[:, 0] / cam.width * g).astype(int), 0, g - 1)
            cy = np.clip((xy[:, 1] / cam.height * g).astype(int), 0, g - 1)
            occupied = len(np.unique(cx * g + cy))
            score += occupied * (g * g)
        return score

    # -- registration -----------------------------------------------------------
    def register_next_image(self, image_id: int) -> bool:
        """2D-3D PnP registration (reference RegisterNextImage .cc:344)."""
        self.num_reg_trials[image_id] = self.num_reg_trials.get(image_id, 0) + 1
        im = self.cache.images[image_id]
        offsets, imgs, feats = self.cache.graph.find_correspondences_all(image_id)
        reg = set(self.registered)

        # collect (feature, point3D) candidates, deduped per feature
        corr_f, corr_p = [], []
        seen_pairs: Set[Tuple[int, int]] = set()
        edge_feat = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
        for e in range(len(imgs)):
            oi = int(imgs[e])
            if oi not in reg:
                continue
            pid = int(self.rec.images[oi].point3D_ids[int(feats[e])])
            if pid < 0:
                continue
            f = int(edge_feat[e])
            if (f, pid) in seen_pairs:
                continue
            seen_pairs.add((f, pid))
            corr_f.append(f)
            corr_p.append(pid)
        if len(corr_f) < self.options.abs_pose_min_num_inliers:
            return False

        corr_f = np.array(corr_f)
        corr_p = np.array(corr_p)
        X = np.stack([self.rec.points3D[p].xyz for p in corr_p]).astype(np.float32)
        rays = self._rays(image_id)[corr_f].astype(np.float32)
        cap = _bucket(len(corr_f))
        focal = self._focal(image_id)
        packed = np.asarray(_pnp_ransac(
            self._next_key(),
            jnp.asarray(self._pad(X, cap)),
            jnp.asarray(self._pad(rays, cap)),
            jnp.asarray(self._pad(np.ones(len(corr_f), bool), cap, fill=False)),
            jnp.asarray(np.float32(self.options.abs_pose_max_error / focal)),
        ))
        pose, inliers = packed[:7], packed[7:] > 0.5
        num_inl = int(inliers.sum())
        if num_inl < self.options.abs_pose_min_num_inliers:
            return False
        if num_inl / len(corr_f) < self.options.abs_pose_min_inlier_ratio:
            return False

        self.rec.images[image_id].cam_from_world = np.asarray(pose, np.float64)
        self.registered.append(image_id)

        # extend tracks with the inlier 2D-3D matches (reference: the
        # triangulator's Continue step covers these; we add them directly)
        inl = np.asarray(inliers)[: len(corr_f)]
        img_pids = self.rec.images[image_id].point3D_ids
        for f, pid, ok in zip(corr_f, corr_p, inl):
            if not ok or img_pids[f] >= 0:
                continue
            if pid not in self.rec.points3D:
                continue
            if any(ii == image_id for ii, _ in self.rec.points3D[pid].track):
                continue
            self.rec.points3D[pid].track.append((image_id, int(f)))
            img_pids[f] = pid
        return True

    # -- triangulation ------------------------------------------------------------
    def triangulate_image(self, image_id: int) -> int:
        """Create/continue tracks for a newly registered image.

        One batched device call triangulates every candidate (feature,
        registered-correspondence) pair; acceptance and track bookkeeping
        stay on host. Reference: IncrementalTriangulator Find/Create/Continue
        (sfm/incremental_triangulator.cc:437,478,538).
        """
        im = self.cache.images[image_id]
        img_pids = self.rec.images[image_id].point3D_ids
        offsets, imgs, feats = self.cache.graph.find_correspondences_all(image_id)
        edge_feat = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))

        # --- vectorized candidate classification (was a Python loop over
        # every correspondence edge — ~100ms/image at scale) --------------
        reg_arr = np.fromiter(self.registered, np.int64,
                              count=len(self.registered))
        sel = np.isin(imgs, reg_arr)
        f_arr = edge_feat[sel].astype(np.int64)
        oi_arr = imgs[sel].astype(np.int64)
        of_arr = feats[sel].astype(np.int64)
        pid_arr = np.empty(len(oi_arr), np.int64)
        for oi in np.unique(oi_arr):
            m = oi_arr == oi
            pid_arr[m] = self.rec.images[int(oi)].point3D_ids[of_arr[m]]
        free = img_pids[f_arr] < 0
        cont_mask = free & (pid_arr >= 0)
        cand_mask = free & (pid_arr < 0)
        cont_f = f_arr[cont_mask]
        cont_p = pid_arr[cont_mask]
        cand_f = list(f_arr[cand_mask])
        cand_oi = list(oi_arr[cand_mask])
        cand_of = list(of_arr[cand_mask])

        n_new = 0
        focal = self._focal(image_id)
        pose_new = self._pose(image_id)

        # Continue existing tracks (batched reprojection check)
        if len(cont_f):
            uniq = {}
            for f, pid in zip(cont_f.tolist(), cont_p.tolist()):
                uniq.setdefault(f, pid)
            fs = np.array(list(uniq.keys()))
            pids = np.array(list(uniq.values()))
            pids = np.array([p for p in pids])
            keep = np.array([p in self.rec.points3D for p in pids])
            fs, pids = fs[keep], pids[keep]
            if len(fs):
                X = np.stack([self.rec.points3D[p].xyz for p in pids]).astype(np.float32)
                cap = _bucket(len(fs))
                ez = np.asarray(_reproj_errors(
                    jnp.asarray(np.tile(pose_new, (cap, 1))),
                    jnp.asarray(self._pad(self._rays(image_id)[fs].astype(np.float32), cap)),
                    jnp.asarray(self._pad(X, cap)),
                ))
                e, z = ez[0], ez[1]
                ok = (e[: len(fs)] * focal < self.options.continue_max_reproj_error) & (
                    z[: len(fs)] > 0
                )
                for f, pid, o in zip(fs, pids, ok):
                    if o and img_pids[f] < 0:
                        if any(ii == image_id for ii, _ in self.rec.points3D[pid].track):
                            continue
                        self.rec.points3D[pid].track.append((image_id, int(f)))
                        img_pids[f] = pid
                        n_new += 1

        # Create new tracks (batched two-view triangulation of all candidates)
        if cand_f:
            cand_f = np.array(cand_f)
            cand_oi = np.array(cand_oi)
            cand_of = np.array(cand_of)
            K = len(cand_f)
            cap = _bucket(K)
            poses_other = np.stack([self._pose(int(oi)) for oi in cand_oi]).astype(np.float32)
            rays_other = np.stack(
                [self._rays(int(oi))[int(of)] for oi, of in zip(cand_oi, cand_of)]
            ).astype(np.float32)
            packed = np.asarray(_triangulate_candidates(
                jnp.asarray(pose_new.astype(np.float32)),
                jnp.asarray(self._pad(poses_other, cap)),
                jnp.asarray(self._pad(self._rays(image_id)[cand_f].astype(np.float32), cap)),
                jnp.asarray(self._pad(rays_other, cap)),
            ))
            X, (angle, z1, z2, e1, e2) = packed[:3].T, packed[3:8]
            min_angle = np.radians(self.options.create_min_tri_angle_deg)
            err_px = self.options.filter_max_reproj_error
            ok = (
                (angle[:K] > min_angle)
                & (z1[:K] > 0)
                & (z2[:K] > 0)
                & (e1[:K] * focal < err_px)
                & (e2[:K] * np.array([self._focal(int(oi)) for oi in cand_oi]) < err_px)
            )
            # greedily create one track per feature from the best candidate
            order = np.argsort(-angle[:K])
            for k in order:
                if not ok[k]:
                    continue
                f = int(cand_f[k])
                oi, of = int(cand_oi[k]), int(cand_of[k])
                if img_pids[f] >= 0:
                    # track exists: try to extend with this correspondence
                    pid = int(img_pids[f])
                    if self.rec.images[oi].point3D_ids[of] < 0 and pid in self.rec.points3D:
                        if not any(ii == oi for ii, _ in self.rec.points3D[pid].track):
                            self.rec.points3D[pid].track.append((oi, of))
                            self.rec.images[oi].point3D_ids[of] = pid
                    continue
                if self.rec.images[oi].point3D_ids[of] >= 0:
                    continue
                self.rec.add_point3D(X[k].astype(np.float64), [(image_id, f), (oi, of)])
                n_new += 1
        return n_new

    # -- bundle adjustment ---------------------------------------------------------
    def _build_ba_problem(self, image_ids: List[int], fix_extra_images: bool = True,
                          refine_intrinsics: bool = False):
        """Assemble a BAProblem for the given variable images (+ fixed
        observers of their points)."""
        var = list(image_ids)
        var_set = set(var)
        pids: Set[int] = set()
        for iid in var:
            for pid in self.rec.images[iid].point3D_ids:
                if pid >= 0:
                    pids.add(int(pid))
        pids = sorted(pids)
        if not pids:
            return None, None, None, None

        extra: Set[int] = set()
        for pid in pids:
            for (iid, _) in self.rec.points3D[pid].track:
                if iid not in var_set:
                    extra.add(iid)
        all_imgs = var + sorted(extra)
        img_index = {iid: k for k, iid in enumerate(all_imgs)}
        pid_index = {pid: k for k, pid in enumerate(pids)}
        cams = sorted({self.cache.images[iid].camera_id for iid in all_imgs})
        cam_index = {cid: k for k, cid in enumerate(cams)}

        obs_pose, obs_cam, obs_pt, obs_xy = [], [], [], []
        for pid in pids:
            for (iid, f) in self.rec.points3D[pid].track:
                obs_pose.append(img_index[iid])
                obs_cam.append(cam_index[self.cache.images[iid].camera_id])
                obs_pt.append(pid_index[pid])
                obs_xy.append(self.cache.images[iid].xys[f])

        poses = np.stack([self._pose(iid) for iid in all_imgs])
        points = np.stack([self.rec.points3D[pid].xyz for pid in pids]).astype(np.float32)
        cam_params = np.stack(
            [self.rec.cameras[cid].padded_params() for cid in cams]
        ).astype(np.float32)

        # bucket EVERY axis (obs, poses, points) to powers of two — pose and
        # point counts change with every registered image, and an unpadded
        # problem would force a fresh XLA compile per model size
        n_obs = len(obs_xy)
        cap = _bucket(n_obs)
        P_b = _bucket(len(all_imgs), lo=8)
        M_b = _bucket(len(pids), lo=64)
        identity_pose = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        poses_p = np.tile(identity_pose, (P_b, 1))
        poses_p[: len(all_imgs)] = poses
        points_p = np.zeros((M_b, 3), np.float32)
        points_p[: len(pids)] = points
        problem = ba.make_problem(
            poses_p,
            cam_params,
            points_p,
            self._pad(np.array(obs_pose, np.int32), cap),
            self._pad(np.array(obs_cam, np.int32), cap),
            self._pad(np.array(obs_pt, np.int32), cap),
            self._pad(np.stack(obs_xy).astype(np.float32), cap),
            obs_weight=self._pad(np.ones(n_obs, np.float32), cap),
            refine_intrinsics=refine_intrinsics,
            refine_extra_params=refine_intrinsics,
            camera_model_ids=[self.rec.cameras[cid].model_id for cid in cams],
        )
        # freeze non-variable images + all padding rows
        pose_mask = np.zeros((P_b, 6), np.float32)
        pose_mask[: len(all_imgs)] = 1.0
        if fix_extra_images:
            for iid in extra:
                pose_mask[img_index[iid]] = 0.0
        point_mask = np.zeros((M_b, 3), np.float32)
        point_mask[: len(pids)] = 1.0
        problem = problem._replace(pose_mask=jnp.asarray(pose_mask),
                                   point_mask=jnp.asarray(point_mask))
        return problem, all_imgs, pids, cams

    def _apply_ba_result(self, state, all_imgs, pids, cams,
                         update_intrinsics: bool = False):
        flat = np.asarray(_pack_ba_state(state), np.float64)  # one transfer
        P = state.problem.poses.shape[0]
        C = state.problem.cam_params.shape[0]
        poses = flat[: P * 7].reshape(P, 7)
        cam_params = flat[P * 7: P * 7 + C * 12].reshape(C, 12)
        points = flat[P * 7 + C * 12:].reshape(-1, 3)
        for k, iid in enumerate(all_imgs):
            self.rec.images[iid].cam_from_world = poses[k]
        for k, pid in enumerate(pids):
            if pid in self.rec.points3D:
                self.rec.points3D[pid].xyz = points[k]
        if update_intrinsics:
            for k, cid in enumerate(cams):
                n = camera_models.NUM_PARAMS[camera_models.CameraModelId(self.rec.cameras[cid].model_id)]
                self.rec.cameras[cid].params = cam_params[k][:n]

    def adjust_local_bundle(self, image_id: int, ba_options: Optional[ba.BAOptions] = None):
        """BA over the most-connected local bundle (reference .cc:572,1044)."""
        local = self._find_local_bundle(image_id)
        problem, all_imgs, pids, cams = self._build_ba_problem([image_id] + local)
        if problem is None:
            return []
        if ba_options is None:
            cam0 = self.rec.cameras[self.cache.images[image_id].camera_id]
            ba_options = ba.BAOptions(
                max_iterations=10,
                cg_iterations=15,
                loss="cauchy",
                loss_scale=1.0,
                camera_model_id=cam0.model_id,
                refine_intrinsics=False,
            )
        state = ba.solve(problem, ba_options)
        self._apply_ba_result(state, all_imgs, pids, cams)
        return pids

    def _find_local_bundle(self, image_id: int) -> List[int]:
        """Most-connected registered images by shared 3D points."""
        shared: Dict[int, int] = {}
        for pid in self.rec.images[image_id].point3D_ids:
            if pid < 0:
                continue
            for (iid, _) in self.rec.points3D[int(pid)].track:
                if iid != image_id:
                    shared[iid] = shared.get(iid, 0) + 1
        ranked = sorted(shared.items(), key=lambda kv: -kv[1])
        return [iid for iid, _ in ranked[: self.options.local_ba_num_images - 1]]

    def adjust_global_bundle(self, refine_intrinsics: bool = False,
                             ba_options: Optional[ba.BAOptions] = None):
        problem, all_imgs, pids, cams = self._build_ba_problem(
            list(self.registered), fix_extra_images=False,
            refine_intrinsics=refine_intrinsics,
        )
        if problem is None:
            return
        # gauge: fix first pose entirely + second pose tx (padding rows of
        # the bucketed pose axis stay frozen)
        pose_mask = np.zeros(problem.pose_mask.shape, np.float32)
        pose_mask[: len(all_imgs)] = 1.0
        pose_mask[0] = 0.0
        if len(all_imgs) > 1:
            pose_mask[1, 3] = 0.0
        problem = problem._replace(pose_mask=jnp.asarray(pose_mask))
        if ba_options is None:
            cam0 = self.rec.cameras[self.cache.images[self.registered[0]].camera_id]
            ba_options = ba.BAOptions(
                max_iterations=30,
                cg_iterations=25,
                loss="cauchy",
                loss_scale=1.0,
                camera_model_id=cam0.model_id,
                refine_intrinsics=refine_intrinsics,
            )
        state = ba.solve(problem, ba_options)
        self._apply_ba_result(state, all_imgs, pids, cams, update_intrinsics=refine_intrinsics)
        if refine_intrinsics:
            self.invalidate_focal_cache()

    # -- filtering -------------------------------------------------------------
    def filter_points(self, pids=None) -> int:
        """Drop bad observations/points (reference ObservationManager
        FilterPoints3D: reproj error, tri angle, negative depth).

        `pids` restricts filtering to a subset (reference: local filtering
        of just-modified points after local BA) — the full pass is O(all
        observations) host work and only needed in global refinement.
        """
        if pids is None:
            items = list(self.rec.points3D.items())
        else:
            items = [(pid, self.rec.points3D[pid]) for pid in pids
                     if pid in self.rec.points3D]
        pose_cache = {iid: self._pose(iid) for iid in self.registered}
        rays_cache = {iid: self._rays(iid) for iid in self.registered}
        obs_pose, obs_rays, obs_X, obs_pid, obs_img, obs_f = [], [], [], [], [], []
        for pid, pt in items:
            for (iid, f) in pt.track:
                obs_pose.append(pose_cache[iid])
                obs_rays.append(rays_cache[iid][f])
                obs_X.append(pt.xyz)
                obs_pid.append(pid)
                obs_img.append(iid)
                obs_f.append(f)
        if not obs_pid:
            return 0
        n = len(obs_pid)
        cap = _bucket(n)
        ez = np.asarray(_reproj_errors(
            jnp.asarray(self._pad(np.stack(obs_pose).astype(np.float32), cap)),
            jnp.asarray(self._pad(np.stack(obs_rays).astype(np.float32), cap)),
            jnp.asarray(self._pad(np.stack(obs_X).astype(np.float32), cap)),
        ))
        e, z = ez[0], ez[1]
        focals = np.array([self._focal(iid) for iid in obs_img])
        bad = (e[:n] * focals > self.options.filter_max_reproj_error) | (z[:n] <= 0)

        num_filtered = 0
        # drop bad observations
        for k in np.nonzero(bad)[0]:
            pid, iid, f = obs_pid[k], obs_img[k], obs_f[k]
            pt = self.rec.points3D.get(pid)
            if pt is None:
                continue
            pt.track = [(ii, ff) for (ii, ff) in pt.track if not (ii == iid and ff == f)]
            if self.rec.images[iid].point3D_ids[f] == pid:
                self.rec.images[iid].point3D_ids[f] = -1
            num_filtered += 1

        # drop short tracks and low-angle points (pure-numpy angle check;
        # projection centers computed host-side — a device round-trip per
        # image costs ~65ms through the tunnel)
        def np_center(pose):
            w, x, y, z = pose[:4] / np.linalg.norm(pose[:4])
            R = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ])
            return -R.T @ pose[4:7]

        centers_cache: Dict[int, np.ndarray] = {
            iid: np_center(pose_cache[iid]) for iid in self.registered
        }

        # vectorized max-pairwise-triangulation-angle test: points padded
        # to a common track capacity, one numpy einsum batch
        to_delete = []
        min_angle = np.radians(self.options.filter_min_tri_angle_deg)
        live = []
        for pid, pt in items:
            if pid not in self.rec.points3D:
                continue
            if len(pt.track) < self.options.min_track_len:
                to_delete.append(pid)
            else:
                live.append((pid, pt))
        if live:
            T = max(len(pt.track) for _, pt in live)
            npnt = len(live)
            centers = np.zeros((npnt, T, 3))
            cmask = np.zeros((npnt, T), bool)
            X = np.zeros((npnt, 3))
            for k, (pid, pt) in enumerate(live):
                for j, (iid, _) in enumerate(pt.track):
                    centers[k, j] = centers_cache[iid]
                cmask[k, : len(pt.track)] = True
                X[k] = pt.xyz
            rays = X[:, None, :] - centers  # (N, T, 3)
            ray2 = np.sum(rays * rays, -1)
            base2 = np.sum((centers[:, :, None, :] - centers[:, None, :, :]) ** 2, -1)
            denom = 2.0 * np.sqrt(np.maximum(
                ray2[:, :, None] * ray2[:, None, :], 1e-24))
            cosang = np.clip(
                (ray2[:, :, None] + ray2[:, None, :] - base2) / denom, -1, 1)
            ang = np.arccos(cosang)
            ang = np.minimum(ang, np.pi - ang)
            pair_ok = cmask[:, :, None] & cmask[:, None, :]
            ang = np.where(pair_ok, ang, 0.0)
            ii = np.arange(T)
            ang[:, ii, ii] = 0.0
            max_ang = ang.reshape(npnt, -1).max(1)
            for k, (pid, pt) in enumerate(live):
                if max_ang[k] < min_angle:
                    to_delete.append(pid)
        for pid in to_delete:
            self.rec.delete_point3D(pid)
            num_filtered += 1
        return num_filtered
