"""SfM utility entry points: known-pose triangulation, image registration
into an existing model, point filtering, color extraction, pose-prior
mapping.

Reference: RunPointTriangulator (exe/sfm.cc), RunImageRegistrator,
RunPointFiltering, RunColorExtractor, RunPosePriorMapper;
IncrementalPipeline::TriangulateReconstruction
(controllers/incremental_mapper.cc:559).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Dict, List, Optional

import numpy as np

from colmap_tpu.scene.database import Database
from colmap_tpu.scene.database_cache import DatabaseCache
from colmap_tpu.scene.reconstruction import Reconstruction
from colmap_tpu.sfm.incremental_mapper import (
    IncrementalMapper,
    IncrementalMapperOptions,
)

logger = logging.getLogger("colmap_tpu")


def _mapper_with_poses(database: Database, rec: Reconstruction,
                       options: IncrementalMapperOptions,
                       min_num_matches: int = 15,
                       seed: int = 0) -> IncrementalMapper:
    """Build a mapper whose state mirrors an existing reconstruction."""
    cache = DatabaseCache.create(database, min_num_matches=min_num_matches)
    mapper = IncrementalMapper(cache, options, seed=seed)
    mapper.seed_from_model(rec)
    return mapper


def triangulate_points(database: Database, rec: Reconstruction,
                       refine: bool = True,
                       options: IncrementalMapperOptions = IncrementalMapperOptions(),
                       seed: int = 0) -> Reconstruction:
    """Triangulate all matches against KNOWN poses (reference:
    RunPointTriangulator / TriangulateReconstruction)."""
    mapper = _mapper_with_poses(database, rec, options, seed=seed)
    n = mapper.triangulate_images(list(mapper.registered))
    logger.info("triangulated %d images: +%d observations",
                len(mapper.registered), n)
    if refine and mapper.num_points3D():
        # points-only global BA: freeze every pose
        import jax.numpy as jnp

        problem, all_imgs, pids, cams = mapper._build_ba_problem(
            list(mapper.registered), fix_extra_images=True)
        if problem is not None:
            pose_mask = np.zeros(problem.pose_mask.shape, np.float32)
            problem = problem._replace(pose_mask=jnp.asarray(pose_mask))
            from colmap_tpu.estimators import bundle_adjustment as ba

            state = ba.solve(problem, ba.BAOptions(max_iterations=10))
            mapper._apply_ba_result(state, all_imgs, pids, cams)
    mapper.filter_points()
    return mapper.finalize()


def register_images(database: Database, rec: Reconstruction,
                    options: IncrementalMapperOptions = IncrementalMapperOptions(),
                    seed: int = 0) -> Reconstruction:
    """Register currently unregistered images against an existing model
    WITHOUT changing the model (reference: RunImageRegistrator)."""
    mapper = _mapper_with_poses(database, rec, options, seed=seed)
    todo = [iid for iid in sorted(mapper.rec.images)
            if not mapper.rec.images[iid].registered]
    if todo:
        accepted = mapper.register_next_images(todo)
        logger.info("registered %d of %d images", len(accepted), len(todo))
    return mapper.finalize()


def filter_points(rec: Reconstruction, max_reproj_error: float = 4.0,
                  min_tri_angle_deg: float = 1.5) -> int:
    """Standalone point filtering (reference: RunPointFiltering) —
    reprojection error, cheirality, triangulation angle."""
    import jax.numpy as jnp

    from colmap_tpu.geometry import rigid3
    from colmap_tpu.sensor import models as cm

    dead = []
    for pid, pt in rec.points3D.items():
        errs = []
        centers = []
        bad = False
        for (iid, p2d) in pt.track:
            im = rec.images[iid]
            if not im.registered:
                continue
            cam = rec.cameras[im.camera_id]
            pose = jnp.asarray(im.cam_from_world, jnp.float32)
            Xc = np.asarray(rigid3.apply(pose, jnp.asarray(pt.xyz, jnp.float32)))
            if Xc[2] <= 0:
                bad = True
                break
            xy = np.asarray(cm.img_from_cam(
                cam.model_id, jnp.asarray(cam.padded_params()),
                jnp.asarray((Xc[:2] / Xc[2])[None], jnp.float32)))[0]
            errs.append(float(np.linalg.norm(xy - im.xys[p2d])))
            centers.append(im.projection_center())
        if bad or not errs or max(errs) > max_reproj_error:
            dead.append(pid)
            continue
        # max pairwise triangulation angle
        if len(centers) >= 2:
            max_ang = 0.0
            X = pt.xyz
            for i in range(len(centers)):
                for j in range(i + 1, len(centers)):
                    va = centers[i] - X
                    vb = centers[j] - X
                    cosv = np.dot(va, vb) / max(
                        np.linalg.norm(va) * np.linalg.norm(vb), 1e-12)
                    max_ang = max(max_ang, np.degrees(np.arccos(np.clip(cosv, -1, 1))))
            if max_ang < min_tri_angle_deg:
                dead.append(pid)
    for pid in dead:
        rec.delete_point3D(pid)
    return len(dead)


def extract_colors(rec: Reconstruction, image_dir: str) -> int:
    """Mean track color per 3D point (reference: RunColorExtractor /
    Reconstruction::ExtractColorsForImage)."""
    from colmap_tpu.sensor import bitmap as bitmap_mod

    sums: Dict[int, np.ndarray] = {pid: np.zeros(3) for pid in rec.points3D}
    counts: Dict[int, int] = {pid: 0 for pid in rec.points3D}
    for iid, im in rec.images.items():
        if not im.registered:
            continue
        path = os.path.join(image_dir, im.name)
        if not os.path.exists(path):
            continue
        bmp = bitmap_mod.read_bitmap(path, as_rgb=True)
        h, w = bmp.data.shape[:2]
        for p2d, pid in enumerate(im.point3D_ids):
            if pid < 0:
                continue
            x, y = im.xys[p2d]
            xi = int(np.clip(round(x - 0.5), 0, w - 1))
            yi = int(np.clip(round(y - 0.5), 0, h - 1))
            sums[int(pid)] += bmp.data[yi, xi][:3]
            counts[int(pid)] += 1
    n = 0
    for pid, pt in rec.points3D.items():
        if counts[pid] > 0:
            pt.color = np.clip(sums[pid] / counts[pid], 0, 255).astype(np.uint8)
            n += 1
    return n


def run_pose_prior_mapper(database: Database, options=None, seed: int = 0
                          ) -> Optional[Reconstruction]:
    """Incremental mapping + alignment to position priors (reference:
    RunPosePriorMapper + PosePriorBundleAdjuster, exe/sfm.cc)."""
    from colmap_tpu.controllers.incremental_pipeline import (
        IncrementalPipeline, IncrementalPipelineOptions)
    from colmap_tpu.tools.model_tools import align_model_to_positions

    pipeline = IncrementalPipeline(database, options or IncrementalPipelineOptions())
    rec = pipeline.run(seed=seed)
    if rec is None:
        return None
    priors = database.read_pose_priors()
    if priors:
        names = {iid: im["name"] for iid, im in database.read_images().items()}
        positions = {}
        for iid, pr in priors.items():
            pos = np.asarray(pr["position"], float)
            if pr.get("coordinate_system", 0) == 1:  # WGS84 -> ENU
                continue  # converted jointly below
            positions[names[iid]] = pos
        if any(pr.get("coordinate_system", 0) == 1 for pr in priors.values()):
            import jax.numpy as jnp

            from colmap_tpu.geometry import gps

            ids = sorted(priors.keys())
            lla = np.stack([np.asarray(priors[i]["position"], float) for i in ids])
            enu = np.asarray(gps.ell_to_enu(jnp.asarray(lla)))
            positions = {names[i]: enu[k] for k, i in enumerate(ids)}
        # prior noise scale sets the alignment tolerance
        spread = np.std(np.stack(list(positions.values())), axis=0).mean() or 1.0
        aligned = align_model_to_positions(rec, positions,
                                           max_error=max(0.05 * spread, 1e-3))
        if aligned is not None:
            rec = aligned
            # prior-constrained BA keeps the model pinned to the prior frame
            # (reference: PosePriorBundleAdjuster)
            from colmap_tpu.estimators.pose_prior_ba import refine_with_priors

            name_to_id = {im.name: iid for iid, im in rec.images.items()}
            id_priors = {name_to_id[n]: p for n, p in positions.items()
                         if n in name_to_id}
            model_id = rec.cameras[sorted(rec.cameras)[0]].model_id
            from colmap_tpu.estimators.pose_prior_ba import PriorBAOptions

            refine_with_priors(
                rec, id_priors, sigma=max(0.02 * spread, 1e-3),
                options=PriorBAOptions(camera_model_id=int(model_id)))
    return rec
