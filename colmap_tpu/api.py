"""pycolmap-parity Python API.

Reference: src/pycolmap/main.cc:44-52 and the pipeline bindings —
extract_features, match_exhaustive / match_sequential / match_spatial /
match_vocabtree, verify_matches (pipeline/sfm.cc), incremental_mapping
(:116), triangulate_points (:103), bundle_adjustment (:129),
patch_match_stereo (pipeline/mvs.cc:173), stereo_fusion (:235),
poisson_meshing / delaunay_meshing (pipeline/meshing.cc:119-146),
import_images / undistort_images (pipeline/images.cc:228-243).

A pycolmap user should find every pipeline function under the same name:

    import colmap_tpu.api as pycolmap
    pycolmap.extract_features(database_path, image_path)
    pycolmap.match_exhaustive(database_path)
    maps = pycolmap.incremental_mapping(database_path, image_path, output_path)
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from colmap_tpu.scene.database import Database
from colmap_tpu.scene.reconstruction import Reconstruction


def extract_features(database_path: str, image_path: str,
                     image_names: Optional[List[str]] = None,
                     camera_model: str = "SIMPLE_RADIAL",
                     camera_params: str = "",
                     single_camera: bool = False,
                     sift_options=None) -> None:
    """reference: pycolmap.extract_features."""
    from colmap_tpu.controllers import feature_extraction as fe
    from colmap_tpu.features.sift import SiftExtractionOptions

    with Database(database_path) as db:
        fe.run_feature_extraction(
            db, image_path,
            fe.ImageReaderOptions(camera_model=camera_model,
                                  camera_params=camera_params,
                                  single_camera=single_camera),
            sift_options or SiftExtractionOptions(),
            image_names=image_names)


def import_images(database_path: str, image_path: str,
                  camera_model: str = "SIMPLE_RADIAL",
                  image_names: Optional[List[str]] = None) -> None:
    """Register image + camera rows without features
    (reference: pycolmap.import_images)."""
    from colmap_tpu.controllers.feature_extraction import (
        ImageReaderOptions, _infer_camera)
    from colmap_tpu.sensor import bitmap as bitmap_mod
    from colmap_tpu.sensor import models as camera_models

    reader = ImageReaderOptions(camera_model=camera_model)
    with Database(database_path) as db:
        existing = {im["name"] for im in db.read_images().values()}
        for name in image_names or bitmap_mod.list_image_files(image_path):
            if name in existing:
                continue
            bmp = bitmap_mod.read_bitmap(os.path.join(image_path, name))
            params, _ = _infer_camera(reader, bmp)
            model_id = camera_models.MODEL_IDS_BY_NAME[camera_model]
            cid = db.write_camera(int(model_id), bmp.width, bmp.height,
                                  np.asarray(params))
            db.write_image(name, cid)
        db.commit()


def _match(database_path: str, strategy: str, **kw):
    from colmap_tpu.controllers import feature_matching as fm

    with Database(database_path) as db:
        opts = kw.pop("options", None) or fm.FeatureMatchingOptions()
        if strategy == "exhaustive":
            return fm.match_exhaustive(db, opts)
        if strategy == "sequential":
            return fm.match_sequential(db, opts)
        if strategy == "spatial":
            return fm.match_spatial(db, opts)
        if strategy == "vocabtree":
            return fm.match_vocab_tree(db, opts, **kw)
        raise ValueError(strategy)


def match_exhaustive(database_path: str, options=None):
    return _match(database_path, "exhaustive", options=options)


def match_sequential(database_path: str, options=None):
    return _match(database_path, "sequential", options=options)


def match_spatial(database_path: str, options=None):
    return _match(database_path, "spatial", options=options)


def match_vocabtree(database_path: str, vocab_tree_path: Optional[str] = None,
                    options=None):
    return _match(database_path, "vocabtree", options=options,
                  vocab_tree_path=vocab_tree_path)


def verify_matches(database_path: str, pairs_path: Optional[str] = None,
                   options=None):
    """Re-verify raw matches already in the database
    (reference: pycolmap.verify_matches)."""
    from colmap_tpu.controllers import feature_matching as fm
    from colmap_tpu.scene.database import pair_id_to_image_pair

    with Database(database_path) as db:
        pairs = []
        for (pid,) in db.conn.execute("SELECT pair_id FROM matches"):
            pairs.append(pair_id_to_image_pair(pid))
        return fm.match_and_verify_blocks(
            db, fm._chunk(pairs, 32), options or fm.FeatureMatchingOptions())


def incremental_mapping(database_path: str, image_path: str,
                        output_path: Optional[str] = None,
                        options=None, seed: int = 0
                        ) -> Dict[int, Reconstruction]:
    """reference: pycolmap.incremental_mapping (pipeline/sfm.cc:116)."""
    from colmap_tpu.controllers.incremental_pipeline import (
        IncrementalPipeline, IncrementalPipelineOptions)
    from colmap_tpu.scene import reconstruction_io

    with Database(database_path) as db:
        rec = IncrementalPipeline(
            db, options or IncrementalPipelineOptions()).run(seed=seed)
    maps: Dict[int, Reconstruction] = {}
    if rec is not None:
        maps[0] = rec
        if output_path:
            out = os.path.join(output_path, "0")
            os.makedirs(out, exist_ok=True)
            reconstruction_io.write_model(rec, out, ext=".bin")
    return maps


def triangulate_points(reconstruction: Reconstruction, database_path: str,
                       image_path: str = "",
                       output_path: Optional[str] = None,
                       refine_intrinsics: bool = False) -> Reconstruction:
    """reference: pycolmap.triangulate_points (pipeline/sfm.cc:103)."""
    from colmap_tpu.scene import reconstruction_io
    from colmap_tpu.tools import sfm_tools

    with Database(database_path) as db:
        rec = sfm_tools.triangulate_points(db, reconstruction)
    if output_path:
        os.makedirs(output_path, exist_ok=True)
        reconstruction_io.write_model(rec, output_path, ext=".bin")
    return rec


def bundle_adjustment(reconstruction: Reconstruction, options=None
                      ) -> Reconstruction:
    """Standalone global BA on a reconstruction (reference:
    pycolmap.bundle_adjustment, pipeline/sfm.cc:129). Operates on the model's
    own tracks (no database needed)."""
    import jax.numpy as jnp

    from colmap_tpu.estimators import bundle_adjustment as ba
    from colmap_tpu.sensor import models as camera_models

    rec = reconstruction
    reg = rec.registered_image_ids()
    if len(reg) < 2 or not rec.points3D:
        return rec
    img_index = {iid: k for k, iid in enumerate(reg)}
    pids = sorted(rec.points3D.keys())
    pid_index = {pid: k for k, pid in enumerate(pids)}
    cams = sorted(rec.cameras.keys())
    cam_index = {cid: k for k, cid in enumerate(cams)}
    obs_pose, obs_cam, obs_pt, obs_xy = [], [], [], []
    for pid in pids:
        for (iid, f) in rec.points3D[pid].track:
            if iid not in img_index:
                continue
            obs_pose.append(img_index[iid])
            obs_cam.append(cam_index[rec.images[iid].camera_id])
            obs_pt.append(pid_index[pid])
            obs_xy.append(rec.images[iid].xys[f])
    poses = np.stack([rec.images[i].cam_from_world for i in reg]).astype(np.float32)
    points = np.stack([rec.points3D[p].xyz for p in pids]).astype(np.float32)
    cam_params = np.stack([rec.cameras[c].padded_params() for c in cams])

    def bucket(n, lo=64):
        while lo < n:
            lo *= 2
        return lo

    cap = bucket(len(obs_xy))

    def pad(a, fill=0):
        out = np.full((cap,) + np.asarray(a).shape[1:], fill,
                      np.asarray(a).dtype)
        out[: len(a)] = a
        return out

    problem = ba.make_problem(
        poses, cam_params.astype(np.float32), points,
        pad(np.array(obs_pose, np.int32)),
        pad(np.array(obs_cam, np.int32)),
        pad(np.array(obs_pt, np.int32)),
        pad(np.stack(obs_xy).astype(np.float32)),
        obs_weight=pad(np.ones(len(obs_xy), np.float32)))
    state = ba.solve(problem, options or ba.BAOptions(max_iterations=20))
    new_poses = np.asarray(state.problem.poses, np.float64)
    new_points = np.asarray(state.problem.points, np.float64)
    for iid, k in img_index.items():
        rec.images[iid].cam_from_world = new_poses[k]
    for pid, k in pid_index.items():
        rec.points3D[pid].xyz = new_points[k]
    return rec


def undistort_images(output_path: str, input_path: str, image_path: str,
                     options=None) -> None:
    """reference: pycolmap.undistort_images (pipeline/images.cc:243)."""
    from colmap_tpu.image import undistortion as und
    from colmap_tpu.scene import reconstruction_io

    rec = reconstruction_io.read_model(input_path)
    und.run_undistorter(rec, image_path, output_path,
                        options or und.UndistortCameraOptions())


def patch_match_stereo(workspace_path: str, options=None) -> None:
    """reference: pycolmap.patch_match_stereo (pipeline/mvs.cc:173)."""
    from colmap_tpu.controllers import dense_reconstruction as dense

    dense.run_patch_match_stereo(
        workspace_path, options or dense.PatchMatchStereoOptions())


def stereo_fusion(output_path: str, workspace_path: str, options=None):
    """reference: pycolmap.stereo_fusion (pipeline/mvs.cc:235)."""
    from colmap_tpu.controllers import dense_reconstruction as dense
    from colmap_tpu.mvs.fusion import StereoFusionOptions

    return dense.run_stereo_fusion(workspace_path,
                                   options or StereoFusionOptions(),
                                   output_path=output_path)


def poisson_meshing(input_path: str, output_path: str, options=None):
    """reference: pycolmap.poisson_meshing (pipeline/meshing.cc:119)."""
    from colmap_tpu.controllers import dense_reconstruction as dense
    from colmap_tpu.mvs.meshing import PoissonMeshingOptions

    return dense.run_poisson_mesher(input_path, output_path,
                                    options or PoissonMeshingOptions())


def delaunay_meshing(workspace_path: str, output_path: str):
    """reference: pycolmap.delaunay_meshing (pipeline/meshing.cc:146)."""
    from colmap_tpu.controllers import dense_reconstruction as dense

    return dense.run_delaunay_mesher(workspace_path, output_path)


# ---------------------------------------------------------------------------
# Estimator bindings (reference: pycolmap estimators/*.cc)
# ---------------------------------------------------------------------------


def absolute_pose_estimation(points2D, points3D, camera, max_error_px: float = 12.0,
                             seed: int = 0):
    """P3P LO-RANSAC + GN refinement (reference: pycolmap.absolute_pose_estimation).

    points2D: (N, 2) pixels; camera: scene.reconstruction.Camera.
    Returns dict(success, cam_from_world (7,), num_inliers, inlier_mask).
    """
    import jax
    import jax.numpy as jnp

    from colmap_tpu.estimators import absolute_pose as ap
    from colmap_tpu.optim.ransac import RansacOptions, ransac
    from colmap_tpu.sensor import models as cm

    xy = np.asarray(points2D, np.float32)
    X = np.asarray(points3D, np.float32)
    rays = np.asarray(cm.cam_from_img(
        camera.model_id, jnp.asarray(camera.padded_params()),
        jnp.asarray(xy)))
    f = camera.mean_focal_length()
    err = max_error_px / f
    scale = 1.0 / max(err, 1e-12) ** 2

    def scaled(model, data):
        return ap.reprojection_residuals(model, data) * scale

    res = ransac(jax.random.PRNGKey(seed), ap.solve_p3p, scaled, ap.refit,
                 (jnp.asarray(X), jnp.asarray(rays, jnp.float32)),
                 jnp.ones(len(X), bool), 3,
                 RansacOptions(num_samples=1024, lo_iterations=2, max_error=1.0))
    return dict(success=bool(res.success),
                cam_from_world=np.asarray(res.model, np.float64),
                num_inliers=int(res.num_inliers),
                inlier_mask=np.asarray(res.inlier_mask))


def essential_matrix_estimation(points1, points2, camera1, camera2,
                                max_error_px: float = 4.0, seed: int = 0):
    """reference: pycolmap.essential_matrix_estimation."""
    return _two_view(points1, points2, camera1, camera2, max_error_px, seed,
                     want="E")


def fundamental_matrix_estimation(points1, points2, max_error_px: float = 4.0,
                                  seed: int = 0):
    """reference: pycolmap.fundamental_matrix_estimation."""
    return _two_view(points1, points2, None, None, max_error_px, seed,
                     want="F")


def homography_matrix_estimation(points1, points2, max_error_px: float = 4.0,
                                 seed: int = 0):
    """reference: pycolmap.homography_matrix_estimation."""
    return _two_view(points1, points2, None, None, max_error_px, seed,
                     want="H")


def _two_view(points1, points2, camera1, camera2, max_error_px, seed, want):
    import jax
    import jax.numpy as jnp

    from colmap_tpu.estimators import two_view_geometry as tvg
    from colmap_tpu.sensor import models as cm

    p1 = np.asarray(points1, np.float32)
    p2 = np.asarray(points2, np.float32)
    n = len(p1)
    if camera1 is not None:
        r1 = np.asarray(cm.cam_from_img(camera1.model_id,
                                        jnp.asarray(camera1.padded_params()),
                                        jnp.asarray(p1)))
        r2 = np.asarray(cm.cam_from_img(camera2.model_id,
                                        jnp.asarray(camera2.padded_params()),
                                        jnp.asarray(p2)))
        focal = np.sqrt(camera1.mean_focal_length() * camera2.mean_focal_length())
    else:
        r1, r2 = p1, p2
        focal = 1.0
    opts = tvg.TwoViewGeometryOptions(max_error_px=max_error_px,
                                      compute_relative_pose=(want == "E"))
    g = tvg.estimate_two_view_geometry(
        jax.random.PRNGKey(seed), jnp.asarray(r1), jnp.asarray(r2),
        jnp.asarray(p1), jnp.asarray(p2), jnp.ones(n, bool),
        jnp.asarray(focal, jnp.float32), opts)
    out = dict(success=int(g.num_inliers) >= opts.min_num_inliers,
               num_inliers=int(g.num_inliers),
               inlier_mask=np.asarray(g.inlier_mask),
               config=int(g.config))
    out["E"] = np.asarray(g.E, np.float64)
    out["F"] = np.asarray(g.F, np.float64)
    out["H"] = np.asarray(g.H, np.float64)
    if want == "E":
        out["cam2_from_cam1"] = np.asarray(g.cam2_from_cam1, np.float64)
    return out


def rig_absolute_pose_estimation(points2D, points3D, cam_idx, cams_from_rig,
                                 cameras, max_error_px: float = 12.0,
                                 seed: int = 0):
    """Generalized (rig) absolute pose (reference:
    pycolmap.rig_absolute_pose_estimation)."""
    import jax
    import jax.numpy as jnp

    from colmap_tpu.estimators import generalized_pose as gp
    from colmap_tpu.optim.ransac import RansacOptions
    from colmap_tpu.sensor import models as cm

    xy = np.asarray(points2D, np.float32)
    cam_idx = np.asarray(cam_idx, np.int32)
    rays = np.zeros_like(xy)
    f_mean = np.mean([c.mean_focal_length() for c in cameras])
    for k, cam in enumerate(cameras):
        m = cam_idx == k
        if m.any():
            rays[m] = np.asarray(cm.cam_from_img(
                cam.model_id, jnp.asarray(cam.padded_params()),
                jnp.asarray(xy[m])))
    res = gp.estimate_generalized_absolute_pose(
        jax.random.PRNGKey(seed), jnp.asarray(points3D, jnp.float32),
        jnp.asarray(rays), jnp.asarray(cam_idx),
        jnp.asarray(np.asarray(cams_from_rig, np.float32)),
        jnp.ones(len(xy), bool),
        options=RansacOptions(num_samples=2048, lo_iterations=2,
                              max_error=max_error_px / f_mean))
    return dict(success=bool(res.success),
                rig_from_world=np.asarray(res.rig_from_world, np.float64),
                num_inliers=int(res.num_inliers),
                inlier_mask=np.asarray(res.inlier_mask))


def align_reconstructions(src: Reconstruction, dst: Reconstruction,
                          max_error: float = 0.1):
    """Robust Sim3 aligning src to dst via common images (falling back to
    common 3D points). Returns the (8,) Sim3 or None.

    Reference: pycolmap align_reconstructions / estimators/alignment.h.
    """
    from colmap_tpu.estimators.alignment import align_reconstructions_robust

    return align_reconstructions_robust(src, dst, max_error=max_error)


def merge_reconstructions(dst: Reconstruction, src: Reconstruction,
                          max_proj_center_error: float = 0.1) -> bool:
    """Merge src into dst in place (reference: MergeReconstructions)."""
    from colmap_tpu.estimators.alignment import (
        merge_reconstructions as _merge)

    return _merge(dst, src, max_proj_center_error=max_proj_center_error)


def optimize_sim3_pose_graph(initial, edges, measurements, weights=None,
                             num_iters: int = 20):
    """Joint Sim3 pose-graph refinement (loop closure for cluster merging;
    see estimators/pose_graph.py)."""
    from colmap_tpu.estimators.pose_graph import (
        optimize_sim3_pose_graph as _opt)

    return _opt(initial, edges, measurements, weights, num_iters=num_iters)
