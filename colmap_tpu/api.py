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
