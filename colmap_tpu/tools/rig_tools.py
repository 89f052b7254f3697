"""Rig bundle adjustment over a reconstruction + rig_config.json.

Reference: RunRigBundleAdjuster (exe/sfm.cc) — reads the rig configuration,
groups registered images into snapshots by timestamp-like name matching,
and runs the rig-constrained BA.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List

import numpy as np

from colmap_tpu.estimators import rig_bundle_adjustment as rba
from colmap_tpu.geometry import rigid3
from colmap_tpu.scene.camera_rig import CameraRig
from colmap_tpu.scene.reconstruction import Reconstruction

logger = logging.getLogger("colmap_tpu")


def load_rig_config(path: str, rec: Reconstruction) -> List[CameraRig]:
    """Parse COLMAP's rig_config.json into CameraRigs with snapshots
    grouped by the image-name suffix after each camera's prefix."""
    with open(path) as fp:
        config = json.load(fp)
    rigs = []
    for rig_cfg in config:
        rig = CameraRig()
        prefixes: Dict[int, str] = {}
        for cam_cfg in rig_cfg["cameras"]:
            cid = int(cam_cfg["camera_id"])
            q = np.asarray(cam_cfg.get("cam_from_rig_rotation", [1, 0, 0, 0]),
                           float)
            t = np.asarray(cam_cfg.get("cam_from_rig_translation", [0, 0, 0]),
                           float)
            rig.add_camera(cid, np.concatenate([q, t]))
            prefixes[cid] = cam_cfg.get("image_prefix", "")
        rig.ref_camera_id = int(rig_cfg.get("ref_camera_id",
                                            rig.ref_camera_id))
        # snapshots: images grouped by the name remainder after the prefix
        groups: Dict[str, List[int]] = {}
        for iid, im in rec.images.items():
            if im.camera_id not in prefixes:
                continue
            prefix = prefixes[im.camera_id]
            if prefix and not im.name.startswith(prefix):
                continue
            suffix = im.name[len(prefix):]
            groups.setdefault(suffix, []).append(iid)
        for suffix in sorted(groups):
            if len(groups[suffix]) >= 1:
                rig.add_snapshot(groups[suffix])
        rigs.append(rig)
    return rigs


def run_rig_bundle_adjustment(rec: Reconstruction, rig_config_path: str,
                              refine_relative_poses: bool = True,
                              max_iterations: int = 30) -> Reconstruction:
    rigs = load_rig_config(rig_config_path, rec)
    for rig in rigs:
        _adjust_one_rig(rec, rig, refine_relative_poses, max_iterations)
    return rec


def _adjust_one_rig(rec: Reconstruction, rig: CameraRig,
                    refine_relative_poses: bool, max_iterations: int):
    import jax.numpy as jnp

    cam_ids = sorted(rig.cams_from_rig.keys())
    # put the reference camera first (its extrinsics are the gauge)
    cam_ids.remove(rig.ref_camera_id)
    cam_ids.insert(0, rig.ref_camera_id)
    cam_pos = {cid: k for k, cid in enumerate(cam_ids)}

    snapshots = [s for s in rig.snapshots
                 if any(rec.images[i].registered for i in s)]
    if not snapshots:
        logger.warning("rig has no registered snapshots")
        return
    rig_poses = np.stack([
        rig.compute_rig_from_world(rig.snapshots.index(s), rec)
        for s in snapshots]).astype(np.float32)
    cams_from_rig = np.stack([rig.cams_from_rig[c]
                              for c in cam_ids]).astype(np.float32)

    # collect observations of points seen by rig images
    img_to_snap = {}
    for si, s in enumerate(snapshots):
        for iid in s:
            img_to_snap[iid] = si
    pids = sorted({int(pid) for iid in img_to_snap
                   for pid in rec.images[iid].point3D_ids if pid >= 0})
    pid_pos = {pid: k for k, pid in enumerate(pids)}
    if not pids:
        return
    obs_s, obs_c, obs_p, obs_xy = [], [], [], []
    for pid in pids:
        for (iid, f) in rec.points3D[pid].track:
            if iid not in img_to_snap:
                continue
            obs_s.append(img_to_snap[iid])
            obs_c.append(cam_pos[rec.images[iid].camera_id])
            obs_p.append(pid_pos[pid])
            obs_xy.append(rec.images[iid].xys[f])
    points = np.stack([rec.points3D[p].xyz for p in pids]).astype(np.float32)
    from colmap_tpu.sensor import models as cm

    cam_params = np.stack([rec.cameras[c].padded_params() for c in cam_ids])
    model_id = rec.cameras[cam_ids[0]].model_id

    problem = rba.make_rig_problem(
        rig_poses, cams_from_rig, cam_params.astype(np.float32), points,
        np.array(obs_s, np.int32), np.array(obs_c, np.int32),
        np.array(obs_p, np.int32), np.stack(obs_xy).astype(np.float32))
    opts = rba.RigBAOptions(max_iterations=max_iterations,
                            camera_model_id=int(model_id),
                            refine_relative_poses=refine_relative_poses)
    solved, cost = rba.solve_rig(problem, opts)
    logger.info("rig BA final cost %.3f", float(cost))

    # write back: image poses = cam_from_rig o rig_from_world
    new_rig = np.asarray(solved.rig_poses, np.float64)
    new_cams = np.asarray(solved.cams_from_rig, np.float64)
    for k, cid in enumerate(cam_ids):
        rig.cams_from_rig[cid] = new_cams[k]
    for si, s in enumerate(snapshots):
        for iid in s:
            cid = rec.images[iid].camera_id
            pose = np.asarray(rigid3.compose(
                jnp.asarray(new_cams[cam_pos[cid]], jnp.float32),
                jnp.asarray(new_rig[si], jnp.float32)))
            rec.images[iid].cam_from_world = pose.astype(np.float64)
    new_points = np.asarray(solved.points, np.float64)
    for pid, k in pid_pos.items():
        rec.points3D[pid].xyz = new_points[k]
