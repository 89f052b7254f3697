"""Multi-camera rig support.

Reference: src/colmap/scene/camera_rig.h:46 — a rig is a set of cameras
with fixed relative poses (cam_from_rig); a snapshot is the set of images
captured at one rig position. Used by the rig bundle adjuster
(estimators/bundle_adjustment.h:201 RigBundleAdjuster).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from colmap_tpu.geometry import rigid3


@dataclasses.dataclass
class CameraRig:
    # camera_id -> cam_from_rig (7,) [qw qx qy qz t]
    cams_from_rig: Dict[int, np.ndarray] = dataclasses.field(default_factory=dict)
    ref_camera_id: Optional[int] = None
    # each snapshot: list of image ids captured simultaneously
    snapshots: List[List[int]] = dataclasses.field(default_factory=list)

    def add_camera(self, camera_id: int, cam_from_rig: np.ndarray):
        self.cams_from_rig[camera_id] = np.asarray(cam_from_rig, np.float64)
        if self.ref_camera_id is None:
            self.ref_camera_id = camera_id

    def add_snapshot(self, image_ids: List[int]):
        self.snapshots.append(list(image_ids))

    @property
    def num_cameras(self) -> int:
        return len(self.cams_from_rig)

    def check(self, rec) -> bool:
        for snap in self.snapshots:
            cams = [rec.images[i].camera_id for i in snap]
            if len(set(cams)) != len(cams):
                return False
            if any(c not in self.cams_from_rig for c in cams):
                return False
        return True

    def compute_rig_from_world(self, snapshot_idx: int, rec) -> np.ndarray:
        """Average rig pose over a snapshot's registered images
        (reference: CameraRig::ComputeRigFromWorld)."""
        poses = []
        for iid in self.snapshots[snapshot_idx]:
            im = rec.images[iid]
            if not im.registered:
                continue
            cam_from_rig = self.cams_from_rig[im.camera_id]
            rig_from_cam = np.asarray(
                rigid3.inverse(jnp.asarray(cam_from_rig, jnp.float32)))
            rig_from_world = np.asarray(rigid3.compose(
                jnp.asarray(rig_from_cam, jnp.float32),
                jnp.asarray(im.cam_from_world, jnp.float32)))
            poses.append(rig_from_world)
        if not poses:
            raise ValueError("no registered images in snapshot")
        poses = np.stack(poses)
        # quaternion averaging (same hemisphere) + mean translation
        q = poses[:, :4]
        q = np.where((q @ q[0])[:, None] < 0, -q, q)
        q_mean = q.mean(0)
        q_mean /= np.linalg.norm(q_mean)
        return np.concatenate([q_mean, poses[:, 4:].mean(0)])

    def compute_cams_from_rigs(self, rec):
        """Calibrate cam_from_rig from the registered reconstruction
        (reference: ComputeCamsFromRigs): relative pose of each camera to
        the reference camera, averaged over snapshots."""
        ref = self.ref_camera_id
        rel: Dict[int, List[np.ndarray]] = {c: [] for c in self.cams_from_rig}
        for snap in self.snapshots:
            by_cam = {rec.images[i].camera_id: i for i in snap
                      if rec.images[i].registered}
            if ref not in by_cam:
                continue
            ref_pose = jnp.asarray(rec.images[by_cam[ref]].cam_from_world,
                                   jnp.float32)
            world_from_ref = rigid3.inverse(ref_pose)
            for cid, iid in by_cam.items():
                cam_pose = jnp.asarray(rec.images[iid].cam_from_world,
                                       jnp.float32)
                rel[cid].append(np.asarray(rigid3.compose(cam_pose,
                                                          world_from_ref)))
        for cid, poses in rel.items():
            if not poses:
                continue
            poses = np.stack(poses)
            q = poses[:, :4]
            q = np.where((q @ q[0])[:, None] < 0, -q, q)
            q_mean = q.mean(0)
            q_mean /= np.linalg.norm(q_mean)
            self.cams_from_rig[cid] = np.concatenate(
                [q_mean, poses[:, 4:].mean(0)]).astype(np.float64)
