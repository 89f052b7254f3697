"""In-memory snapshot of the database for the mapper.

Reference: src/colmap/scene/database_cache.h:53 — loads cameras, images,
keypoints and verified matches once, builds the correspondence graph.
Additionally precomputes the normalized camera rays per image (one batched
cam_from_img call per camera group) so the mapper's device batches gather
from ready arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from colmap_tpu.scene.correspondence_graph import CorrespondenceGraph
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.reconstruction import Camera
from colmap_tpu.sensor import models as camera_models


@dataclasses.dataclass
class CachedImage:
    image_id: int
    name: str
    camera_id: int
    xys: np.ndarray  # (F, 2) float32 pixels
    rays: np.ndarray  # (F, 2) float32 normalized camera coords


class DatabaseCache:
    def __init__(self):
        self.cameras: Dict[int, Camera] = {}
        self.images: Dict[int, CachedImage] = {}
        self.pose_priors: Dict[int, dict] = {}
        self.graph = CorrespondenceGraph()

    @classmethod
    def create(cls, database: Database, min_num_matches: int = 15,
               image_names: Optional[set] = None) -> "DatabaseCache":
        import jax.numpy as jnp

        cache = cls()
        for cid, cam in database.read_cameras().items():
            cache.cameras[cid] = Camera(
                camera_id=cid,
                model_id=cam["model_id"],
                width=cam["width"],
                height=cam["height"],
                params=cam["params"],
            )

        for iid, im in database.read_images().items():
            if image_names is not None and im["name"] not in image_names:
                continue
            kp = database.read_keypoints(iid)
            if kp is None:
                continue
            xys = kp[:, :2].astype(np.float32)
            cam = cache.cameras[im["camera_id"]]
            rays = np.asarray(
                camera_models.cam_from_img(
                    cam.model_id,
                    jnp.asarray(cam.padded_params()),
                    jnp.asarray(xys),
                )
            )
            cache.images[iid] = CachedImage(
                image_id=iid,
                name=im["name"],
                camera_id=im["camera_id"],
                xys=xys,
                rays=rays,
            )
            cache.graph.add_image(iid, len(xys))

        cache.pose_priors = database.read_pose_priors()

        for (i1, i2), tvg in database.read_all_two_view_geometries().items():
            if i1 not in cache.images or i2 not in cache.images:
                continue
            m = tvg["inlier_matches"]
            if len(m) >= min_num_matches:
                cache.graph.add_correspondences(i1, i2, m.astype(np.int64))
        cache.graph.finalize()
        return cache
