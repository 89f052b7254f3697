"""The outer incremental-SfM pipeline.

Reference: src/colmap/controllers/incremental_mapper.h:39-220 —
LoadDatabase -> init pair -> register/triangulate/local-BA loop with
growth-triggered global BA -> filtering. One sub-model for now (multi-model
fallback is a later round).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

from colmap_tpu.estimators import bundle_adjustment as ba
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.database_cache import DatabaseCache
from colmap_tpu.scene.reconstruction import Reconstruction
from colmap_tpu.sfm.incremental_mapper import (
    IncrementalMapper,
    IncrementalMapperOptions,
)

logger = logging.getLogger("colmap_tpu")


@dataclasses.dataclass
class IncrementalPipelineOptions:
    mapper: IncrementalMapperOptions = dataclasses.field(
        default_factory=IncrementalMapperOptions
    )
    min_num_matches: int = 15
    ba_global_images_ratio: float = 1.1  # reference growth trigger
    ba_global_points_ratio: float = 1.1
    ba_refine_focal_length: bool = True
    ba_refine_extra_params: bool = True
    min_model_size: int = 3
    init_num_trials: int = 200
    extract_colors: bool = False


class IncrementalPipeline:
    """Run incremental SfM from a database into a Reconstruction."""

    def __init__(self, database: Database,
                 options: IncrementalPipelineOptions = IncrementalPipelineOptions()):
        self.database = database
        self.options = options

    def run(self, seed: int = 0, image_names=None) -> Optional[Reconstruction]:
        cache = DatabaseCache.create(
            self.database, min_num_matches=self.options.min_num_matches,
            image_names=image_names,
        )
        if len(cache.images) < 2:
            return None
        # retry initialization with the next-best pair on failure
        # (reference: init_num_trials / max_reg_trials re-init loop,
        # controllers/incremental_mapper.cc:474-540)
        mapper = None
        tried = set()
        for _ in range(self.options.init_num_trials):
            candidate = IncrementalMapper(cache, self.options.mapper, seed=seed)
            pair, g = candidate.find_initial_image_pair(exclude=tried)
            if pair is None:
                logger.warning("no good initial pair found")
                return None
            logger.info("initializing with pair %s (%d inliers)",
                        pair, int(g.num_inliers))
            if candidate.register_initial_image_pair(pair[0], pair[1], g):
                mapper = candidate
                break
            logger.warning("initial pair %s triangulation failed, retrying", pair)
            tried.add(pair)
        if mapper is None:
            return None
        mapper.adjust_global_bundle()
        mapper.filter_points()

        last_global_images = 2
        last_global_points = len(mapper.rec.points3D)

        while True:
            candidates = mapper.find_next_images()
            if not candidates:
                break
            registered_any = False
            for iid in candidates:
                if mapper.register_next_image(iid):
                    logger.info(
                        "registered image %d (#%d)", iid, len(mapper.registered)
                    )
                    mapper.triangulate_image(iid)
                    mapper.adjust_local_bundle(iid)
                    mapper.filter_points()
                    registered_any = True

                    n_img = len(mapper.registered)
                    n_pts = max(len(mapper.rec.points3D), 1)
                    if (
                        n_img > self.options.ba_global_images_ratio * last_global_images
                        or n_pts > self.options.ba_global_points_ratio * last_global_points
                    ):
                        logger.info("global BA at %d images", n_img)
                        mapper.adjust_global_bundle(
                            refine_intrinsics=self.options.ba_refine_focal_length
                            and n_img >= 8
                        )
                        mapper.filter_points()
                        last_global_images = n_img
                        last_global_points = len(mapper.rec.points3D)
                    break  # re-rank candidates after each registration
            if not registered_any:
                break

        # final global BA + filtering
        mapper.adjust_global_bundle(
            refine_intrinsics=self.options.ba_refine_focal_length
            and len(mapper.registered) >= 8
        )
        mapper.filter_points()
        if mapper.rec.num_registered_images() < self.options.min_model_size:
            return None
        return mapper.rec
