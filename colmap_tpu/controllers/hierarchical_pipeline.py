"""Hierarchical mapper: cluster the scene, map clusters, merge models.

Reference: src/colmap/controllers/hierarchical_mapper.h:45-80 — normalized-
cut scene clustering -> per-cluster incremental mapping -> model merging.
The TPU design maps clusters sequentially on one chip or in parallel across
hosts (cluster index = DP axis); merging is Sim3 alignment over the overlap
images (estimators/alignment.py).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional

from colmap_tpu.controllers.incremental_pipeline import (
    IncrementalPipeline,
    IncrementalPipelineOptions,
)
from colmap_tpu.estimators import alignment as alignment_mod
from colmap_tpu.scene import scene_clustering as sc
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.reconstruction import Reconstruction

logger = logging.getLogger("colmap_tpu")


@dataclasses.dataclass
class HierarchicalPipelineOptions:
    clustering: sc.SceneClusteringOptions = dataclasses.field(
        default_factory=sc.SceneClusteringOptions)
    incremental: IncrementalPipelineOptions = dataclasses.field(
        default_factory=IncrementalPipelineOptions)
    min_num_inliers: int = 15


class HierarchicalPipeline:
    def __init__(self, database: Database,
                 options: HierarchicalPipelineOptions = HierarchicalPipelineOptions()):
        self.database = database
        self.options = options

    def run(self, seed: int = 0) -> Optional[Reconstruction]:
        weights = sc.edge_weights_from_database(
            self.database, self.options.min_num_inliers)
        image_ids = sorted(self.database.read_images().keys())
        tree = sc.cluster_scene(image_ids, weights, self.options.clustering)
        leaves = tree.leaves()
        logger.info("scene clustered into %d leaves", len(leaves))

        id_to_name = {iid: im["name"]
                      for iid, im in self.database.read_images().items()}
        recs: List[Reconstruction] = []
        for li, leaf in enumerate(leaves):
            names = {id_to_name[iid] for iid in leaf.image_ids}
            pipeline = IncrementalPipeline(self.database, self.options.incremental)
            rec = pipeline.run(seed=seed + li, image_names=names)
            if rec is not None:
                logger.info("cluster %d: %d images registered",
                            li, rec.num_registered_images())
                recs.append(rec)
        if not recs:
            return None
        recs.sort(key=lambda r: -r.num_registered_images())
        base = recs[0]
        pending = recs[1:]
        progress = True
        while pending and progress:
            progress = False
            rest = []
            for rec in pending:
                if alignment_mod.merge_reconstructions(base, rec):
                    progress = True
                else:
                    rest.append(rec)
            pending = rest
        if pending:
            logger.warning("%d cluster models could not be merged", len(pending))
        return base
