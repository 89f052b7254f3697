"""One-click reconstruction: images dir -> sparse (and later dense) model.

Reference: src/colmap/controllers/automatic_reconstruction.h:41-126 —
extract -> match (strategy by data type) -> incremental mapper
[-> undistort -> stereo -> fusion -> mesh]. Quality presets scale the
work-bounding knobs the same way the reference does (LOW..EXTREME).
"""

from __future__ import annotations

import dataclasses
import enum
import logging
import os
from typing import Optional

from colmap_tpu.controllers import feature_extraction as fe
from colmap_tpu.controllers import feature_matching as fm
from colmap_tpu.controllers.incremental_pipeline import (
    IncrementalPipeline,
    IncrementalPipelineOptions,
)
from colmap_tpu.features import sift as sift_mod
from colmap_tpu.scene.database import Database

logger = logging.getLogger("colmap_tpu")


class DataType(enum.Enum):
    INDIVIDUAL = "individual"
    VIDEO = "video"
    INTERNET = "internet"


class Quality(enum.Enum):
    LOW = "low"
    MEDIUM = "medium"
    HIGH = "high"
    EXTREME = "extreme"


@dataclasses.dataclass
class AutomaticReconstructionOptions:
    workspace_path: str = ""
    image_path: str = ""
    data_type: DataType = DataType.INDIVIDUAL
    quality: Quality = Quality.HIGH
    camera_model: str = "SIMPLE_RADIAL"
    single_camera: bool = False
    camera_params: str = ""
    sparse: bool = True
    dense: bool = False
    num_threads: int = -1
    # VIDEO sequential-matching temporal window (reference
    # SequentialMatchingOptions.overlap). Slow orbital / small-baseline
    # footage needs a window wide enough that some pair clears the
    # mapper's 16-degree init triangulation-angle gate with
    # init_min_num_inliers correspondences.
    video_overlap: int = 10

    def sift_options(self) -> sift_mod.SiftExtractionOptions:
        # reference quality scaling (automatic_reconstruction.cc)
        table = {
            Quality.LOW: (1000, 2048),
            Quality.MEDIUM: (1600, 4096),
            Quality.HIGH: (2400, 8192),
            Quality.EXTREME: (3200, 8192),
        }
        max_size, max_feats = table[self.quality]
        return sift_mod.SiftExtractionOptions(
            max_image_size=max_size, max_num_features=max_feats)


def run_automatic_reconstruction(
    options: AutomaticReconstructionOptions,
    mapper_options: Optional[IncrementalPipelineOptions] = None,
    seed: int = 0,
    stage_timings: Optional[dict] = None,
):
    """Returns (reconstruction | None, database).

    When `stage_timings` is a dict it is filled with per-stage wall
    seconds ("extraction", "matching", "mapping", plus the mapper's own
    stage_s breakdown under "mapping_stages") — the reference reports the
    same breakdown through its controller timers."""
    import time as _time

    os.makedirs(options.workspace_path, exist_ok=True)
    db_path = os.path.join(options.workspace_path, "database.db")
    database = Database(db_path)

    reader = fe.ImageReaderOptions(
        camera_model=options.camera_model,
        single_camera=options.single_camera,
        camera_params=options.camera_params,
    )
    logger.info("=== feature extraction ===")
    t0 = _time.perf_counter()
    fe.run_feature_extraction(database, options.image_path, reader,
                              options.sift_options())
    t1 = _time.perf_counter()

    logger.info("=== feature matching ===")
    match_opts = fm.FeatureMatchingOptions()
    if options.data_type == DataType.VIDEO:
        # video sequences revisit places: vocab-tree loop detection joins
        # the temporal window (reference automatic_reconstruction.cc wires
        # SequentialMatching with loop detection for VIDEO)
        from colmap_tpu.features import pairing as pairing_mod

        fm.match_sequential(
            database, match_opts,
            pairing=pairing_mod.SequentialPairingOptions(
                overlap=options.video_overlap,
                loop_detection=True),
            seed=seed)
    else:
        fm.match_exhaustive(database, match_opts, seed=seed)
    t2 = _time.perf_counter()

    rec = None
    pipeline = None
    if options.sparse:
        logger.info("=== incremental mapping ===")
        pipeline = IncrementalPipeline(
            database, mapper_options or IncrementalPipelineOptions())
        rec = pipeline.run(seed=seed)
        if rec is not None:
            sparse_dir = os.path.join(options.workspace_path, "sparse", "0")
            os.makedirs(sparse_dir, exist_ok=True)
            from colmap_tpu.scene import reconstruction_io

            reconstruction_io.write_model(rec, sparse_dir, ext=".bin")
    if stage_timings is not None:
        stage_timings["extraction"] = round(t1 - t0, 1)
        stage_timings["matching"] = round(t2 - t1, 1)
        stage_timings["mapping"] = round(_time.perf_counter() - t2, 1)
        if pipeline is not None:
            stage_timings["mapping_stages"] = {
                k: round(v, 1) for k, v in sorted(
                    pipeline.stage_s.items(), key=lambda kv: -kv[1])}

    if options.dense and rec is not None:
        logger.info("=== dense reconstruction ===")
        # drop sparse-stage compiled programs + their device buffers before
        # the memory-heavy dense stage (long-lived workers otherwise
        # accumulate executables across the pipeline)
        import gc

        import jax as _jax

        _jax.clear_caches()
        gc.collect()
        from colmap_tpu.controllers import dense_reconstruction as dense
        from colmap_tpu.image import undistortion as und
        from colmap_tpu.mvs import fusion as fusion_mod
        from colmap_tpu.mvs import meshing as meshing_mod

        dense_dir = os.path.join(options.workspace_path, "dense")
        und.run_undistorter(rec, options.image_path, dense_dir)
        dense.run_patch_match_stereo(dense_dir)
        dense.run_stereo_fusion(dense_dir)
        dense.run_poisson_mesher(
            os.path.join(dense_dir, "fused.ply"),
            os.path.join(dense_dir, "meshed-poisson.ply"))
    return rec, database
