"""Multi-model mapping, snapshots, resume, ReconstructionManager,
VisibilityPyramid tests.

Reference: controllers/incremental_mapper.cc multi-model loop + snapshots;
scene/reconstruction_manager.h; scene/visibility_pyramid.h.
"""

import os

import numpy as np
import pytest

from colmap_tpu.controllers.incremental_pipeline import (
    IncrementalPipeline,
    IncrementalPipelineOptions,
)
from colmap_tpu.scene import synthetic
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.reconstruction_manager import ReconstructionManager
from colmap_tpu.scene.visibility_pyramid import VisibilityPyramid


def _two_component_db():
    """Two disconnected sub-scenes merged into one database."""
    from colmap_tpu.tools.database_tools import merge_databases

    db1 = Database(":memory:")
    gt1 = synthetic.synthesize_dataset(
        synthetic.SyntheticDatasetOptions(num_cameras=1, num_images=6,
                                          num_points3D=120, seed=1), db1)
    db2 = Database(":memory:")
    gt2 = synthetic.synthesize_dataset(
        synthetic.SyntheticDatasetOptions(num_cameras=1, num_images=5,
                                          num_points3D=110, seed=2), db2)
    db = Database(":memory:")
    merge_databases(db1, db2, db)
    return db, gt1, gt2


def test_multi_model_reconstruction():
    db, gt1, gt2 = _two_component_db()
    # the two synthetic scenes share no matches -> two sub-models
    pipeline = IncrementalPipeline(db, IncrementalPipelineOptions())
    manager = pipeline.run_multi(seed=0)
    assert len(manager) == 2
    sizes = sorted(m.num_registered_images() for m in manager)
    assert sizes == [5, 6]


def test_reconstruction_manager_io(tmp_path):
    db, gt1, gt2 = _two_component_db()
    manager = IncrementalPipeline(db).run_multi(seed=0)
    out = str(tmp_path / "sparse")
    manager.write(out)
    assert os.path.isdir(os.path.join(out, "0"))
    assert os.path.isdir(os.path.join(out, "1"))
    back = ReconstructionManager.read(out)
    assert len(back) == 2
    assert {m.num_registered_images() for m in back} == \
        {m.num_registered_images() for m in manager}


def test_snapshots(tmp_path):
    db = Database(":memory:")
    synthetic.synthesize_dataset(
        synthetic.SyntheticDatasetOptions(num_cameras=1, num_images=8,
                                          num_points3D=150, seed=3), db)
    opts = IncrementalPipelineOptions(
        snapshot_path=str(tmp_path / "snaps"), snapshot_images_freq=2)
    rec = IncrementalPipeline(db, opts).run(seed=0)
    assert rec is not None
    snaps = sorted(os.listdir(str(tmp_path / "snaps")))
    assert len(snaps) >= 2
    for s in snaps:
        assert os.path.exists(str(tmp_path / "snaps" / s / "images.bin"))


def test_resume_from_partial_model():
    import copy

    db = Database(":memory:")
    gt = synthetic.synthesize_dataset(
        synthetic.SyntheticDatasetOptions(num_cameras=1, num_images=9,
                                          num_points3D=160, seed=5), db)
    # partial model: GT poses of only 4 images + their points
    partial = copy.deepcopy(gt)
    keep = sorted(partial.registered_image_ids())[:4]
    for iid in partial.registered_image_ids():
        if iid not in keep:
            partial.images[iid].cam_from_world = None
            partial.images[iid].point3D_ids[:] = -1
    for pid in list(partial.points3D):
        pt = partial.points3D[pid]
        pt.track = [(i, k) for (i, k) in pt.track if i in keep]
        if len(pt.track) < 2:
            partial.delete_point3D(pid)

    rec = IncrementalPipeline(db).run(seed=0, input_model=partial)
    assert rec is not None
    assert rec.num_registered_images() == 9
    from colmap_tpu.estimators.similarity_transform import compare_reconstructions

    cmp = compare_reconstructions(rec, gt)
    assert cmp["max_rotation_error_deg"] < 1.0


def test_visibility_pyramid():
    p = VisibilityPyramid(num_levels=4, width=100, height=100)
    assert p.score == 0
    p.add_point(10, 10)
    s1 = p.score
    assert s1 > 0
    # a point in the same fine cell adds nothing
    p.add_point(10.5, 10.5)
    assert p.score == s1
    # a far point doubles the score
    p.add_point(90, 90)
    assert p.score == 2 * s1
    p.remove_point(90, 90)
    assert p.score == s1
    p.remove_point(10, 10)
    p.remove_point(10.5, 10.5)
    assert p.score == 0
