"""IncrementalTriangulator semantics: track merge, complete, and the
multi-view-support track creation.

Reference: src/colmap/sfm/incremental_triangulator.h:105-129
(MergeTracks/CompleteTracks) and estimators/triangulation.h:123-155
(RANSAC multi-view triangulation); integration bounds mirror
controllers/incremental_mapper_test.cc.
"""

import numpy as np

from colmap_tpu.controllers.incremental_pipeline import (
    IncrementalPipeline,
    IncrementalPipelineOptions,
)
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.database_cache import DatabaseCache
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset
from colmap_tpu.sfm.incremental_mapper import IncrementalMapper


def make_mapper(opts=None):
    db = Database(":memory:")
    gt = synthesize_dataset(
        opts or SyntheticDatasetOptions(num_images=6, num_points3D=80,
                                        num_cameras=1, seed=3), db)
    cache = DatabaseCache.create(db)
    mapper = IncrementalMapper(cache)
    # adopt GT poses without points
    stripped = gt
    pts = dict(stripped.points3D)
    stripped.points3D = {}
    mapper.seed_from_model(stripped)
    stripped.points3D = pts
    return gt, mapper


def test_complete_tracks_extends_along_edges():
    gt, mapper = make_mapper()
    # create one point with a minimal 2-view track from a GT track
    gt_pt = next(iter(gt.points3D.values()))
    track = sorted(gt_pt.track)
    assert len(track) >= 4
    pid = mapper.add_point(gt_pt.xyz, track[:2])
    assert mapper._track_len[pid] == 2
    n = mapper.complete_tracks([pid])
    assert n >= len(track) - 2
    assert mapper._track_len[pid] >= len(track)


def test_merge_tracks_joins_split_tracks():
    gt, mapper = make_mapper()
    gt_pt = next(iter(gt.points3D.values()))
    track = sorted(gt_pt.track)
    assert len(track) >= 4
    h = len(track) // 2
    # two halves of the same physical track, slightly perturbed
    p1 = mapper.add_point(gt_pt.xyz + 1e-4, track[:h])
    p2 = mapper.add_point(gt_pt.xyz - 1e-4, track[h:])
    merged = mapper.merge_tracks([p1, p2])
    assert merged == 1
    assert mapper._track_len[p1] == 0 and mapper._track_len[p2] == 0
    new_pid = mapper._num_pts - 1
    assert mapper._track_len[new_pid] == len(track)
    np.testing.assert_allclose(mapper._xyz[new_pid], gt_pt.xyz, atol=1e-3)


def test_merge_rejects_distinct_points():
    gt, mapper = make_mapper()
    pts = list(gt.points3D.values())
    a, b = pts[0], pts[1]
    assert np.linalg.norm(a.xyz - b.xyz) > 0.05
    p1 = mapper.add_point(a.xyz, sorted(a.track)[:3])
    p2 = mapper.add_point(b.xyz, sorted(b.track)[:3])
    # no correspondence edge links different GT points, and even a forced
    # candidate fails the merged-reprojection test; nothing merges
    merged = mapper.merge_tracks([p1, p2])
    assert merged == 0
    assert mapper._track_len[p1] == 3 and mapper._track_len[p2] == 3


def test_pipeline_track_lengths_with_noise_and_outliers():
    """Mean track length must stay near full visibility even with noisy
    matches + outliers (reference: the triangulator's merge/complete keep
    observation counts up; incremental_mapper_test.cc WithNoise*)."""
    db = Database(":memory:")
    opts = SyntheticDatasetOptions(num_images=8, num_points3D=150,
                                   num_cameras=1, point2D_stddev=0.5,
                                   inlier_match_ratio=0.8, seed=7)
    gt = synthesize_dataset(opts, db)
    rec = IncrementalPipeline(db).run()
    assert rec is not None
    assert rec.num_registered_images() == 8
    gt_mean = np.mean([len(p.track) for p in gt.points3D.values()])
    mean_len = rec.compute_mean_track_length()
    assert mean_len > 0.9 * gt_mean, (mean_len, gt_mean)
    # observations per image within 10% of GT
    obs = rec.compute_mean_observations_per_reg_image()
    gt_obs = gt.compute_mean_observations_per_reg_image()
    assert obs > 0.85 * gt_obs, (obs, gt_obs)


def test_filter_images_bogus_intrinsics_and_empty():
    """ObservationManager::FilterImages parity: images lose registration
    when their camera's refined focal drifts out of ratio bounds or all
    their points vanish (reference observation_manager.h:144-160)."""
    gt, mapper = make_mapper(SyntheticDatasetOptions(
        num_images=6, num_points3D=60, num_cameras=3, seed=5))
    # seed tracks so every image has points
    for pt in gt.points3D.values():
        mapper.add_point(pt.xyz, sorted(pt.track))
    assert mapper.filter_images() == []

    # make one camera's focal bogus (20x the prior)
    victim_iid = mapper.registered[-1]
    cid = mapper.cache.images[victim_iid].camera_id
    mapper.rec.cameras[cid].params = np.array(
        mapper.rec.cameras[cid].params, np.float64)
    mapper.rec.cameras[cid].params[0] *= 20.0
    dropped = mapper.filter_images()
    assert victim_iid in dropped
    assert victim_iid not in mapper.registered
    assert not mapper.rec.images[victim_iid].registered
    # its observations are gone
    r = mapper._row_of[victim_iid]
    alive = mapper._obs_pid[: mapper._num_obs] >= 0
    assert not (mapper._obs_img_row[: mapper._num_obs][alive] == r).any()
