"""Scene clustering + hierarchical mapper tests.

Reference: src/colmap/scene/scene_clustering_test.cc and
controllers/hierarchical_mapper_test.cc — synthesize, cluster-map, merge,
and compare to GT.
"""

import numpy as np
import pytest

from colmap_tpu.controllers.hierarchical_pipeline import (
    HierarchicalPipeline,
    HierarchicalPipelineOptions,
)
from colmap_tpu.estimators import alignment as alignment_mod
from colmap_tpu.estimators.similarity_transform import compare_reconstructions
from colmap_tpu.scene import scene_clustering as sc
from colmap_tpu.scene import synthetic
from colmap_tpu.scene.database import Database


def test_cluster_two_communities():
    # two dense communities joined by one weak edge
    ids = list(range(1, 21))
    w = {}
    rng = np.random.default_rng(0)
    for grp in (ids[:10], ids[10:]):
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                if rng.uniform() < 0.7:
                    w[(grp[i], grp[j])] = rng.uniform(50, 100)
    w[(5, 15)] = 2.0
    tree = sc.cluster_scene(ids, w, sc.SceneClusteringOptions(
        leaf_max_num_images=12, image_overlap=0))
    leaves = tree.leaves()
    assert len(leaves) == 2
    sets = [set(l.image_ids) for l in leaves]
    assert {frozenset(s) for s in sets} == {frozenset(ids[:10]), frozenset(ids[10:])}


def test_cluster_overlap_images():
    ids = list(range(1, 21))
    w = {}
    rng = np.random.default_rng(1)
    for grp in (ids[:10], ids[10:]):
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                w[(grp[i], grp[j])] = rng.uniform(50, 100)
    w[(3, 13)] = 30.0
    w[(7, 17)] = 40.0
    tree = sc.cluster_scene(ids, w, sc.SceneClusteringOptions(
        leaf_max_num_images=12, image_overlap=2))
    for leaf in tree.leaves():
        assert len(leaf.image_ids) == 12  # 10 members + 2 overlap


@pytest.fixture(scope="module")
def synthetic_db():
    db = Database(":memory:")
    opts = synthetic.SyntheticDatasetOptions(
        num_cameras=1, num_images=12, num_points3D=220,
        point2D_stddev=0.4, seed=11)
    gt = synthetic.synthesize_dataset(opts, db)
    return db, gt


def test_hierarchical_pipeline_matches_gt(synthetic_db):
    db, gt = synthetic_db
    opts = HierarchicalPipelineOptions()
    opts.clustering.leaf_max_num_images = 7
    opts.clustering.image_overlap = 3
    rec = HierarchicalPipeline(db, opts).run(seed=0)
    assert rec is not None
    assert rec.num_registered_images() >= 10
    cmp = compare_reconstructions(rec, gt)
    assert cmp is not None
    assert cmp["max_rotation_error_deg"] < 1.0, cmp
    assert cmp["max_center_error"] < 0.05, cmp


def test_merge_reconstructions_sim3_invariance(synthetic_db):
    """Splitting a GT model, perturbing one half by a Sim3, and merging must
    recover the whole model."""
    import copy

    _, gt = synthetic_db
    ids = sorted(gt.registered_image_ids())
    half = len(ids) // 2 + 2
    rec1 = copy.deepcopy(gt)
    rec2 = copy.deepcopy(gt)
    for iid in ids[half:]:
        rec1.images[iid].cam_from_world = None
        rec1.images[iid].point3D_ids[:] = -1
    for iid in ids[: half - 4]:
        rec2.images[iid].cam_from_world = None
        rec2.images[iid].point3D_ids[:] = -1
    for rec in (rec1, rec2):
        dead = [pid for pid, pt in rec.points3D.items()
                if sum(1 for (i, _) in pt.track
                       if rec.images[i].registered) < 2]
        for pid in dead:
            rec.delete_point3D(pid)
        for pid, pt in rec.points3D.items():
            pt.track = [(i, k) for (i, k) in pt.track if rec.images[i].registered]

    # perturb rec2 by an arbitrary Sim3
    t = np.array([2.0, 0.3, -0.4, 0.5, 0.7071, 1.0, -2.0, 3.0])
    t[1:5] /= np.linalg.norm(t[1:5])
    rec2.transform(t)

    ok = alignment_mod.merge_reconstructions(rec1, rec2)
    assert ok
    assert rec1.num_registered_images() == len(ids)
    cmp = compare_reconstructions(rec1, gt)
    assert cmp["max_rotation_error_deg"] < 0.1
    assert cmp["max_center_error"] < 1e-3


def test_pose_graph_distributes_loop_closure():
    """A 6-node Sim3 ring with consistent edges + noise: joint refinement
    must beat chained (BFS) composition on the loop-closing edge."""
    import jax.numpy as jnp

    from colmap_tpu.estimators import pose_graph as pg
    from colmap_tpu.geometry import sim3 as s3
    from colmap_tpu.geometry import rotation as rot

    rng = np.random.default_rng(0)
    n = 6
    gt = [np.array([1, 1, 0, 0, 0, 0, 0, 0], np.float32)]
    for k in range(1, n):
        q = np.asarray(rot.quat_from_axis_angle(
            jnp.asarray(rng.normal(0, 0.3, 3).astype(np.float32))))
        gt.append(np.concatenate([[np.exp(rng.normal(0, 0.1))], q,
                                  rng.normal(0, 1.0, 3)]).astype(np.float32))
    gt = np.stack(gt)

    def noisy_rel(i, j, sigma=0.01):
        m = np.asarray(s3.compose(s3.inverse(jnp.asarray(gt[j])),
                                  jnp.asarray(gt[i])))
        d = rng.normal(0, sigma, 3).astype(np.float32)
        qn = np.asarray(rot.quat_from_axis_angle(jnp.asarray(d)))
        return np.asarray(s3.compose(jnp.asarray(m), s3.make(
            jnp.exp(jnp.asarray(rng.normal(0, sigma), jnp.float32)),
            jnp.asarray(qn), jnp.asarray(rng.normal(0, sigma, 3),
                                         jnp.float32))))

    edges = np.array([(k, (k + 1) % n) for k in range(n)])
    meas = np.stack([noisy_rel(i, j) for i, j in edges])

    # chained initialization (what greedy merging would do)
    init = [gt[0]] + [None] * (n - 1)
    for k in range(1, n):
        m = meas[k - 1]  # edge (k-1, k): k_from_(k-1)
        init[k] = np.asarray(s3.compose(jnp.asarray(init[k - 1]),
                                        s3.inverse(jnp.asarray(m))))
    init = np.stack(init)

    refined = pg.optimize_sim3_pose_graph(init, edges, meas)

    def consistency(S):
        errs = []
        for (i, j), m in zip(edges, meas):
            pred = np.asarray(s3.compose(s3.inverse(jnp.asarray(S[j],
                                                                jnp.float32)),
                                         jnp.asarray(S[i], jnp.float32)))
            e = np.asarray(s3.compose(s3.inverse(jnp.asarray(m)),
                                      jnp.asarray(pred)))
            errs.append(np.linalg.norm(e[5:8]) + abs(np.log(max(e[0], 1e-9))))
        return np.array(errs)

    before = consistency(init)
    after = consistency(refined)
    # the chained init has all the loop error on the closing edge; the
    # refined graph distributes it
    assert after.max() < before.max()
    assert after.mean() < 0.05


def test_hierarchical_parallel_clusters(synthetic_db):
    """Clusters reconstruct concurrently (thread pool) and fuse via the
    pose graph; accuracy matches the sequential result."""
    db, gt = synthetic_db
    opts = HierarchicalPipelineOptions()
    opts.clustering.leaf_max_num_images = 5
    opts.clustering.image_overlap = 2
    opts.num_workers = 3
    rec = HierarchicalPipeline(db, opts).run(seed=1)
    assert rec is not None
    assert rec.num_registered_images() >= 10
    cmp = compare_reconstructions(rec, gt)
    assert cmp is not None
    assert cmp["max_rotation_error_deg"] < 1.0, cmp
    assert cmp["max_center_error"] < 0.05, cmp
