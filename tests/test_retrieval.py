"""Retrieval tests (reference: src/colmap/retrieval/*_test.cc)."""

import numpy as np
import pytest

import jax

from colmap_tpu.retrieval import kmeans as km
from colmap_tpu.retrieval import visual_index as vi_mod
from colmap_tpu.retrieval import vote_and_verify as vv


def test_kmeans_separates_clusters(rng):
    centers_gt = np.array([[0.0] * 8, [10.0] * 8, [-10.0, 10.0] * 4])
    pts = np.concatenate([
        c + rng.normal(0, 0.3, (50, 8)) for c in centers_gt
    ]).astype(np.float32)
    import jax.numpy as jnp

    centers, assign = km.kmeans(jax.random.PRNGKey(0), jnp.asarray(pts),
                                jnp.ones(len(pts), bool), 3, 25)
    centers = np.asarray(centers)
    assign = np.asarray(assign)
    # every GT center has a learned center nearby
    for c in centers_gt:
        d = np.linalg.norm(centers - c, axis=1).min()
        assert d < 0.5
    # points of the same GT cluster share a label
    for i in range(3):
        labels = assign[i * 50:(i + 1) * 50]
        assert (labels == labels[0]).mean() > 0.95


def _fake_image_descriptors(rng, num_images=8, n=100, dim=128):
    """Images with distinctive descriptor clusters + shared noise."""
    protos = rng.uniform(0, 255, (num_images, 6, dim))
    out = {}
    for i in range(num_images):
        own = protos[i][rng.integers(0, 6, n - 20)] + rng.normal(0, 4, (n - 20, dim))
        noise = rng.uniform(0, 255, (20, dim))
        out[i + 1] = np.clip(np.concatenate([own, noise]), 0, 255).astype(np.uint8)
    return out


def test_visual_index_retrieval(rng):
    descs = _fake_image_descriptors(rng)
    vi = vi_mod.VisualIndex(vi_mod.VisualIndexOptions(branching=8, depth=2))
    vi.build(np.concatenate(list(descs.values())), seed=0)
    for iid, d in descs.items():
        vi.add_image(iid, d)
    # querying an image's own (noisy) descriptors must rank itself first
    for iid in [1, 4, 8]:
        noisy = np.clip(descs[iid].astype(np.float32)
                        + rng.normal(0, 2, descs[iid].shape), 0, 255
                        ).astype(np.uint8)
        res = vi.query(noisy, num_neighbors=3)
        assert res[0][0] == iid, f"image {iid}: got {res}"


def test_visual_index_save_load(tmp_path, rng):
    descs = _fake_image_descriptors(rng, num_images=4)
    vi = vi_mod.VisualIndex(vi_mod.VisualIndexOptions(branching=4, depth=2))
    vi.build(np.concatenate(list(descs.values())), seed=0)
    p = str(tmp_path / "vocab.npz")
    vi.save(p)
    vi2 = vi_mod.VisualIndex.load(p)
    d = descs[1]
    w1 = km.quantize(vi.levels, vi._prep(d))
    w2 = km.quantize(vi2.levels, vi2._prep(d))
    np.testing.assert_array_equal(w1, w2)


def test_vote_and_verify(rng):
    n = 60
    xy1 = rng.uniform(0, 500, (n, 2))
    ang = 0.4
    s = 1.3
    R = s * np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    xy2 = xy1 @ R.T + np.array([40.0, -25.0])
    scale1 = rng.uniform(2, 4, n)
    ori1 = rng.uniform(-np.pi, np.pi, n)
    scale2 = scale1 * s
    ori2 = ori1 + ang
    # corrupt 1/3 of the matches
    bad = rng.choice(n, n // 3, replace=False)
    xy2c = xy2.copy()
    xy2c[bad] = rng.uniform(0, 500, (len(bad), 2))
    score, inl = vv.vote_and_verify(xy1, scale1, ori1, xy2c, scale2, ori2)
    assert inl >= int(0.9 * (n - len(bad)))

    # random garbage scores much lower
    score_bad, inl_bad = vv.vote_and_verify(
        xy1, scale1, ori1, rng.uniform(0, 500, (n, 2)),
        rng.uniform(2, 4, n), rng.uniform(-np.pi, np.pi, n))
    assert inl_bad < inl / 3


def test_vocab_tree_pair_generation(rng):
    from colmap_tpu.scene.database import Database

    descs = _fake_image_descriptors(rng, num_images=6)
    db = Database(":memory:")
    cam = db.write_camera(0, 100, 100, np.array([100.0, 50, 50]))
    for iid, d in descs.items():
        got = db.write_image(f"im{iid}.png", cam)
        db.write_keypoints(got, rng.uniform(0, 100, (len(d), 2)).astype(np.float32))
        db.write_descriptors(got, d)
    vi = vi_mod.build_vocab_tree_from_database(
        db, vi_mod.VisualIndexOptions(branching=8, depth=2))
    pairs = vi_mod.vocab_tree_pairs(db, vi, num_neighbors=2)
    assert len(pairs) >= 3
    for a, b in pairs:
        assert a != b
