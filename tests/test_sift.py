"""Tests for TPU-native SIFT extraction.

Mirrors the reference test strategy (src/colmap/feature/sift_test.cc):
synthetic-image invariants + repeatability under known warps + (when
OpenCV is available) cross-implementation keypoint parity, the analog of
MatchSiftFeaturesCPUvsGPU (sift_test.cc:613).
"""

import dataclasses

import numpy as np
import pytest

import jax

from colmap_tpu.features import matching as matching_mod
from colmap_tpu.features import sift


OPTS = sift.SiftExtractionOptions(octave_capacity=768, max_num_features=1536)


def _textured_image(rng, h=256, w=320):
    base = rng.normal(0, 1, (h // 8, w // 8)).astype(np.float32)
    img = np.array(jax.image.resize(base, (h, w), "bicubic"))
    img = img + 0.3 * np.array(jax.image.resize(
        rng.normal(0, 1, (h // 2, w // 2)).astype(np.float32), (h, w), "bicubic"))
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255).astype(np.uint8)


@pytest.fixture(scope="module")
def textured():
    return _textured_image(np.random.default_rng(7))


def test_window_sampling_matches_gather(textured):
    """The MXU window-sampling path must reproduce the gather path:
    identical keypoints (detection is shared) and near-identical
    descriptors (bilinear taps via separable hat-weight matmuls are the
    same arithmetic up to float association; nearest taps differ only on
    exact .5 rounding ties)."""
    win = sift.extract(textured, dataclasses.replace(OPTS, sampling="window"))
    gat = sift.extract(textured, dataclasses.replace(OPTS, sampling="gather"))
    assert len(win["xy"]) == len(gat["xy"]) > 100
    assert np.allclose(win["xy"], gat["xy"], atol=1e-4)
    dw = win["descriptors"].astype(np.int32)
    dg = gat["descriptors"].astype(np.int32)
    # uint8-quantized descriptors: allow tiny quantization flips
    frac_close = (np.abs(dw - dg) <= 1).mean()
    assert frac_close > 0.999, f"only {frac_close:.4f} of entries within 1"


def test_blob_localization():
    h, w = 192, 256
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    centers = [(60, 80, 6.0), (120, 200, 10.0), (150, 60, 4.0)]
    for cy, cx, s in centers:
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    out = sift.extract(img, OPTS)
    assert len(out["xy"]) >= len(centers)
    for cy, cx, s in centers:
        d = np.hypot(out["xy"][:, 0] - cx, out["xy"][:, 1] - cy)
        i = int(np.argmin(d))
        assert d[i] < 0.5, f"blob at {(cx, cy)} localized {d[i]:.2f}px away"
        # DoG-detected scale tracks the blob sigma (ratio ~0.89)
        assert 0.6 * s < out["scale"][i] < 1.2 * s


def test_translation_repeatability(textured):
    img = textured
    shift = 8
    img2 = np.roll(img, (shift, shift), axis=(0, 1))
    f1 = sift.extract(img, OPTS)
    f2 = sift.extract(img2, OPTS)
    # match descriptors, check offsets
    b1 = matching_mod.prepare_descriptors(f1["descriptors"])
    b2 = matching_mod.prepare_descriptors(f2["descriptors"])
    idx = np.asarray(matching_mod.match_descriptors(b1, b2))
    m = matching_mod.matches_to_pairs(idx)
    assert len(m) > 100
    d = f2["xy"][m[:, 1]] - f1["xy"][m[:, 0]]
    err = np.hypot(d[:, 0] - shift, d[:, 1] - shift)
    assert (err < 1.0).mean() > 0.8


def test_rotation_scale_repeatability(textured):
    cv2 = pytest.importorskip("cv2")
    img = textured
    h, w = img.shape
    M = cv2.getRotationMatrix2D((w / 2, h / 2), 25, 0.85)
    img2 = cv2.warpAffine(img, M, (w, h))
    f1 = sift.extract(img, OPTS)
    f2 = sift.extract(img2, OPTS)
    b1 = matching_mod.prepare_descriptors(f1["descriptors"])
    b2 = matching_mod.prepare_descriptors(f2["descriptors"])
    m = matching_mod.matches_to_pairs(
        np.asarray(matching_mod.match_descriptors(b1, b2)))
    assert len(m) > 80
    gt = np.c_[f1["xy"][m[:, 0]], np.ones(len(m))] @ M.T
    err = np.hypot(*(f2["xy"][m[:, 1]] - gt).T)
    assert (err < 2.0).mean() > 0.75


def test_cv2_keypoint_parity(textured):
    """Location parity vs OpenCV SIFT (analog of sift_test.cc:613)."""
    cv2 = pytest.importorskip("cv2")
    from scipy.spatial import cKDTree

    f1 = sift.extract(textured, OPTS)
    det = cv2.SIFT_create(contrastThreshold=0.02, edgeThreshold=10)
    kps = det.detect(textured, None)
    cvxy = np.array([k.pt for k in kps])
    d, _ = cKDTree(f1["xy"]).query(cvxy)
    assert (d < 1.5).mean() > 0.6


def test_descriptor_normalization(textured):
    f = sift.extract(textured, OPTS)
    d = f["descriptors"].astype(np.float32) / 512.0
    # L1_ROOT: sum of squares == L1 of the pre-sqrt vector == 1
    norms = np.sum(d * d, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=0.05)
    assert f["descriptors"].dtype == np.uint8


def test_affine_roundtrip():
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 100, (32, 2)).astype(np.float32)
    scale = rng.uniform(1, 8, 32).astype(np.float32)
    ori = rng.uniform(-np.pi, np.pi, 32).astype(np.float32)
    kp6 = sift.keypoints_to_affine(xy, scale, ori)
    xy2, s2, o2 = sift.affine_to_keypoints(kp6)
    np.testing.assert_allclose(xy2, xy, atol=1e-5)
    np.testing.assert_allclose(s2, scale, rtol=1e-5)
    np.testing.assert_allclose(o2, ori, atol=1e-5)


def test_max_num_features_cap(textured):
    opts = sift.SiftExtractionOptions(octave_capacity=768, max_num_features=64)
    f = sift.extract(textured, opts)
    assert len(f["xy"]) <= 64
    # capped selection keeps the largest scales (reference:
    # ExtractTopScaleFeatures)
    full = sift.extract(textured, OPTS)
    assert np.median(f["scale"]) >= np.median(full["scale"]) - 1e-6
