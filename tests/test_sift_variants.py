"""DSP-SIFT + guided matching tests."""

import numpy as np
import pytest

import jax

from colmap_tpu.features import matching as matching_mod
from colmap_tpu.features import sift


def _textured(rng, h=192, w=256):
    base = rng.normal(0, 1, (h // 8, w // 8)).astype(np.float32)
    img = np.array(jax.image.resize(base, (h, w), "bicubic"))
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255).astype(np.uint8)


def test_dsp_sift_improves_scale_robustness():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    img = _textured(rng)
    h, w = img.shape
    M = cv2.getRotationMatrix2D((w / 2, h / 2), 0, 0.7)  # strong scale change
    img2 = cv2.warpAffine(img, M, (w, h))

    def count_correct(opts):
        f1 = sift.extract(img, opts)
        f2 = sift.extract(img2, opts)
        b1 = matching_mod.prepare_descriptors(f1["descriptors"])
        b2 = matching_mod.prepare_descriptors(f2["descriptors"])
        m = matching_mod.matches_to_pairs(
            np.asarray(matching_mod.match_descriptors(b1, b2)))
        if len(m) == 0:
            return 0
        gt = np.c_[f1["xy"][m[:, 0]], np.ones(len(m))] @ M.T
        err = np.hypot(*(f2["xy"][m[:, 1]] - gt).T)
        return int((err < 2.0).sum())

    base_opts = sift.SiftExtractionOptions(octave_capacity=512,
                                           max_num_features=1024)
    import dataclasses

    dsp_opts = dataclasses.replace(base_opts, domain_size_pooling=True,
                                   dsp_num_scales=5)
    n_base = count_correct(base_opts)
    n_dsp = count_correct(dsp_opts)
    assert n_dsp > 30
    # DSP must not be (much) worse; typically it matches or improves
    assert n_dsp >= 0.8 * n_base


def test_guided_matching_recovers_more_inliers(rng):
    """Guided matching with GT F must recover matches the ratio test lost."""
    n = 256
    d1 = rng.integers(0, 200, (n, 128)).astype(np.uint8)
    # two similar rows confuse the ratio test
    d1[1] = d1[0] + rng.integers(-2, 3, 128)
    d2 = np.clip(d1.astype(int) + rng.integers(-3, 4, (n, 128)),
                 0, 255).astype(np.uint8)
    xy1 = rng.uniform(0, 400, (n, 2)).astype(np.float32)
    # pure horizontal-shift geometry: y2 = y1 -> F = [e]_x for e=(1,0,0)
    xy2 = xy1 + np.array([10.0, 0.0], np.float32)
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)

    import jax.numpy as jnp

    b1 = matching_mod.prepare_descriptors(d1)
    b2 = matching_mod.prepare_descriptors(d2)
    plain = matching_mod.matches_to_pairs(
        np.asarray(matching_mod.match_descriptors(b1, b2)))
    guided = matching_mod.matches_to_pairs(np.asarray(
        matching_mod.guided_match_descriptors(
            b1, b2, jnp.asarray(xy1), jnp.asarray(xy2), jnp.asarray(F),
            max_epipolar_error=2.0)))
    assert len(guided) >= len(plain)
    # guided matches satisfy the epipolar constraint
    if len(guided):
        ok = np.abs(xy1[guided[:, 0], 1] - xy2[guided[:, 1], 1]) < 2.5
        assert ok.mean() > 0.95


def test_affine_shape_improves_shear_robustness():
    """Covariant (affine-adapted) SIFT under a strong shear warp."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(4)
    img = _textured(rng)
    h, w = img.shape
    # shear + anisotropic scale
    M = np.array([[0.95, 0.35, 10.0], [0.05, 0.75, 8.0]], np.float32)
    img2 = cv2.warpAffine(img, M, (w, h))

    import dataclasses

    base_opts = sift.SiftExtractionOptions(octave_capacity=512,
                                           max_num_features=1024)
    aff_opts = dataclasses.replace(base_opts, estimate_affine_shape=True)

    def count_correct(opts):
        f1 = sift.extract(img, opts)
        f2 = sift.extract(img2, opts)
        if len(f1["xy"]) == 0 or len(f2["xy"]) == 0:
            return 0
        b1 = matching_mod.prepare_descriptors(f1["descriptors"])
        b2 = matching_mod.prepare_descriptors(f2["descriptors"])
        m = matching_mod.matches_to_pairs(
            np.asarray(matching_mod.match_descriptors(b1, b2)))
        if len(m) == 0:
            return 0
        gt = np.c_[f1["xy"][m[:, 0]], np.ones(len(m))] @ M.T
        err = np.hypot(*(f2["xy"][m[:, 1]] - gt).T)
        return int((err < 3.0).sum())

    n_base = count_correct(base_opts)
    n_aff = count_correct(aff_opts)
    # the affine-adapted variant must find a solid number of correct
    # matches under shear, and not be much worse than plain SIFT
    assert n_aff > 25, (n_aff, n_base)
    assert n_aff >= 0.7 * n_base, (n_aff, n_base)
