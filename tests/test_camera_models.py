import numpy as np
import jax.numpy as jnp
import pytest

from colmap_tpu.sensor import models as cm


ALL_MODELS = list(cm.CameraModelId)

# Realistic distortion params per model for round-trip tests.
TEST_PARAMS = {
    cm.CameraModelId.SIMPLE_PINHOLE: [800.0, 320.0, 240.0],
    cm.CameraModelId.PINHOLE: [800.0, 790.0, 320.0, 240.0],
    cm.CameraModelId.SIMPLE_RADIAL: [800.0, 320.0, 240.0, -0.05],
    cm.CameraModelId.RADIAL: [800.0, 320.0, 240.0, -0.05, 0.01],
    cm.CameraModelId.OPENCV: [800.0, 790.0, 320.0, 240.0, -0.05, 0.01, 0.001, -0.001],
    cm.CameraModelId.OPENCV_FISHEYE: [400.0, 395.0, 320.0, 240.0, -0.02, 0.01, -0.002, 0.001],
    cm.CameraModelId.FULL_OPENCV: [800.0, 790.0, 320.0, 240.0, -0.05, 0.01, 0.001, -0.001, 0.002, -0.001, 0.0005, -0.0002],
    cm.CameraModelId.FOV: [800.0, 790.0, 320.0, 240.0, 0.9],
    cm.CameraModelId.SIMPLE_RADIAL_FISHEYE: [400.0, 320.0, 240.0, -0.02],
    cm.CameraModelId.RADIAL_FISHEYE: [400.0, 320.0, 240.0, -0.02, 0.005],
    cm.CameraModelId.THIN_PRISM_FISHEYE: [400.0, 395.0, 320.0, 240.0, -0.02, 0.01, 0.001, -0.001, -0.002, 0.001, 0.0005, -0.0005],
    cm.CameraModelId.RAD_TAN_THIN_PRISM_FISHEYE: [400.0, 395.0, 320.0, 240.0, -0.02, 0.01, -0.002, 0.001, 0.001, -0.001, 0.0005, -0.0005],
}


@pytest.mark.parametrize("model_id", ALL_MODELS)
def test_img_cam_roundtrip(model_id, rng):
    params = jnp.array(cm.pad_params(TEST_PARAMS[model_id]))
    # moderate field of view normalized coords
    uv = jnp.array(rng.uniform(-0.3, 0.3, size=(200, 2)).astype(np.float32))
    xy = cm.img_from_cam(int(model_id), params, uv)
    uv2 = cm.cam_from_img(int(model_id), params, xy)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=5e-5)


@pytest.mark.parametrize("model_id", ALL_MODELS)
def test_principal_point_maps_to_center_ray(model_id):
    params = jnp.array(cm.pad_params(TEST_PARAMS[model_id]))
    fx, fy, cx, cy = cm.focal_pp(int(model_id), params)
    uv = cm.cam_from_img(int(model_id), params, jnp.array([[float(cx), float(cy)]]))
    np.testing.assert_allclose(np.asarray(uv), 0.0, atol=1e-6)


def test_project_pinhole():
    params = jnp.array(cm.pad_params([100.0, 100.0, 50.0, 50.0]))
    pts = jnp.array([[0.0, 0.0, 1.0], [0.1, -0.2, 2.0]], dtype=jnp.float32)
    xy = np.asarray(cm.project(int(cm.CameraModelId.PINHOLE), params, pts))
    np.testing.assert_allclose(xy[0], [50.0, 50.0], atol=1e-5)
    np.testing.assert_allclose(xy[1], [55.0, 40.0], atol=1e-4)


def test_batched_over_cameras(rng):
    # params broadcast over a camera batch axis
    p1 = cm.pad_params(TEST_PARAMS[cm.CameraModelId.SIMPLE_RADIAL])
    p2 = cm.pad_params([600.0, 300.0, 200.0, 0.03])
    params = jnp.array(np.stack([p1, p2]))[:, None, :]  # (2, 1, 12)
    uv = jnp.array(rng.uniform(-0.2, 0.2, size=(2, 50, 2)).astype(np.float32))
    xy = cm.img_from_cam(int(cm.CameraModelId.SIMPLE_RADIAL), params, uv)
    assert xy.shape == (2, 50, 2)
    uv2 = cm.cam_from_img(int(cm.CameraModelId.SIMPLE_RADIAL), params, xy)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-5)


def test_default_params():
    p = cm.default_params(int(cm.CameraModelId.SIMPLE_RADIAL), 1228.8, 1024, 768)
    assert p[0] == pytest.approx(1228.8)
    assert p[1] == pytest.approx(512.0)
    assert p[2] == pytest.approx(384.0)
    assert p[3] == 0.0
