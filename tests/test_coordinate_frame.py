"""Line detection + gravity/Manhattan coordinate-frame tests.

Reference: estimators/coordinate_frame_test.cc, image/line.cc wrapper.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from colmap_tpu.estimators import coordinate_frame as cf
from colmap_tpu.geometry import rotation as rot
from colmap_tpu.image.line import detect_line_segments
from colmap_tpu.scene import synthetic_images as synth
from colmap_tpu.scene.reconstruction import Camera, Image, Reconstruction


def test_detect_line_segments_grid():
    pytest.importorskip("cv2")
    img = np.full((200, 200), 200, np.uint8)
    img[60:63, :] = 10
    img[:, 100:103] = 10
    segs = detect_line_segments(img, min_length=50)
    assert len(segs) >= 2
    dirs = np.abs(np.stack([s.direction for s in segs]))
    # all segments are axis-aligned
    assert np.all((dirs[:, 0] > 0.99) | (dirs[:, 1] > 0.99))


@pytest.fixture(scope="module")
def grid_room(tmp_path_factory):
    opts = synth.RoomDatasetOptions(num_images=5, width=320, height=240,
                                    focal=280.0, texture_type="grid", seed=8)
    images, K, Rs, ts = synth.render_room_dataset(opts)
    d = str(tmp_path_factory.mktemp("grid_room"))
    names = synth.write_dataset(d, images)
    rec = Reconstruction()
    rec.add_camera(Camera(camera_id=1, model_id=1, width=opts.width,
                          height=opts.height,
                          params=np.array([K[0, 0], K[1, 1],
                                           K[0, 2], K[1, 2]])))
    for i, name in enumerate(names):
        q = np.asarray(rot.rotmat_to_quat(jnp.asarray(Rs[i], np.float32)))
        img = Image(image_id=i + 1, name=name, camera_id=1)
        img.cam_from_world = np.concatenate([q, ts[i]]).astype(np.float64)
        rec.add_image(img)
    return rec, d


def test_gravity_estimation(grid_room):
    rec, d = grid_room
    g = cf.estimate_gravity_vector_from_image_orientation(rec)
    # cameras look mostly level; gravity ~ +y (world down)
    assert abs(g[1]) > 0.95


def test_manhattan_world_frame(grid_room):
    pytest.importorskip("cv2")
    rec, d = grid_room
    R = cf.estimate_manhattan_world_frame(rec, d)
    assert R is not None
    # rows must be near the world axes (any order/sign for horizontals)
    # y row = down = world +y
    assert abs(R[1, 1]) > 0.98, R
    for row in (R[0], R[2]):
        assert max(abs(row[0]), abs(row[2])) > 0.98, R
    # orthonormal
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
