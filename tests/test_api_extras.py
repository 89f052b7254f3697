"""pycolmap estimator bindings, EXIF GPS priors, MVS workspace cache."""

import os

import numpy as np
import pytest

from colmap_tpu.scene.reconstruction import Camera


def _camera():
    return Camera(camera_id=1, model_id=1, width=640, height=480,
                  params=np.array([500.0, 500.0, 320.0, 240.0]))


def test_absolute_pose_estimation_binding(rng):
    from scipy.spatial.transform import Rotation as R

    from colmap_tpu import api

    cam = _camera()
    Rm = R.from_rotvec(rng.normal(0, 0.2, 3)).as_matrix()
    t = rng.normal(0, 1, 3)
    t[2] += 5
    X = rng.uniform(-2, 2, (80, 3))
    pc = X @ Rm.T + t
    uv = pc[:, :2] / pc[:, 2:]
    xy = uv * 500.0 + np.array([320.0, 240.0])
    xy[:15] += rng.normal(0, 40, (15, 2))  # outliers
    res = api.absolute_pose_estimation(xy, X, cam, max_error_px=4.0)
    assert res["success"]
    assert res["num_inliers"] >= 60
    from colmap_tpu.geometry import rotation as rot
    import jax.numpy as jnp

    q_gt = np.asarray(rot.rotmat_to_quat(jnp.asarray(Rm, jnp.float32)))
    dq = abs(np.dot(res["cam_from_world"][:4], q_gt))
    assert np.degrees(2 * np.arccos(min(dq, 1.0))) < 0.5


def test_two_view_bindings(rng):
    from scipy.spatial.transform import Rotation as R

    from colmap_tpu import api

    cam = _camera()
    Rm = R.from_rotvec([0, 0.08, 0]).as_matrix()
    t = np.array([1.0, 0.1, 0.05])
    X = rng.uniform(-2, 2, (120, 3))
    X[:, 2] += 6
    pc1 = X
    pc2 = X @ Rm.T + t
    xy1 = (pc1[:, :2] / pc1[:, 2:]) * 500 + [320, 240]
    xy2 = (pc2[:, :2] / pc2[:, 2:]) * 500 + [320, 240]
    res = api.essential_matrix_estimation(xy1, xy2, cam, cam)
    assert res["success"]
    assert res["num_inliers"] > 100
    resF = api.fundamental_matrix_estimation(xy1, xy2)
    assert resF["num_inliers"] > 100
    # planar points -> homography succeeds
    Xp = X.copy()
    Xp[:, 2] = 6.0
    pc2p = Xp @ Rm.T + t
    h1 = (Xp[:, :2] / Xp[:, 2:]) * 500 + [320, 240]
    h2 = (pc2p[:, :2] / pc2p[:, 2:]) * 500 + [320, 240]
    resH = api.homography_matrix_estimation(h1, h2)
    assert resH["num_inliers"] > 100


def test_exif_gps_roundtrip(tmp_path):
    from PIL import Image

    from colmap_tpu.sensor import bitmap as bm

    from fractions import Fraction

    img = Image.fromarray(np.zeros((32, 32), np.uint8))
    exif = img.getexif()
    gps_ifd = {
        1: "N", 2: (Fraction(47), Fraction(22), Fraction(30)),
        3: "E", 4: (Fraction(8), Fraction(32), Fraction(15)),
        5: 0, 6: Fraction(425),
    }
    exif[0x8825] = gps_ifd
    p = str(tmp_path / "gps.jpg")
    img.save(p, exif=exif)
    bmp = bm.read_bitmap(p)
    assert bmp.gps is not None
    np.testing.assert_allclose(bmp.gps[0], 47 + 22 / 60 + 30 / 3600, atol=1e-6)
    np.testing.assert_allclose(bmp.gps[1], 8 + 32 / 60 + 15 / 3600, atol=1e-6)
    np.testing.assert_allclose(bmp.gps[2], 425.0, atol=1e-6)


def test_workspace_cache(tmp_path):
    from colmap_tpu.mvs import depth_map as dm
    from colmap_tpu.mvs.workspace import Workspace, WorkspaceOptions
    from colmap_tpu.sensor import bitmap as bm

    ws = str(tmp_path)
    os.makedirs(os.path.join(ws, "images"))
    for sub in ("depth_maps", "normal_maps"):
        os.makedirs(os.path.join(ws, "stereo", sub))
    rng = np.random.default_rng(0)
    names = {}
    for i in range(4):
        name = f"im{i}.png"
        names[i + 1] = name
        bm.write_bitmap(os.path.join(ws, "images", name),
                        rng.uniform(0, 1, (40, 50)).astype(np.float32))
        dm.DepthMap(rng.uniform(1, 5, (40, 50)).astype(np.float32)).write(
            os.path.join(ws, "stereo", "depth_maps", f"{name}.geometric.bin"))
        dm.NormalMap(rng.normal(0, 1, (40, 50, 3)).astype(np.float32)).write(
            os.path.join(ws, "stereo", "normal_maps", f"{name}.geometric.bin"))

    # cache capped below the total size -> eviction happens, reads still work
    w = Workspace(WorkspaceOptions(workspace_path=ws,
                                   max_cache_bytes=3 * 40 * 50 * 4 * 3),
                  names)
    for i in range(1, 5):
        assert w.has_depth_map(i)
        assert w.depth_map(i).shape == (40, 50)
        assert w.normal_map(i).shape == (40, 50, 3)
        assert w.bitmap(i).shape == (40, 50)
    assert w.num_bytes_cached <= 3 * 40 * 50 * 4 * 3
    # repeated access is served from cache (same object)
    a = w.depth_map(4)
    b = w.depth_map(4)
    assert a is b
