"""Undistortion tests (reference: src/colmap/image/undistortion_test.cc)."""

import numpy as np

import jax.numpy as jnp

from colmap_tpu.image import undistortion as und
from colmap_tpu.image import warp as warp_mod
from colmap_tpu.scene.reconstruction import Camera
from colmap_tpu.sensor import models as cm


def _radial_camera():
    return Camera(camera_id=1, model_id=int(cm.CameraModelId.SIMPLE_RADIAL),
                  width=200, height=160,
                  params=np.array([180.0, 100.0, 80.0, -0.15]))


def test_undistort_pinhole_is_identity():
    cam = Camera(camera_id=1, model_id=int(cm.CameraModelId.PINHOLE),
                 width=100, height=80,
                 params=np.array([90.0, 90.0, 50.0, 40.0]))
    ucam = und.undistort_camera(und.UndistortCameraOptions(), cam)
    assert ucam.model_id == int(cm.CameraModelId.PINHOLE)
    np.testing.assert_allclose(ucam.params[:2], cam.params[:2], rtol=1e-3)


def test_undistort_image_intensity_correspondence():
    """I_und(img_from_cam_pinhole(uv)) == I(img_from_cam_radial(uv))."""
    cam = _radial_camera()
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (cam.height, cam.width)).astype(np.float32)
    # smooth it so bilinear interpolation is meaningful
    import jax

    img = np.asarray(jax.image.resize(
        jax.image.resize(jnp.asarray(img), (20, 25), "linear"),
        (cam.height, cam.width), "cubic"))

    out, ucam = und.undistort_image(und.UndistortCameraOptions(), img, cam)
    # sample a grid of camera rays, compare intensities
    uv = np.stack(np.meshgrid(np.linspace(-0.2, 0.2, 9),
                              np.linspace(-0.15, 0.15, 7)), -1).reshape(-1, 2)
    xy_d = np.asarray(cm.img_from_cam(cam.model_id,
                                      jnp.asarray(cam.padded_params()),
                                      jnp.asarray(uv, jnp.float32)))
    xy_u = np.asarray(cm.img_from_cam(ucam.model_id,
                                      jnp.asarray(ucam.padded_params()),
                                      jnp.asarray(uv, jnp.float32)))
    v_orig = np.asarray(warp_mod.bilinear_sample(
        jnp.asarray(img), jnp.asarray(xy_d[:, 1] - 0.5), jnp.asarray(xy_d[:, 0] - 0.5)))
    v_und = np.asarray(warp_mod.bilinear_sample(
        jnp.asarray(out), jnp.asarray(xy_u[:, 1] - 0.5), jnp.asarray(xy_u[:, 0] - 0.5)))
    inb = ((xy_d[:, 0] > 2) & (xy_d[:, 0] < cam.width - 2)
           & (xy_d[:, 1] > 2) & (xy_d[:, 1] < cam.height - 2)
           & (xy_u[:, 0] > 2) & (xy_u[:, 0] < ucam.width - 2)
           & (xy_u[:, 1] > 2) & (xy_u[:, 1] < ucam.height - 2))
    assert inb.sum() > 20
    np.testing.assert_allclose(v_und[inb], v_orig[inb], atol=0.02)


def test_undistort_reconstruction_reprojects_observations():
    from colmap_tpu.scene.reconstruction import Image, Reconstruction

    cam = _radial_camera()
    rec = Reconstruction()
    rec.add_camera(cam)
    img = Image(image_id=1, name="a.png", camera_id=1)
    img.cam_from_world = np.array([1, 0, 0, 0, 0, 0, 0], np.float64)
    xy = np.array([[50.0, 40.0], [120.0, 100.0], [100.0, 80.0]])
    img.xys = xy
    img.point3D_ids = np.full(3, -1, np.int64)
    rec.add_image(img)
    urec = und.undistort_reconstruction(und.UndistortCameraOptions(), rec)
    assert urec.cameras[1].model_id == int(cm.CameraModelId.PINHOLE)
    # rays must be preserved: cam_from_img(orig, xy) == cam_from_img(und, xy_u)
    uv0 = np.asarray(cm.cam_from_img(cam.model_id,
                                     jnp.asarray(cam.padded_params()),
                                     jnp.asarray(xy, jnp.float32)))
    ucam = urec.cameras[1]
    uv1 = np.asarray(cm.cam_from_img(ucam.model_id,
                                     jnp.asarray(ucam.padded_params()),
                                     jnp.asarray(urec.images[1].xys, jnp.float32)))
    np.testing.assert_allclose(uv0, uv1, atol=1e-4)


def test_warp_with_homography_shift():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (40, 50)).astype(np.float32)
    H = np.array([[1, 0, 3.0], [0, 1, 5.0], [0, 0, 1]], np.float32)  # shift
    out = np.asarray(warp_mod.warp_with_homography(
        jnp.asarray(img), jnp.asarray(H), (40, 50)))
    np.testing.assert_allclose(out[10:35, 8:45], img[5:30, 5:42], atol=1e-4)


def test_pmvs_and_cmpmvs_export(tmp_path):
    import os

    from colmap_tpu.image.undistortion import (
        UndistortCameraOptions, run_cmp_mvs_undistorter, run_pmvs_undistorter)
    from colmap_tpu.scene import synthetic_images as synth
    from colmap_tpu.scene.reconstruction import Camera, Image, Reconstruction
    from colmap_tpu.geometry import rotation as rot
    import jax.numpy as jnp

    opts = synth.RoomDatasetOptions(num_images=3, width=160, height=120,
                                    focal=140.0, seed=1)
    images, K, Rs, ts = synth.render_room_dataset(opts)
    img_dir = str(tmp_path / "imgs")
    names = synth.write_dataset(img_dir, images)
    rec = Reconstruction()
    rec.add_camera(Camera(camera_id=1, model_id=1, width=160, height=120,
                          params=np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])))
    for i, name in enumerate(names):
        q = np.asarray(rot.rotmat_to_quat(jnp.asarray(Rs[i], np.float32)))
        img = Image(image_id=i + 1, name=name, camera_id=1)
        img.cam_from_world = np.concatenate([q, ts[i]]).astype(np.float64)
        img.xys = np.zeros((4, 2))
        img.point3D_ids = np.full(4, -1, np.int64)
        rec.add_image(img)
    # a couple of shared points for vis.dat
    rec.add_point3D([0, 0, 4.0], [(1, 0), (2, 0), (3, 0)])
    rec.add_point3D([1, 0, 4.0], [(1, 1), (2, 1)])

    out = str(tmp_path / "pmvs_ws")
    run_pmvs_undistorter(rec, img_dir, out, UndistortCameraOptions())
    assert os.path.exists(os.path.join(out, "pmvs", "visualize", "00000000.jpg"))
    ptxt = open(os.path.join(out, "pmvs", "txt", "00000000.txt")).read()
    assert ptxt.startswith("CONTOUR")
    assert len(ptxt.strip().splitlines()) == 4
    vis = open(os.path.join(out, "pmvs", "vis.dat")).read().splitlines()
    assert vis[0] == "VISDATA" and int(vis[1]) == 3
    # image 0 covisible with 1 and 2
    assert vis[2].split()[:2] == ["0", "2"]

    out2 = str(tmp_path / "cmp_ws")
    run_cmp_mvs_undistorter(rec, img_dir, out2, UndistortCameraOptions())
    assert os.path.exists(os.path.join(out2, "00001.jpg"))
    assert open(os.path.join(out2, "00001_P.txt")).read().startswith("CONTOUR")
