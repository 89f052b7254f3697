"""Pose-prior BA + stereo rectification tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from colmap_tpu.estimators import pose_prior_ba as pba
from colmap_tpu.geometry import rigid3, rotation as rot
from colmap_tpu.image.rectification import rectify_images, rectify_stereo_pair
from colmap_tpu.scene import synthetic
from colmap_tpu.scene.database import Database


def test_prior_ba_anchors_scale_and_frame(rng):
    """Priors pin the gauge: a shifted/perturbed model snaps back to the
    prior positions without any frozen poses."""
    db = Database(":memory:")
    gt = synthetic.synthesize_dataset(
        synthetic.SyntheticDatasetOptions(num_cameras=1, num_images=8,
                                          num_points3D=150, seed=6), db)
    import copy

    rec = copy.deepcopy(gt)
    # perturb the whole model by a shift + noise
    for iid in rec.registered_image_ids():
        rec.images[iid].cam_from_world = rec.images[iid].cam_from_world.copy()
        rec.images[iid].cam_from_world[4:] += rng.normal(0, 0.01, 3) + 0.3
    for pid in rec.points3D:
        rec.points3D[pid].xyz = rec.points3D[pid].xyz + rng.normal(0, 0.005, 3)

    priors = {iid: gt.images[iid].projection_center()
              for iid in gt.registered_image_ids()}
    model_id = gt.cameras[list(gt.cameras)[0]].model_id
    pba.refine_with_priors(
        rec, priors, sigma=0.01,
        options=pba.PriorBAOptions(max_iterations=25, cg_iterations=50,
                                   camera_model_id=int(model_id)))
    errs = [np.linalg.norm(rec.images[i].projection_center() - priors[i])
            for i in priors]
    assert np.median(errs) < 0.01, f"median center err {np.median(errs):.4f}"


def _pinhole_pair(rng):
    from scipy.spatial.transform import Rotation as R

    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
    R1 = R.from_rotvec(rng.normal(0, 0.05, 3)).as_matrix()
    R2 = R.from_rotvec(rng.normal(0, 0.05, 3)).as_matrix()
    c1 = np.array([0.0, 0, 0])
    c2 = np.array([1.0, 0.05, -0.02])
    q1 = np.asarray(rot.rotmat_to_quat(jnp.asarray(R1, jnp.float32)))
    q2 = np.asarray(rot.rotmat_to_quat(jnp.asarray(R2, jnp.float32)))
    p1 = np.concatenate([q1, -R1 @ c1])
    p2 = np.concatenate([q2, -R2 @ c2])
    return K, p1, p2, (R1, R2, c1, c2)


def test_rectification_epipolar_alignment(rng):
    """After rectification, corresponding points share the same row."""
    K, p1, p2, (R1, R2, c1, c2) = _pinhole_pair(rng)
    H1, H2, K_new, baseline = rectify_stereo_pair(K, K, p1, p2)
    assert abs(baseline - np.linalg.norm(c2 - c1)) < 1e-6
    # project random 3D points into both rectified views
    X = rng.uniform(-1, 1, (50, 3))
    X[:, 2] += 5

    def proj(Rm, c, H, X):
        pc = (X - c) @ Rm.T
        x = (pc / pc[:, 2:]) @ K.T
        xr = x @ H.T
        return xr[:, :2] / xr[:, 2:]

    y1 = proj(R1, c1, H1, X)[:, 1]
    y2 = proj(R2, c2, H2, X)[:, 1]
    np.testing.assert_allclose(y1, y2, atol=0.01)


def test_rectify_images_runs(rng):
    K, p1, p2, _ = _pinhole_pair(rng)
    img1 = rng.uniform(0, 1, (240, 320)).astype(np.float32)
    img2 = rng.uniform(0, 1, (240, 320)).astype(np.float32)
    o1, o2, info = rectify_images(img1, img2, K, K, p1, p2)
    assert o1.shape == img1.shape and o2.shape == img2.shape
    assert np.isfinite(info["baseline"])
    assert (o1 > 0).mean() > 0.5  # most of the frame survives the warp


def test_rig_config_bundle_adjuster(tmp_path, rng):
    """rig_bundle_adjuster CLI path: rig config + perturbed model."""
    import json

    from colmap_tpu.scene.reconstruction import Camera, Image, Reconstruction
    from colmap_tpu.tools.rig_tools import run_rig_bundle_adjustment

    # 2-camera rig, 4 snapshots, shared points
    cams_from_rig = np.stack([
        np.array([1, 0, 0, 0, 0, 0, 0.0]),
        np.array([1, 0, 0, 0, 0.5, 0, 0.0]),
    ])
    f = 400.0
    rec = Reconstruction()
    for c in range(2):
        rec.add_camera(Camera(camera_id=c + 1, model_id=0, width=640,
                              height=480,
                              params=np.array([f, 320.0, 240.0])))
    X = rng.uniform(-2, 2, (100, 3))
    X[:, 2] += 6
    iid = 1
    img_xys = {}
    for s in range(4):
        rig_pose = np.array([1, 0, 0, 0, s * 0.4 - 0.8, 0, 0.0])
        for c in range(2):
            pose = np.asarray(rigid3.compose(
                jnp.asarray(cams_from_rig[c], jnp.float32),
                jnp.asarray(rig_pose, jnp.float32))).astype(np.float64)
            img = Image(image_id=iid, name=f"cam{c + 1}/frame{s:03d}.png",
                        camera_id=c + 1)
            img.cam_from_world = pose
            img.xys = np.zeros((100, 2))
            img.point3D_ids = np.full(100, -1, np.int64)
            rec.add_image(img)
            img_xys[iid] = pose
            iid += 1
    # tracks
    for m in range(100):
        track = []
        for img_id, pose in img_xys.items():
            pc = np.asarray(rigid3.apply(jnp.asarray(pose, jnp.float32),
                                         jnp.asarray(X[m], jnp.float32)))
            if pc[2] <= 0.5:
                continue
            xy = f * pc[:2] / pc[2] + np.array([320.0, 240.0])
            rec.images[img_id].xys[m] = xy
            track.append((img_id, m))
        if len(track) >= 2:
            rec.add_point3D(X[m], track)

    # perturb poses of camera-2 images (rig constraint should fix them)
    for img_id, im in rec.images.items():
        if im.camera_id == 2:
            im.cam_from_world = im.cam_from_world.copy()
            im.cam_from_world[4:] += rng.normal(0, 0.02, 3)

    config = [{
        "ref_camera_id": 1,
        "cameras": [
            {"camera_id": 1, "image_prefix": "cam1/",
             "cam_from_rig_rotation": [1, 0, 0, 0],
             "cam_from_rig_translation": [0, 0, 0]},
            {"camera_id": 2, "image_prefix": "cam2/",
             "cam_from_rig_rotation": [1, 0, 0, 0],
             "cam_from_rig_translation": [0.5, 0, 0]},
        ],
    }]
    cfg_path = str(tmp_path / "rig_config.json")
    with open(cfg_path, "w") as fp:
        json.dump(config, fp)

    rec = run_rig_bundle_adjustment(rec, cfg_path)
    # after rig BA, camera-2 poses must satisfy the rig constraint exactly
    for s in range(4):
        im1 = [im for im in rec.images.values()
               if im.name == f"cam1/frame{s:03d}.png"][0]
        im2 = [im for im in rec.images.values()
               if im.name == f"cam2/frame{s:03d}.png"][0]
        rel = np.asarray(rigid3.compose(
            jnp.asarray(im2.cam_from_world, jnp.float32),
            rigid3.inverse(jnp.asarray(im1.cam_from_world, jnp.float32))))
        np.testing.assert_allclose(rel[4:], [0.5, 0, 0], atol=5e-3)
