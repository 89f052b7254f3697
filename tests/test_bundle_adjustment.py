import numpy as np
import jax
import jax.numpy as jnp

from colmap_tpu.estimators import bundle_adjustment as ba
from colmap_tpu.geometry import rigid3, rotation as rot
from colmap_tpu.sensor import models as cm


def build_synthetic_ba(rng, num_poses=8, num_points=200, noise_px=0.0,
                       model_id=int(cm.CameraModelId.SIMPLE_RADIAL)):
    """Circle-of-cameras synthetic BA problem with full visibility."""
    params = cm.pad_params([1000.0, 512.0, 384.0, 0.01])
    points = rng.uniform(-1, 1, (num_points, 3)).astype(np.float32)

    poses = []
    for i in range(num_poses):
        ang = 2 * np.pi * i / num_poses
        center = np.array([4 * np.cos(ang), 0.5 * np.sin(2 * ang), 4 * np.sin(ang)])
        z = -center / np.linalg.norm(center)
        up = np.array([0.0, -1.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=1).T
        t = -R @ center
        q = np.asarray(rot.rotmat_to_quat(jnp.asarray(R, jnp.float32)))
        poses.append(np.concatenate([q, t]).astype(np.float32))
    poses = np.stack(poses)

    obs_pose, obs_cam, obs_pt, obs_xy = [], [], [], []
    for p in range(num_poses):
        pc = np.asarray(rigid3.apply(jnp.asarray(poses[p]), jnp.asarray(points)))
        uv = pc[:, :2] / pc[:, 2:]
        xy = np.asarray(cm.img_from_cam(model_id, jnp.asarray(params), jnp.asarray(uv)))
        for m in range(num_points):
            if pc[m, 2] > 0.2:
                obs_pose.append(p)
                obs_cam.append(0)
                obs_pt.append(m)
                obs_xy.append(xy[m])
    obs_xy = np.stack(obs_xy).astype(np.float32)
    if noise_px > 0:
        obs_xy = obs_xy + rng.normal(0, noise_px, obs_xy.shape).astype(np.float32)
    return poses, params[None].astype(np.float32), points, (
        np.array(obs_pose, np.int32),
        np.array(obs_cam, np.int32),
        np.array(obs_pt, np.int32),
        obs_xy,
    ), model_id


def rms_reproj(problem, options):
    cost = float(ba.compute_cost(problem, options))
    n = float(jnp.sum(problem.obs_weight))
    return np.sqrt(2 * cost / n)


def test_ba_converges_from_perturbation(rng):
    poses, cams, points, obs, model_id = build_synthetic_ba(rng)
    # perturb everything except gauge-fixing dofs
    noisy_poses = np.array(
        rigid3.exp_update(
            jnp.asarray(poses),
            jnp.asarray(rng.normal(0, 0.01, (len(poses), 6)).astype(np.float32)),
        )
    )
    noisy_points = points + rng.normal(0, 0.02, points.shape).astype(np.float32)
    noisy_poses[0] = poses[0]  # keep gauge anchors at GT
    noisy_poses[1] = poses[1]

    problem = ba.make_problem(
        noisy_poses, cams, noisy_points, *obs, fix_first_pose_and_gauge=True
    )
    options = ba.BAOptions(max_iterations=30, cg_iterations=30, camera_model_id=model_id)
    rms0 = rms_reproj(problem, options)
    state = ba.solve(problem, options)
    rms1 = rms_reproj(state.problem, options)
    assert rms0 > 1.0
    assert rms1 < 0.05, f"rms {rms0} -> {rms1}"

    # poses recovered (gauge fully fixed by two anchors at GT)
    got = np.asarray(state.problem.poses)
    for i in range(len(poses)):
        dq = np.degrees(
            2 * np.arccos(min(1.0, abs(float(np.dot(got[i, :4], poses[i, :4])))))
        )
        assert dq < 0.05, f"pose {i} rot err {dq}"
        assert np.linalg.norm(got[i, 4:] - poses[i, 4:]) < 5e-3


def test_ba_noise_robust_loss(rng):
    poses, cams, points, obs, model_id = build_synthetic_ba(rng, noise_px=0.5)
    noisy_poses = np.array(
        rigid3.exp_update(
            jnp.asarray(poses),
            jnp.asarray(rng.normal(0, 0.005, (len(poses), 6)).astype(np.float32)),
        )
    )
    noisy_poses[0] = poses[0]
    noisy_poses[1] = poses[1]
    noisy_points = points + rng.normal(0, 0.01, points.shape).astype(np.float32)
    problem = ba.make_problem(
        noisy_poses, cams, noisy_points, *obs, fix_first_pose_and_gauge=True
    )
    options = ba.BAOptions(
        max_iterations=25, cg_iterations=25, loss="cauchy", loss_scale=2.0,
        camera_model_id=model_id,
    )
    state = ba.solve(problem, options)
    rms1 = rms_reproj(state.problem, options)
    assert rms1 < 0.8  # converges to the noise floor


def test_ba_refines_intrinsics(rng):
    poses, cams, points, obs, model_id = build_synthetic_ba(rng)
    bad_cams = cams.copy()
    bad_cams[0, 0] *= 1.02  # 2% focal error
    problem = ba.make_problem(
        poses, bad_cams, points, *obs,
        fix_first_pose_and_gauge=True, refine_intrinsics=True,
    )
    options = ba.BAOptions(max_iterations=30, cg_iterations=40, camera_model_id=model_id)
    state = ba.solve(problem, options)
    focal = float(state.problem.cam_params[0, 0])
    assert abs(focal - 1000.0) < 5.0, focal


def test_ba_fixed_points_stay(rng):
    poses, cams, points, obs, model_id = build_synthetic_ba(rng, num_poses=5, num_points=50)
    problem = ba.make_problem(poses, cams, points, *obs, fix_first_pose_and_gauge=True)
    problem = problem._replace(point_mask=jnp.zeros_like(problem.point_mask))
    options = ba.BAOptions(max_iterations=3, cg_iterations=10, camera_model_id=model_id)
    state = ba.solve(problem, options)
    np.testing.assert_allclose(np.asarray(state.problem.points), points, atol=1e-6)
