import numpy as np
import jax
import jax.numpy as jnp
import pytest

from colmap_tpu.estimators import bundle_adjustment as ba
from colmap_tpu.geometry import rigid3
from colmap_tpu.parallel import distributed_ba
from colmap_tpu.parallel.mesh import make_mesh

from tests.test_bundle_adjustment import build_synthetic_ba, rms_reproj


def test_distributed_ba_matches_single(rng):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    poses, cams, points, obs, model_id = build_synthetic_ba(rng, num_poses=6, num_points=100)
    noisy_poses = np.array(
        rigid3.exp_update(
            jnp.asarray(poses),
            jnp.asarray(rng.normal(0, 0.008, (len(poses), 6)).astype(np.float32)),
        )
    )
    noisy_poses[0] = poses[0]
    noisy_poses[1] = poses[1]
    noisy_points = points + rng.normal(0, 0.02, points.shape).astype(np.float32)
    problem = ba.make_problem(
        noisy_poses, cams, noisy_points, *obs, fix_first_pose_and_gauge=True
    )
    options = ba.BAOptions(max_iterations=15, cg_iterations=25, camera_model_id=model_id)

    mesh = make_mesh(8)
    state = distributed_ba.solve_distributed(problem, options, mesh)
    rms = rms_reproj(state.problem._replace(
        obs_weight=state.problem.obs_weight), options)
    assert rms < 0.1, rms

    # compare against the single-device solve: same final cost scale
    state_single = ba.solve(problem, options)
    rms_single = rms_reproj(state_single.problem, options)
    assert abs(rms - rms_single) < 0.05
