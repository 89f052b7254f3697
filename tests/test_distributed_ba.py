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


def test_distributed_ba_multi_camera_uneven_shards(rng):
    """Scaling-shape coverage: C=3 cameras, P=24 poses, an observation
    count NOT divisible by the 8 shards (pad rows land on one shard), and
    intrinsics refinement ON through the distributed segment-sum path."""
    from tests.test_bundle_adjustment import build_multi_camera_ba

    poses, cam_params, points, obs, model_id = build_multi_camera_ba(
        rng, num_poses=24, num_cams=3, num_points=150)
    op, oc, opt_, oxy = obs
    # drop a few observations so the count is odd w.r.t. the mesh
    n = (len(op) // 8) * 8 - 3
    obs = (op[:n], oc[:n], opt_[:n], oxy[:n])
    noisy = np.array(
        rigid3.exp_update(
            jnp.asarray(poses),
            jnp.asarray(rng.normal(0, 0.004, (len(poses), 6)).astype(np.float32)),
        )
    )
    noisy[0], noisy[1] = poses[0], poses[1]
    problem = ba.make_problem(
        noisy, cam_params, points, *obs, fix_first_pose_and_gauge=True,
        refine_intrinsics=True,
        camera_model_ids=[model_id] * len(cam_params),
    )
    options = ba.BAOptions(max_iterations=12, cg_iterations=25,
                           camera_model_id=model_id)
    mesh = make_mesh(8)
    state = distributed_ba.solve_distributed(problem, options, mesh)
    state_single = ba.solve(problem, options)
    # distributed and single-device solves agree
    np.testing.assert_allclose(float(state.cost), float(state_single.cost),
                               rtol=5e-2, atol=1e-4)
    rms = rms_reproj(state.problem, options)
    assert rms < 0.2, rms


def test_pose_sharded_regime_selected_and_matches(rng):
    """The default distributed regime is pose-sharded on the gather
    layouts (the fast kernel); it must agree with single-device to tight
    tolerance, and the host partition must round-trip the problem."""
    poses, cams, points, obs, model_id = build_synthetic_ba(
        rng, num_poses=21, num_points=200)  # 21 poses: forces pose padding
    noisy = np.array(
        rigid3.exp_update(
            jnp.asarray(poses),
            jnp.asarray(rng.normal(0, 0.006, (len(poses), 6)).astype(np.float32)),
        )
    )
    noisy[0], noisy[1] = poses[0], poses[1]
    problem = ba.make_problem(noisy, cams, points, *obs,
                              fix_first_pose_and_gauge=True)
    # the pose partition must be feasible for this problem
    sharded = distributed_ba.shard_problem_by_pose(problem, 8)
    assert sharded is not None, "expected the pose-sharded regime"
    _, P_local, N_shard, T, S = sharded
    assert P_local * 8 >= 21 and T >= 1 and S >= 1

    options = ba.BAOptions(max_iterations=15, cg_iterations=25,
                           camera_model_id=model_id, function_tolerance=0.0,
                           cg_tolerance=0.0)
    mesh = make_mesh(8)
    state = distributed_ba.solve_distributed(problem, options, mesh)
    state_single = ba.solve(problem, options)
    np.testing.assert_allclose(float(state.cost), float(state_single.cost),
                               rtol=1e-3, atol=1e-6)
    # the returned problem keeps the caller's obs contract (global pose
    # indices, original order/length) and pose count
    assert state.problem.poses.shape[0] == len(poses)
    np.testing.assert_array_equal(np.asarray(state.problem.obs_pose_idx),
                                  np.asarray(problem.obs_pose_idx))
    rms = rms_reproj(state.problem, options)
    assert rms < 0.1, rms


def test_obs_sharded_fallback_matches(rng):
    """Force the observation-sharded segment-sum fallback (layout caps
    exceeded) and check it still matches single-device."""
    poses, cams, points, obs, model_id = build_synthetic_ba(
        rng, num_poses=6, num_points=100)
    problem = ba.make_problem(poses, cams, points, *obs,
                              fix_first_pose_and_gauge=True)
    # a tiny max_slots makes the per-shard layouts infeasible
    assert distributed_ba.shard_problem_by_pose(problem, 8,
                                                max_slots=4) is None
    options = ba.BAOptions(max_iterations=10, cg_iterations=20,
                           camera_model_id=model_id)
    mesh = make_mesh(8)
    sharded = distributed_ba.shard_problem(problem, 8)
    obs_spec, state_spec = distributed_ba._specs(pose_sharded=False)
    from functools import partial

    @partial(jax.shard_map, mesh=mesh, in_specs=(obs_spec,),
             out_specs=state_spec, check_vma=False)
    def run(p):
        st = ba.init_state(p, options, axis_name=distributed_ba.DATA_AXIS)
        return ba.run_lm(st, options, axis_name=distributed_ba.DATA_AXIS)

    with mesh:
        state = jax.jit(run)(sharded)
    state_single = ba.solve(problem, options)
    np.testing.assert_allclose(float(state.cost), float(state_single.cost),
                               rtol=5e-2, atol=1e-4)


def test_distributed_ba_early_exit(rng):
    """function_tolerance termination works under shard_map (the psum'd
    cost keeps the while_loop condition uniform across shards)."""
    poses, cams, points, obs, model_id = build_synthetic_ba(
        rng, num_poses=6, num_points=80)
    problem = ba.make_problem(poses, cams, points, *obs,
                              fix_first_pose_and_gauge=True)
    options = ba.BAOptions(max_iterations=30, cg_iterations=10,
                           camera_model_id=model_id, function_tolerance=1e-6)
    mesh = make_mesh(8)
    state = distributed_ba.solve_distributed(problem, options, mesh)
    assert int(np.asarray(state.iteration)[0] if np.asarray(state.iteration).ndim
               else state.iteration) < 30
