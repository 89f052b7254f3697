import numpy as np
import jax
import jax.numpy as jnp
import pytest

from colmap_tpu.geometry import rigid3, rotation as rot
from colmap_tpu.estimators import (
    absolute_pose as ap,
    essential_matrix as em,
    fundamental_matrix as fm,
    homography_matrix as hm,
)
from colmap_tpu.optim.ransac import RansacOptions, ransac


def make_two_view(rng, n=100, noise=0.0):
    aa = 0.2 * rng.standard_normal(3).astype(np.float32)
    q = rot.quat_from_axis_angle(jnp.array(aa))
    t = rng.standard_normal(3).astype(np.float32)
    t /= np.linalg.norm(t)
    pose = rigid3.make(q, jnp.array(t))
    X = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    X[:, 2] += 6.0
    uv1 = X[:, :2] / X[:, 2:]
    Xc2 = np.asarray(rigid3.apply(pose, jnp.array(X)))
    uv2 = Xc2[:, :2] / Xc2[:, 2:]
    if noise:
        uv1 = uv1 + rng.normal(0, noise, uv1.shape).astype(np.float32)
        uv2 = uv2 + rng.normal(0, noise, uv2.shape).astype(np.float32)
    R = np.asarray(rot.quat_to_rotmat(q))
    tn = np.asarray(t)
    tx = np.array([[0, -tn[2], tn[1]], [tn[2], 0, -tn[0]], [-tn[1], tn[0], 0]])
    E = tx @ R
    E /= np.linalg.norm(E)
    return uv1.astype(np.float32), uv2.astype(np.float32), E, pose


def epipolar_err(E, uv1, uv2):
    h1 = np.concatenate([uv1, np.ones((len(uv1), 1))], 1)
    h2 = np.concatenate([uv2, np.ones((len(uv2), 1))], 1)
    return np.abs(np.einsum("ni,ij,nj->n", h2, E, h1))


def test_essential_5pt_exact(rng):
    uv1, uv2, E_gt, _ = make_two_view(rng, n=5)
    E, valid = jax.jit(em.solve_5pt)(jnp.array(uv1), jnp.array(uv2))
    E, valid = np.asarray(E), np.asarray(valid)
    assert valid.any()
    errs = [epipolar_err(E[i], uv1, uv2).max() for i in range(10) if valid[i]]
    assert min(errs) < 1e-4
    match = min(
        min(np.linalg.norm(E[i] - E_gt), np.linalg.norm(E[i] + E_gt))
        for i in range(10)
        if valid[i]
    )
    assert match < 1e-3


def test_essential_8pt_exact(rng):
    uv1, uv2, E_gt, _ = make_two_view(rng, n=8)
    E, valid = jax.jit(em.solve_8pt)(jnp.array(uv1), jnp.array(uv2))
    E = np.asarray(E)[0]
    assert np.asarray(valid)[0]
    assert epipolar_err(E, uv1, uv2).max() < 1e-4


def test_fundamental_7pt_exact(rng):
    # F from pixel coords: use K to map
    uv1, uv2, E_gt, _ = make_two_view(rng, n=7)
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], dtype=np.float32)
    p1 = (K @ np.concatenate([uv1, np.ones((7, 1), np.float32)], 1).T).T[:, :2]
    p2 = (K @ np.concatenate([uv2, np.ones((7, 1), np.float32)], 1).T).T[:, :2]
    F_gt = np.linalg.inv(K).T @ E_gt @ np.linalg.inv(K)
    F_gt /= np.linalg.norm(F_gt)
    Fs, valid = jax.jit(fm.solve_7pt)(jnp.array(p1), jnp.array(p2))
    Fs, valid = np.asarray(Fs), np.asarray(valid)
    assert valid.any()
    errs = []
    for i in range(3):
        if valid[i]:
            h1 = np.concatenate([p1, np.ones((7, 1))], 1)
            h2 = np.concatenate([p2, np.ones((7, 1))], 1)
            errs.append(np.abs(np.einsum("ni,ij,nj->n", h2, Fs[i], h1)).max())
    assert min(errs) < 1e-2


def test_fundamental_8pt_exact(rng):
    uv1, uv2, E_gt, _ = make_two_view(rng, n=30)
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], dtype=np.float32)
    p1 = (K @ np.concatenate([uv1, np.ones((30, 1), np.float32)], 1).T).T[:, :2]
    p2 = (K @ np.concatenate([uv2, np.ones((30, 1), np.float32)], 1).T).T[:, :2]
    F, valid = jax.jit(fm.solve_8pt)(jnp.array(p1), jnp.array(p2))
    F = np.asarray(F)[0]
    r = np.asarray(fm.sampson_residuals(jnp.array(F), (jnp.array(p1), jnp.array(p2))))
    assert np.sqrt(r.max()) < 0.1  # pixels


def test_homography_4pt_exact(rng):
    H_gt = np.array([[1.1, 0.05, 3.0], [-0.04, 0.95, -2.0], [1e-4, -2e-4, 1.0]], dtype=np.float32)
    p1 = rng.uniform(0, 640, (4, 2)).astype(np.float32)
    h = (H_gt @ np.concatenate([p1, np.ones((4, 1), np.float32)], 1).T).T
    p2 = (h[:, :2] / h[:, 2:]).astype(np.float32)
    H, valid = jax.jit(hm.solve_4pt)(jnp.array(p1), jnp.array(p2))
    H = np.asarray(H)[0]
    assert np.asarray(valid)[0]
    np.testing.assert_allclose(H / H[2, 2], H_gt, atol=1e-2)


def test_p3p_exact(rng):
    q = rng.standard_normal(4).astype(np.float32)
    q /= np.linalg.norm(q)
    t = rng.standard_normal(3).astype(np.float32)
    pose_gt = rigid3.make(jnp.array(q), jnp.array(t))
    Xc = rng.uniform(-1, 1, (3, 3)).astype(np.float32)
    Xc[:, 2] = rng.uniform(2, 6, 3)
    Xw = np.asarray(rigid3.apply(rigid3.inverse(pose_gt), jnp.array(Xc)))
    uv = Xc[:, :2] / Xc[:, 2:]
    poses, valid = jax.jit(ap.solve_p3p)(jnp.array(Xw), jnp.array(uv))
    poses, valid = np.asarray(poses), np.asarray(valid)
    assert valid.any()
    gt = np.asarray(pose_gt)
    errs = [
        min(np.linalg.norm(poses[i][:4] - gt[:4]), np.linalg.norm(poses[i][:4] + gt[:4]))
        + np.linalg.norm(poses[i][4:] - gt[4:])
        for i in range(4)
        if valid[i]
    ]
    assert min(errs) < 0.05


def test_ransac_homography_with_outliers(rng):
    H_gt = np.array([[1.05, 0.02, 10.0], [-0.01, 0.98, -5.0], [5e-5, -1e-4, 1.0]])
    n = 200
    p1 = rng.uniform(0, 640, (n, 2))
    h = (H_gt @ np.concatenate([p1, np.ones((n, 1))], 1).T).T
    p2 = h[:, :2] / h[:, 2:]
    p2 += rng.normal(0, 0.5, p2.shape)
    # 40% outliers
    n_out = int(0.4 * n)
    p2[:n_out] = rng.uniform(0, 640, (n_out, 2))
    p1, p2 = p1.astype(np.float32), p2.astype(np.float32)

    opts = RansacOptions(max_error=4.0, num_samples=512, lo_iterations=3)

    @jax.jit
    def run(key, p1, p2):
        return ransac(
            key,
            solver=hm.solve_4pt,
            residual_fn=hm.residuals,
            refit_fn=hm.refit,
            data=(p1, p2),
            valid=jnp.ones(n, dtype=bool),
            sample_size=4,
            options=opts,
        )

    res = run(jax.random.PRNGKey(0), jnp.array(p1), jnp.array(p2))
    assert bool(res.success)
    inl = np.asarray(res.inlier_mask)
    # all true inliers recovered, no outliers included
    assert inl[n_out:].mean() > 0.95
    assert inl[:n_out].mean() < 0.05


def test_ransac_essential_with_outliers(rng):
    uv1, uv2, E_gt, pose_gt = make_two_view(rng, n=300, noise=0.001)
    n_out = 100
    uv2_corrupt = uv2.copy()
    uv2_corrupt[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2)).astype(np.float32)

    opts = RansacOptions(max_error=0.01, num_samples=256, lo_iterations=3)

    @jax.jit
    def run(key, p1, p2):
        return ransac(
            key,
            solver=em.solve_5pt,
            residual_fn=em.residuals,
            refit_fn=em.refit,
            data=(p1, p2),
            valid=jnp.ones(len(p1), dtype=bool),
            sample_size=5,
            options=opts,
        )

    res = run(jax.random.PRNGKey(1), jnp.array(uv1), jnp.array(uv2_corrupt))
    inl = np.asarray(res.inlier_mask)
    assert inl[n_out:].mean() > 0.9
    assert inl[:n_out].mean() < 0.1
    # recovered E close to GT
    E = np.array(res.model)
    E /= np.linalg.norm(E)
    match = min(np.linalg.norm(E - E_gt), np.linalg.norm(E + E_gt))
    assert match < 0.05


def test_ransac_pnp_with_outliers(rng):
    q = rng.standard_normal(4).astype(np.float32)
    q /= np.linalg.norm(q)
    t = rng.standard_normal(3).astype(np.float32)
    pose_gt = rigid3.make(jnp.array(q), jnp.array(t))
    n = 200
    Xc = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    Xc[:, 2] = rng.uniform(2, 8, n)
    Xw = np.asarray(rigid3.apply(rigid3.inverse(pose_gt), jnp.array(Xc)))
    uv = Xc[:, :2] / Xc[:, 2:] + rng.normal(0, 0.001, (n, 2)).astype(np.float32)
    n_out = 60
    uv_c = uv.copy()
    uv_c[:n_out] = rng.uniform(-0.4, 0.4, (n_out, 2)).astype(np.float32)

    opts = RansacOptions(max_error=0.01, num_samples=256, lo_iterations=3)

    @jax.jit
    def run(key, X, u):
        return ransac(
            key,
            solver=ap.solve_p3p,
            residual_fn=ap.residuals,
            refit_fn=ap.refit,
            data=(X, u),
            valid=jnp.ones(n, dtype=bool),
            sample_size=3,
            options=opts,
        )

    res = run(jax.random.PRNGKey(2), jnp.array(Xw), jnp.array(uv_c.astype(np.float32)))
    inl = np.asarray(res.inlier_mask)
    assert inl[n_out:].mean() > 0.9
    gt = np.asarray(pose_gt)
    got = np.asarray(res.model)
    assert np.degrees(2 * np.arccos(min(1.0, abs(np.dot(got[:4], gt[:4]))))) < 1.0
    assert np.linalg.norm(got[4:] - gt[4:]) < 0.05


def test_gn_refine_pose(rng):
    q = rng.standard_normal(4).astype(np.float32)
    q /= np.linalg.norm(q)
    t = rng.standard_normal(3).astype(np.float32)
    pose_gt = rigid3.make(jnp.array(q), jnp.array(t))
    n = 50
    Xc = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    Xc[:, 2] = rng.uniform(2, 8, n)
    Xw = np.asarray(rigid3.apply(rigid3.inverse(pose_gt), jnp.array(Xc)))
    uv = Xc[:, :2] / Xc[:, 2:]
    noisy = rigid3.exp_update(pose_gt, jnp.array([0.05, -0.04, 0.03, 0.1, -0.05, 0.08], jnp.float32))
    refined = ap.gn_refine_pose(noisy, jnp.array(Xw), jnp.array(uv), jnp.ones(n, jnp.float32))
    assert np.linalg.norm(np.asarray(refined) - np.asarray(pose_gt)) < 1e-4
