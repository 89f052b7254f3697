import numpy as np
import jax
import jax.numpy as jnp

from colmap_tpu.estimators import two_view_geometry as tvg
from colmap_tpu.geometry import rigid3, rotation as rot

from tests.test_estimators import make_two_view

FOCAL = 500.0


def to_pixels(uv):
    return (uv * FOCAL + np.array([320.0, 240.0], np.float32)).astype(np.float32)


def run_tvg(rays1, rays2, valid=None, compute_pose=False):
    n = len(rays1)
    if valid is None:
        valid = np.ones(n, bool)
    opts = tvg.TwoViewGeometryOptions(compute_relative_pose=compute_pose)

    @jax.jit
    def go(key, r1, r2, p1, p2, v):
        return tvg.estimate_two_view_geometry(
            key, r1, r2, p1, p2, v, jnp.asarray(FOCAL, jnp.float32), opts
        )

    return go(
        jax.random.PRNGKey(0),
        jnp.array(rays1),
        jnp.array(rays2),
        jnp.array(to_pixels(rays1)),
        jnp.array(to_pixels(rays2)),
        jnp.array(valid),
    )


def test_calibrated_scene(rng):
    uv1, uv2, E_gt, pose_gt = make_two_view(rng, n=200, noise=0.0005)
    g = run_tvg(uv1, uv2, compute_pose=True)
    assert int(g.config) == int(tvg.TwoViewConfig.CALIBRATED)
    assert int(g.num_inliers) > 150
    # relative pose close to GT (translation up to scale)
    got = np.asarray(g.cam2_from_cam1)
    gt = np.asarray(pose_gt)
    rot_err = np.degrees(2 * np.arccos(min(1.0, abs(float(np.dot(got[:4], gt[:4]))))))
    assert rot_err < 1.0, rot_err
    t_got = got[4:] / np.linalg.norm(got[4:])
    t_gt = gt[4:] / np.linalg.norm(gt[4:])
    assert np.linalg.norm(t_got - t_gt) < 0.05
    assert float(g.tri_angle) > 0.05  # healthy triangulation angle


def test_planar_scene(rng):
    # points on a plane -> H dominates
    aa = 0.2 * rng.standard_normal(3).astype(np.float32)
    q = rot.quat_from_axis_angle(jnp.array(aa))
    t = rng.standard_normal(3).astype(np.float32)
    t /= np.linalg.norm(t)
    pose = rigid3.make(q, jnp.array(t))
    X = rng.uniform(-2, 2, (150, 3)).astype(np.float32)
    X[:, 2] = 6.0 + 0.3 * X[:, 0] + 0.1 * X[:, 1]  # a plane
    uv1 = X[:, :2] / X[:, 2:]
    Xc2 = np.asarray(rigid3.apply(pose, jnp.array(X)))
    uv2 = Xc2[:, :2] / Xc2[:, 2:]
    g = run_tvg(uv1.astype(np.float32), uv2.astype(np.float32))
    assert int(g.config) == int(tvg.TwoViewConfig.PLANAR_OR_PANORAMIC)


def test_degenerate_few_matches(rng):
    uv1, uv2, _, _ = make_two_view(rng, n=200)
    valid = np.zeros(200, bool)
    valid[:10] = True  # below min_num_inliers
    g = run_tvg(uv1, uv2, valid=valid)
    assert int(g.config) == int(tvg.TwoViewConfig.DEGENERATE)
    assert int(g.num_inliers) == 0


def test_outlier_contaminated(rng):
    uv1, uv2, E_gt, _ = make_two_view(rng, n=300, noise=0.0005)
    uv2 = uv2.copy()
    uv2[:120] = rng.uniform(-0.5, 0.5, (120, 2)).astype(np.float32)
    g = run_tvg(uv1, uv2)
    assert int(g.config) == int(tvg.TwoViewConfig.CALIBRATED)
    inl = np.asarray(g.inlier_mask)
    assert inl[120:].mean() > 0.85
    assert inl[:120].mean() < 0.1


def test_watermark_detection(rng):
    """Border-concentrated pure-translation matches classify as WATERMARK."""
    import jax
    import jax.numpy as jnp

    from colmap_tpu.estimators import two_view_geometry as tvg

    n = 128
    w, h = 640, 480
    # watermark corner region (bottom-right border)
    pix1 = np.stack([rng.uniform(w - 40, w - 4, n),
                     rng.uniform(h - 30, h - 4, n)], -1).astype(np.float32)
    pix2 = pix1 + np.array([1.5, -0.8], np.float32)  # constant shift
    f = 500.0
    rays1 = (pix1 - [w / 2, h / 2]) / f
    rays2 = (pix2 - [w / 2, h / 2]) / f
    opts = tvg.TwoViewGeometryOptions(compute_relative_pose=False)
    g = tvg.estimate_two_view_geometry(
        jax.random.PRNGKey(0), jnp.asarray(rays1), jnp.asarray(rays2),
        jnp.asarray(pix1), jnp.asarray(pix2), jnp.ones(n, bool),
        jnp.asarray(f, jnp.float32), opts,
        sizes1=jnp.asarray([w, h], jnp.float32),
        sizes2=jnp.asarray([w, h], jnp.float32))
    assert int(g.config) == int(tvg.TwoViewConfig.WATERMARK)

    # well-spread matches with real parallax are NOT watermarks
    X = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    X[:, 2] += 6
    uv1 = X[:, :2] / X[:, 2:]
    X2 = X + np.array([1.0, 0, 0])
    uv2 = X2[:, :2] / X2[:, 2:]
    p1 = (uv1 * f + [w / 2, h / 2]).astype(np.float32)
    p2 = (uv2 * f + [w / 2, h / 2]).astype(np.float32)
    g2 = tvg.estimate_two_view_geometry(
        jax.random.PRNGKey(0), jnp.asarray(uv1, jnp.float32),
        jnp.asarray(uv2, jnp.float32), jnp.asarray(p1), jnp.asarray(p2),
        jnp.ones(n, bool), jnp.asarray(f, jnp.float32), opts,
        sizes1=jnp.asarray([w, h], jnp.float32),
        sizes2=jnp.asarray([w, h], jnp.float32))
    assert int(g2.config) != int(tvg.TwoViewConfig.WATERMARK)


def test_multiple_two_view_geometries(rng):
    """Two independently moving planes -> MULTIPLE config with two models."""
    import jax
    import jax.numpy as jnp

    from colmap_tpu.estimators import two_view_geometry as tvg

    f, w, h = 500.0, 640.0, 480.0
    n_per = 100
    # plane A: static homography (pure rotation-ish shift)
    xyA1 = rng.uniform(50, 250, (n_per, 2)).astype(np.float32)
    xyA2 = xyA1 + np.array([40.0, -25.0], np.float32)
    # plane B: clearly different motion (15 deg rotation + 1.2x scale)
    ang = np.radians(15.0)
    RB = 1.2 * np.array([[np.cos(ang), -np.sin(ang)],
                         [np.sin(ang), np.cos(ang)]], np.float32)
    xyB1 = rng.uniform(350, 600, (n_per, 2)).astype(np.float32)
    xyB2 = (xyB1 - [450, 240]) @ RB.T + [430, 255]
    pix1 = np.concatenate([xyA1, xyB1])
    pix2 = np.concatenate([xyA2, xyB2])
    rays1 = (pix1 - [w / 2, h / 2]) / f
    rays2 = (pix2 - [w / 2, h / 2]) / f
    opts = tvg.TwoViewGeometryOptions(min_num_inliers=30, max_error_px=2.0,
                                      detect_watermark=False)
    geoms, config = tvg.estimate_multiple_two_view_geometries(
        jax.random.PRNGKey(0), jnp.asarray(rays1), jnp.asarray(rays2),
        jnp.asarray(pix1), jnp.asarray(pix2), jnp.ones(2 * n_per, bool),
        jnp.asarray(f, jnp.float32), opts)
    assert config == int(tvg.TwoViewConfig.MULTIPLE)
    assert len(geoms) >= 2
    # models capture disjoint inlier sets with meaningful support (an F can
    # partially explain both planar motions, so the split is not pure)
    m0 = np.asarray(geoms[0].inlier_mask)
    m1 = np.asarray(geoms[1].inlier_mask)
    assert not np.any(m0 & m1)
    assert int(geoms[0].num_inliers) >= 50
    assert int(geoms[1].num_inliers) >= 30
