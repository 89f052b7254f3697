import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from colmap_tpu.geometry import rotation as rot
from colmap_tpu.geometry import rigid3, sim3


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotate_matches_scipy(rng):
    q = random_quats(rng, 64)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    got = np.asarray(rot.quat_rotate(jnp.array(q), jnp.array(v)))
    # scipy uses xyzw ordering
    want = R.from_quat(q[:, [1, 2, 3, 0]]).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_matrix_roundtrip(rng):
    q = random_quats(rng, 128)
    m = rot.quat_to_rotmat(jnp.array(q))
    q2 = np.asarray(rot.rotmat_to_quat(m))
    # same rotation up to sign
    dots = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_rotmat_orthonormal(rng):
    q = random_quats(rng, 32)
    m = np.asarray(rot.quat_to_rotmat(jnp.array(q)))
    eye = np.einsum("nij,nkj->nik", m, m)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_axis_angle_roundtrip(rng):
    aa = rng.normal(size=(64, 3)).astype(np.float32)
    q = rot.quat_from_axis_angle(jnp.array(aa))
    aa2 = np.asarray(rot.quat_to_axis_angle(q))
    want = R.from_rotvec(aa).as_rotvec()
    np.testing.assert_allclose(aa2, want, atol=1e-4)


def test_quat_multiply_matches_compose(rng):
    a = random_quats(rng, 16)
    b = random_quats(rng, 16)
    v = rng.normal(size=(16, 3)).astype(np.float32)
    ab = rot.quat_multiply(jnp.array(a), jnp.array(b))
    got = np.asarray(rot.quat_rotate(ab, jnp.array(v)))
    want = np.asarray(rot.quat_rotate(jnp.array(a), rot.quat_rotate(jnp.array(b), jnp.array(v))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rigid3_compose_inverse(rng):
    q = random_quats(rng, 16)
    t = rng.normal(size=(16, 3)).astype(np.float32)
    p = rigid3.make(jnp.array(q), jnp.array(t))
    x = jnp.array(rng.normal(size=(16, 3)).astype(np.float32))
    y = rigid3.apply(p, x)
    x2 = rigid3.apply(rigid3.inverse(p), y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)

    pq = rigid3.compose(p, rigid3.inverse(p))
    np.testing.assert_allclose(np.asarray(rigid3.trans(pq)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(rigid3.quat(pq))[:, 0]), 1.0, atol=1e-5)


def test_rigid3_matrix_roundtrip(rng):
    q = random_quats(rng, 16)
    t = rng.normal(size=(16, 3)).astype(np.float32)
    p = rigid3.make(jnp.array(q), jnp.array(t))
    m = rigid3.to_matrix(p)
    p2 = rigid3.from_matrix(m)
    x = jnp.array(rng.normal(size=(16, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(rigid3.apply(p, x)), np.asarray(rigid3.apply(p2, x)), atol=1e-5
    )


def test_projection_center(rng):
    q = random_quats(rng, 8)
    t = rng.normal(size=(8, 3)).astype(np.float32)
    p = rigid3.make(jnp.array(q), jnp.array(t))
    c = rigid3.projection_center(p)
    # cam_from_world applied to the center must be ~0
    np.testing.assert_allclose(np.asarray(rigid3.apply(p, c)), 0.0, atol=1e-5)


def test_sim3_apply_compose_inverse(rng):
    s = np.abs(rng.normal(size=16)).astype(np.float32) + 0.5
    q = random_quats(rng, 16)
    t = rng.normal(size=(16, 3)).astype(np.float32)
    p = sim3.make(jnp.array(s), jnp.array(q), jnp.array(t))
    x = jnp.array(rng.normal(size=(16, 3)).astype(np.float32))
    y = sim3.apply(p, x)
    x2 = sim3.apply(sim3.inverse(p), y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)


def test_sim3_transform_camera_world(rng):
    """Projections must be preserved when world is remapped by a Sim3."""
    s = np.float32(2.5)
    q = random_quats(rng, 1)[0]
    t = rng.normal(size=3).astype(np.float32)
    new_from_old = sim3.make(jnp.array(s), jnp.array(q), jnp.array(t))

    qc = random_quats(rng, 1)[0]
    tc = rng.normal(size=3).astype(np.float32)
    cam_from_old = rigid3.make(jnp.array(qc), jnp.array(tc))

    x_old = jnp.array(rng.normal(size=(10, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32))
    x_new = sim3.apply(new_from_old, x_old)

    cam_from_new = sim3.transform_rigid(new_from_old, cam_from_old)
    pc_old = np.asarray(rigid3.apply(cam_from_old, x_old))
    pc_new = np.asarray(rigid3.apply(cam_from_new, x_new))
    # same point up to scale => identical normalized projections
    np.testing.assert_allclose(
        pc_old[:, :2] / pc_old[:, 2:], pc_new[:, :2] / pc_new[:, 2:], atol=1e-4
    )


def test_quat_average(rng):
    q = random_quats(rng, 1)[0]
    qs = np.tile(q, (5, 1))
    avg = np.asarray(rot.quat_average(jnp.array(qs)))
    assert abs(abs(np.dot(avg, q)) - 1.0) < 1e-5
