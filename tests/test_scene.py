import numpy as np
import pytest

from colmap_tpu.scene.database import (
    Database,
    image_pair_to_pair_id,
    pair_id_to_image_pair,
)
from colmap_tpu.scene.reconstruction import Camera, Image, Reconstruction
from colmap_tpu.scene import reconstruction_io as rio
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset
from colmap_tpu.sensor import models as cm


def make_rec(rng):
    rec = Reconstruction()
    rec.add_camera(
        Camera(camera_id=1, model_id=int(cm.CameraModelId.SIMPLE_RADIAL),
               width=640, height=480, params=np.array([700.0, 320.0, 240.0, 0.01]))
    )
    for i in range(1, 4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        rec.add_image(
            Image(
                image_id=i,
                name=f"im{i}.jpg",
                camera_id=1,
                cam_from_world=np.concatenate([q, rng.normal(size=3)]),
                xys=rng.uniform(0, 640, size=(5, 2)),
                point3D_ids=np.full(5, -1, dtype=np.int64),
            )
        )
    rec.add_point3D(rng.normal(size=3), [(1, 0), (2, 1)], color=[10, 20, 30], error=0.5)
    rec.add_point3D(rng.normal(size=3), [(2, 2), (3, 0), (1, 3)], color=[1, 2, 3], error=1.5)
    return rec


@pytest.mark.parametrize("ext", [".bin", ".txt"])
def test_reconstruction_io_roundtrip(tmp_path, rng, ext):
    rec = make_rec(rng)
    rio.write_model(rec, tmp_path, ext=ext)
    rec2 = rio.read_model(tmp_path)
    assert set(rec2.cameras) == {1}
    assert rec2.cameras[1].model_name == "SIMPLE_RADIAL"
    np.testing.assert_allclose(rec2.cameras[1].params, rec.cameras[1].params)
    assert set(rec2.images) == {1, 2, 3}
    for i in rec.images:
        np.testing.assert_allclose(
            rec2.images[i].cam_from_world, rec.images[i].cam_from_world, rtol=1e-12
        )
        np.testing.assert_allclose(rec2.images[i].xys, rec.images[i].xys, rtol=1e-12)
        np.testing.assert_array_equal(rec2.images[i].point3D_ids, rec.images[i].point3D_ids)
    assert set(rec2.points3D) == set(rec.points3D)
    for pid in rec.points3D:
        np.testing.assert_allclose(rec2.points3D[pid].xyz, rec.points3D[pid].xyz)
        assert rec2.points3D[pid].track == rec.points3D[pid].track


def test_ply_export(tmp_path, rng):
    rec = make_rec(rng)
    rio.write_ply(rec, tmp_path / "points.ply")
    data = (tmp_path / "points.ply").read_bytes()
    assert data.startswith(b"ply")
    assert b"element vertex 2" in data


def test_pair_id_roundtrip():
    for a, b in [(1, 2), (7, 3), (100, 100000)]:
        pid = image_pair_to_pair_id(a, b)
        lo, hi = min(a, b), max(a, b)
        assert pair_id_to_image_pair(pid) == (lo, hi)


def test_database_roundtrip(rng):
    with Database(":memory:") as db:
        cid = db.write_camera(2, 640, 480, np.array([700.0, 320, 240, 0.01]), True)
        iid1 = db.write_image("a.jpg", cid)
        iid2 = db.write_image("b.jpg", cid)
        kp = rng.uniform(0, 640, size=(10, 2)).astype(np.float32)
        db.write_keypoints(iid1, kp)
        desc = rng.integers(0, 256, size=(10, 128)).astype(np.uint8)
        db.write_descriptors(iid1, desc)
        matches = np.array([[0, 1], [2, 3], [4, 5]], dtype=np.uint32)
        db.write_matches(iid1, iid2, matches)
        db.write_two_view_geometry(iid1, iid2, matches[:2], config=2, E=np.eye(3))
        db.write_pose_prior(iid1, np.array([1.0, 2.0, 3.0]))

        np.testing.assert_allclose(db.read_keypoints(iid1), kp)
        np.testing.assert_array_equal(db.read_descriptors(iid1), desc)
        np.testing.assert_array_equal(db.read_matches(iid1, iid2), matches)
        # reversed order swaps columns
        np.testing.assert_array_equal(db.read_matches(iid2, iid1), matches[:, ::-1])
        tvg = db.read_two_view_geometry(iid1, iid2)
        assert tvg["config"] == 2
        np.testing.assert_array_equal(tvg["inlier_matches"], matches[:2])
        priors = db.read_pose_priors()
        np.testing.assert_allclose(priors[iid1]["position"], [1.0, 2.0, 3.0])
        cams = db.read_cameras()
        assert cams[cid]["model_id"] == 2
        assert db.num_images() == 2
        assert db.num_matched_pairs() == 1


def test_synthetic_dataset_consistency():
    opts = SyntheticDatasetOptions(num_images=8, num_points3D=80, point2D_stddev=0.0)
    db = Database(":memory:")
    rec = synthesize_dataset(opts, db)
    assert rec.num_registered_images() == 8
    assert len(rec.points3D) > 40
    # reprojection of GT points through GT poses hits the stored keypoints
    import jax.numpy as jnp

    from colmap_tpu.geometry import rigid3
    from colmap_tpu.sensor import models as cmod

    for pid, pt in list(rec.points3D.items())[:20]:
        for image_id, p2d_idx in pt.track:
            im = rec.images[image_id]
            cam = rec.cameras[im.camera_id]
            p_cam = np.asarray(
                rigid3.apply(jnp.asarray(im.cam_from_world, jnp.float32), jnp.asarray(pt.xyz, jnp.float32))
            )
            xy = np.asarray(
                cmod.project(cam.model_id, jnp.asarray(cam.padded_params()), jnp.asarray(p_cam, jnp.float32))
            )
            np.testing.assert_allclose(xy, im.xys[p2d_idx], atol=0.1)

    # matches in the database connect keypoints of the same GT point
    m = db.read_matches(1, 2)
    assert m is not None and len(m) > 0
    assert db.num_matched_pairs() == 8 * 7 // 2


def test_synthetic_dataset_outliers():
    opts = SyntheticDatasetOptions(num_images=6, num_points3D=60, inlier_match_ratio=0.7, seed=3)
    db = Database(":memory:")
    synthesize_dataset(opts, db)
    assert db.num_matched_pairs() == 15


def test_normalize(rng):
    opts = SyntheticDatasetOptions(num_images=8, num_points3D=50)
    rec = synthesize_dataset(opts)
    rec.transform(np.array([3.0, 1, 0, 0, 0, 5.0, -2.0, 1.0]))
    rec.normalize()
    centers = np.stack([rec.images[i].projection_center() for i in rec.registered_image_ids()])
    extent = np.linalg.norm(np.max(centers, 0) - np.min(centers, 0))
    assert 5.0 < extent < 20.0


def test_camera_database_sensor_widths():
    """Table-driven EXIF sensor-width lookup parity with the reference
    QuerySensorWidth rules (sensor/database.cc:40-85, specs.cc table)."""
    from colmap_tpu.sensor.camera_database import load_specs, query_sensor_width

    specs = load_specs()
    total = sum(len(v) for v in specs.values())
    assert total > 3000, total  # the full reference-scale table shipped

    # resolvable make/model pairs across several makes (values from the
    # table; note the reference's own matching rules make short model
    # names like "EOS 5D" ambiguous against their Mark-II/III variants)
    for make, model in [("Canon", "EOS 5DS R"),
                        ("NIKON CORPORATION", "NIKON D90"),
                        ("Canon", "Canon EOS 7D"),
                        ("FUJIFILM", "X-T1"),
                        ("NIKON", "D750")]:
        w = query_sensor_width(make, model)
        assert w is not None and 3.0 < w < 40.0, (make, model, w)

    # cleaning rules: separators and duplicated make are stripped
    assert query_sensor_width("Canon", "Canon EOS-7D") == \
        query_sensor_width("canon", "eos7d")
    # unknown model -> None (no unique match)
    assert query_sensor_width("Canon", "definitely-not-a-camera-xyz") is None
    assert query_sensor_width("", "") is None
    # empty make must NOT vacuously substring-match every manufacturer:
    # only an exact unique model match resolves without a make ("OS 5DS R"
    # is a substring of Canon's eos5dsr but not exact -> None)
    assert query_sensor_width("", "OS 5DS R") is None
    # ... but an exact unique model match without make still resolves
    assert query_sensor_width("", "D90") == \
        query_sensor_width("NIKON CORPORATION", "NIKON D90")
    # empty model never matches
    assert query_sensor_width("Canon", "") is None


def test_exif_focal_from_sensor_db(tmp_path):
    """EXIF FocalLength + make/model resolves through the specs table."""
    from PIL import Image
    from colmap_tpu.sensor import bitmap as bm

    path = str(tmp_path / "cam.jpg")
    im = Image.new("L", (640, 480))
    exif = Image.Exif()
    from PIL.ExifTags import Base
    exif[Base.Make] = "Canon"
    exif[Base.Model] = "Canon EOS 7D"
    exif[Base.FocalLength] = 50.0
    im.save(path, exif=exif)
    b = bm.read_bitmap(path)
    w = __import__("colmap_tpu.sensor.camera_database",
                   fromlist=["query_sensor_width"]).query_sensor_width(
        "Canon", "EOS 7D")
    assert b.exif_focal_px is not None
    np.testing.assert_allclose(b.exif_focal_px, 640 * 50.0 / w, rtol=1e-6)
