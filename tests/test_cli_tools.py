"""CLI + model/database tools + Python API tests.

Reference: exe/colmap.cc (command dispatch), exe/model.cc (tools),
pycolmap pipeline functions.
"""

import json
import os

import numpy as np
import pytest

from colmap_tpu import cli
from colmap_tpu.scene import reconstruction_io as rio
from colmap_tpu.scene import synthetic
from colmap_tpu.scene.database import Database
from colmap_tpu.tools import database_tools, model_tools


@pytest.fixture(scope="module")
def gt_model(tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("cli_db")
    db_path = str(db_dir / "database.db")
    db = Database(db_path)
    opts = synthetic.SyntheticDatasetOptions(
        num_cameras=1, num_images=8, num_points3D=150, seed=4)
    gt = synthetic.synthesize_dataset(opts, db)
    db.close()
    model_dir = str(db_dir / "model")
    os.makedirs(model_dir, exist_ok=True)
    rio.write_model(gt, model_dir, ext=".bin")
    return dict(db_path=db_path, model_dir=model_dir, gt=gt)


def test_cli_lists_all_reference_commands():
    expected = {
        "gui", "automatic_reconstructor", "bundle_adjuster",
        "color_extractor", "database_cleaner", "database_creator",
        "database_merger", "delaunay_mesher", "exhaustive_matcher",
        "feature_extractor", "feature_importer", "hierarchical_mapper",
        "image_deleter", "image_filterer", "image_rectifier",
        "image_registrator", "image_undistorter",
        "image_undistorter_standalone", "mapper", "matches_importer",
        "model_aligner", "model_analyzer", "model_comparer",
        "model_converter", "model_cropper", "model_merger",
        "model_orientation_aligner", "model_splitter", "model_transformer",
        "patch_match_stereo", "point_filtering", "point_triangulator",
        "pose_prior_mapper", "poisson_mesher", "project_generator",
        "rig_bundle_adjuster", "sequential_matcher", "spatial_matcher",
        "stereo_fusion", "transitive_matcher", "vocab_tree_builder",
        "vocab_tree_matcher", "vocab_tree_retriever",
    }
    assert expected <= set(cli.COMMANDS.keys())


def test_model_analyzer_cli(gt_model, capsys):
    assert cli.main(["model_analyzer", "--path", gt_model["model_dir"]]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["num_registered_images"] == 8
    assert stats["num_points3D"] > 100


def test_model_converter_formats(gt_model, tmp_path):
    for fmt, out in [("TXT", str(tmp_path / "txt")),
                     ("PLY", str(tmp_path / "m.ply")),
                     ("NVM", str(tmp_path / "m.nvm")),
                     ("Bundler", str(tmp_path / "m.out")),
                     ("VRML", str(tmp_path / "m.wrl")),
                     ("HTML", str(tmp_path / "m.html"))]:
        assert cli.main(["model_converter", "--input_path",
                         gt_model["model_dir"], "--output_path", out,
                         "--output_type", fmt]) == 0
        assert os.path.exists(out if fmt != "TXT" else out + "/cameras.txt")
    # text round-trip
    rec = rio.read_model(str(tmp_path / "txt"))
    assert rec.num_registered_images() == 8
    # the HTML viewer embeds the model: decode its base64 buffers back
    import base64
    import re

    html = open(str(tmp_path / "m.html")).read()
    b64s = re.findall(r'decode\("([A-Za-z0-9+/=]*)"', html)
    assert len(b64s) == 3
    pts = np.frombuffer(base64.b64decode(b64s[0]), np.float32).reshape(-1, 3)
    cols = np.frombuffer(base64.b64decode(b64s[1]), np.uint8).reshape(-1, 3)
    frusta = np.frombuffer(base64.b64decode(b64s[2]), np.float32).reshape(-1, 3)
    assert len(pts) == len(rec.points3D) and len(cols) == len(pts)
    # 8 segments (16 endpoints) per registered camera
    assert len(frusta) == 16 * rec.num_registered_images()
    assert "webgl" in html


def test_model_transformer_and_comparer(gt_model, tmp_path, capsys):
    out = str(tmp_path / "transformed")
    t = "2.0,1,0,0,0,5,0,0"
    assert cli.main(["model_transformer", "--input_path",
                     gt_model["model_dir"], "--output_path", out,
                     "--transform", t]) == 0
    # compare: transformed vs original must align perfectly (Sim3 invariance)
    assert cli.main(["model_comparer", "--input_path1", out,
                     "--input_path2", gt_model["model_dir"]]) == 0
    res = json.loads(capsys.readouterr().out)
    # f32 Sim3 estimation precision bounds the residual
    assert res["max_rotation_error_deg"] < 0.05
    assert res["max_proj_center_error"] < 5e-3


def test_model_cropper_and_splitter(gt_model, tmp_path):
    rec = gt_model["gt"]
    xyz = np.stack([p.xyz for p in rec.points3D.values()])
    mid = np.median(xyz, 0)
    cropped = model_tools.crop_model(rec, xyz.min(0) - 1, mid)
    assert 0 < len(cropped.points3D) < len(rec.points3D)
    subs = model_tools.split_model(rec, (2, 1, 1))
    assert len(subs) == 2
    total = sum(len(s.points3D) for s in subs)
    assert total >= len(rec.points3D) * 0.9


def test_model_aligner(gt_model):
    rec = gt_model["gt"]
    # target positions: GT centers in a scaled/shifted frame
    import copy

    target = {}
    for iid in rec.registered_image_ids():
        c = rec.images[iid].projection_center()
        target[rec.images[iid].name] = 3.0 * c + np.array([10.0, -5.0, 2.0])
    moved = model_tools.align_model_to_positions(copy.deepcopy(rec), target,
                                                 max_error=0.05)
    assert moved is not None
    for iid in moved.registered_image_ids():
        c = moved.images[iid].projection_center()
        np.testing.assert_allclose(c, target[moved.images[iid].name], atol=1e-2)


def test_point_triangulator_cli(gt_model, tmp_path):
    # strip the points from the GT model, re-triangulate from the database
    import copy

    rec = copy.deepcopy(gt_model["gt"])
    for pid in list(rec.points3D):
        rec.delete_point3D(pid)
    stripped = str(tmp_path / "stripped")
    rio.write_model(rec, stripped, ext=".bin")
    os.makedirs(stripped, exist_ok=True)
    out = str(tmp_path / "triangulated")
    assert cli.main(["point_triangulator", "--database_path",
                     gt_model["db_path"], "--input_path", stripped,
                     "--output_path", out]) == 0
    tri = rio.read_model(out)
    assert len(tri.points3D) > 100
    # triangulated points must match GT
    gt_pts = {tuple(sorted(p.track))[:2]: p.xyz
              for p in gt_model["gt"].points3D.values()}
    errs = []
    for p in tri.points3D.values():
        key = tuple(sorted(p.track))[:2]
        if key in gt_pts:
            errs.append(np.linalg.norm(p.xyz - gt_pts[key]))
    assert len(errs) > 50
    assert np.median(errs) < 0.05


def test_database_tools(gt_model, tmp_path):
    db1 = Database(gt_model["db_path"])
    n_img = len(db1.read_images())
    db2_path = str(tmp_path / "db2.db")
    db2 = Database(db2_path)
    synthetic.synthesize_dataset(
        synthetic.SyntheticDatasetOptions(num_cameras=1, num_images=3,
                                          num_points3D=50, seed=9), db2)
    merged = Database(str(tmp_path / "merged.db"))
    database_tools.merge_databases(db1, db2, merged)
    assert len(merged.read_images()) == n_img + 3
    # names unique, descriptors preserved
    for iid in merged.read_images():
        assert merged.read_keypoints(iid) is not None

    database_tools.clean_database(merged, "matches")
    assert merged.num_verified_pairs() == 0
    assert merged.read_keypoints(1) is not None


def test_project_generator_roundtrip(tmp_path):
    ini = str(tmp_path / "project.ini")
    assert cli.main(["project_generator", "--output_path", ini,
                     "--SiftExtraction.max_num_features", "1234"]) == 0
    from colmap_tpu.controllers.option_manager import OptionManager

    om = OptionManager()
    om.read(ini)
    assert om.SiftExtraction.max_num_features == 1234


def test_option_manager_flat_key_routes_once():
    """A flat key shared by several nested option groups must update only
    ONE of them (first in field order), mirroring _scalar_items' collision
    rule — not silently update both."""
    import dataclasses as dc

    from colmap_tpu.controllers.option_manager import (
        _apply_updates,
        _scalar_items,
    )

    @dc.dataclass
    class SubA:
        shared: int = 1
        only_a: int = 10

    @dc.dataclass
    class SubB:
        shared: int = 2
        deep_only: int = 20

    @dc.dataclass
    class SubC:
        nested: SubB = dc.field(default_factory=SubB)

    @dc.dataclass
    class Top:
        own: int = 0
        a: SubA = dc.field(default_factory=SubA)
        b: SubB = dc.field(default_factory=SubB)
        c: SubC = dc.field(default_factory=SubC)

    top = _apply_updates(Top(), {"shared": 99, "own": 5})
    assert top.own == 5
    assert top.a.shared == 99  # first nested group wins
    assert top.b.shared == 2   # sibling untouched
    # flattening is exactly ONE level deep: SubB.deep_only under SubC is
    # not exposed, and not updated
    names = [n for n, _ in _scalar_items(Top())]
    assert "deep_only" in names          # b.deep_only (level 1)
    assert names.count("shared") == 1    # collision collapsed
    top2 = _apply_updates(Top(), {"nested": 1})  # no scalar target
    assert top2.c.nested.shared == 2


def test_api_bundle_adjustment(gt_model, rng):
    """pycolmap-parity bundle_adjustment: perturb poses+points, recover."""
    import copy

    from colmap_tpu import api
    from colmap_tpu.estimators.similarity_transform import compare_reconstructions

    rec = copy.deepcopy(gt_model["gt"])
    for pid in rec.points3D:
        rec.points3D[pid].xyz = rec.points3D[pid].xyz + rng.normal(0, 0.02, 3)
    out = api.bundle_adjustment(rec)
    cmp = compare_reconstructions(out, gt_model["gt"])
    assert cmp["max_rotation_error_deg"] < 0.2
    # point error after BA should be small
    errs = [np.linalg.norm(out.points3D[p].xyz - gt_model["gt"].points3D[p].xyz)
            for p in out.points3D]
    assert np.median(errs) < 5e-3
