"""Sequential matching with vocab-tree loop detection.

Reference: SequentialPairGenerator loop detection
(feature/pairing.h:89-110, pairing.cc): every `loop_detection_period`
images the visual index is queried and retrieval pairs are appended to
the temporal-overlap pairs. The fixture is a camera path that returns to
its start — the temporal window alone never connects the loop ends.
"""

import numpy as np
import pytest

from colmap_tpu.controllers import feature_extraction as fe
from colmap_tpu.controllers import feature_matching as fm
from colmap_tpu.features import pairing as pairing_mod
from colmap_tpu.features import sift as sift_mod
from colmap_tpu.scene import synthetic_images as synth
from colmap_tpu.scene.database import Database


@pytest.fixture(scope="module")
def loop_db(tmp_path_factory):
    """A 7-frame sequence whose last frame revisits the first pose."""
    opts = synth.RoomDatasetOptions(num_images=6, width=320, height=240,
                                    focal=280.0, seed=5)
    images, K, Rs, ts = synth.render_room_dataset(opts)
    seq = list(images) + [images[0]]  # frame 6 closes the loop
    image_dir = str(tmp_path_factory.mktemp("loop_images"))
    synth.write_dataset(image_dir, seq)

    db = Database(":memory:")
    fe.run_feature_extraction(
        db, image_dir,
        fe.ImageReaderOptions(camera_model="PINHOLE", single_camera=True,
                              camera_params=",".join(map(str, [
                                  K[0, 0], K[1, 1], K[0, 2], K[1, 2]]))),
        sift_mod.SiftExtractionOptions(max_image_size=640,
                                       max_num_features=1024,
                                       octave_capacity=1024))
    ids = [iid for iid, im in sorted(db.read_images().items(),
                                     key=lambda kv: kv[1]["name"])]
    return db, ids


def test_loop_detection_pairs_connect_sequence_ends(loop_db):
    db, ids = loop_db
    popts = pairing_mod.SequentialPairingOptions(
        overlap=1, quadratic_overlap=False, loop_detection=True,
        loop_detection_period=7, loop_detection_num_images=3)
    loop_pairs = pairing_mod.sequential_loop_detection_pairs(
        db, ids, popts, seed=0)
    # the 7th (last) frame is the only query; its top retrievals must
    # include the FIRST frame (identical pose), which is 6 steps away —
    # far outside the temporal overlap of 1
    assert (min(ids[0], ids[-1]), max(ids[0], ids[-1])) in loop_pairs


def test_sequential_matching_closes_the_loop(loop_db):
    db, ids = loop_db
    first_last = (min(ids[0], ids[-1]), max(ids[0], ids[-1]))
    mopts = fm.FeatureMatchingOptions(feature_capacity=1024)

    # without loop detection the loop-closing pair is never matched
    stats0 = fm.match_sequential(db, mopts, pairing_mod.SequentialPairingOptions(
        overlap=1, quadratic_overlap=False))
    assert db.read_two_view_geometry(*first_last) is None

    stats1 = fm.match_sequential(db, mopts, pairing_mod.SequentialPairingOptions(
        overlap=1, quadratic_overlap=False, loop_detection=True,
        loop_detection_period=7, loop_detection_num_images=3))
    g = db.read_two_view_geometry(*first_last)
    assert g is not None and len(g["inlier_matches"]) >= 15, (
        "loop pair not verified")
    # the second run skips the already-matched temporal pairs (reference
    # FeatureMatcherCache behavior), so its stats count only the NEW
    # loop-closure pairs the vocab tree surfaced
    assert stats0.num_verified_pairs >= 1
    assert stats1.num_verified_pairs >= 1


def test_sequential_matching_options_reference_names():
    """The loop-detection flags carry the reference's option names
    (feature/pairing.h:89-113)."""
    from colmap_tpu.controllers.option_manager import OptionManager

    om = OptionManager()
    seq = om.SequentialMatching
    assert hasattr(seq, "loop_detection")
    assert seq.loop_detection_period == 10
    assert seq.loop_detection_num_images == 50
    assert seq.loop_detection_max_num_features == -1
    assert seq.vocab_tree_path == ""
