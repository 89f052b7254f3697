"""BaseController Stop/Pause semantics + pipeline stop-check injection.

Reference: src/colmap/util/base_controller.h:42, util/threading.h:97.
"""

import threading
import time

import numpy as np

from colmap_tpu.controllers.incremental_pipeline import (
    IncrementalPipeline,
    IncrementalPipelineOptions,
)
from colmap_tpu.scene.database import Database
from colmap_tpu.scene.synthetic import SyntheticDatasetOptions, synthesize_dataset
from colmap_tpu.util.controller import (
    BaseController,
    FINISHED_CALLBACK,
    STARTED_CALLBACK,
)


def test_base_controller_stop_pause():
    c = BaseController()
    fired = []
    c.add_callback(STARTED_CALLBACK, lambda: fired.append("start"))
    c.callback(STARTED_CALLBACK)
    assert fired == ["start"]
    assert not c.is_stopped()
    c.request_pause()
    assert c.is_paused()
    # a paused check blocks until resume
    out = []

    def worker():
        out.append(c.check_if_stopped())

    t = threading.Thread(target=worker)
    t.start()
    time.sleep(0.05)
    assert not out  # blocked
    c.resume()
    t.join(timeout=2)
    assert out == [False]
    c.request_stop()
    assert c.check_if_stopped()
    c.reset_control()
    assert not c.is_stopped() and not c.is_paused()


def test_stop_unblocks_paused_controller():
    c = BaseController()
    c.request_pause()
    out = []
    t = threading.Thread(target=lambda: out.append(c.check_if_stopped()))
    t.start()
    time.sleep(0.05)
    c.request_stop()  # stop while paused must unblock
    t.join(timeout=2)
    assert out == [True]


def test_pipeline_stop_returns_partial_model():
    db = Database(":memory:")
    synthesize_dataset(SyntheticDatasetOptions(num_images=10,
                                               num_points3D=150, seed=2), db)
    pipeline = IncrementalPipeline(db)
    stop_after = 4

    def on_image(_):
        if len(registered) >= stop_after - 1:
            pipeline.request_stop()
        registered.append(1)

    registered = []
    pipeline.next_image_callback = on_image
    rec = pipeline.run()
    assert rec is not None
    # stopped early: more than the init pair, fewer than all images
    assert 2 <= rec.num_registered_images() < 10
