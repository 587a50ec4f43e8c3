"""Viewer parity: the entity tree the reference renders must be emitted.

The reference logs, per map update (viewer.cpp:56-145): a pinhole frustum per
active keyframe at `world/stereosys{i}/cam_left` (newest first), the newest
keyframe's left image on `world/stereosys0/cam_left`, the active landmark
cloud at `world/landmarks`, and the full trajectory at `world/path`; text
logs go to `world/log` on the `currentframe_id` timeline, keyframe-rate logs
additionally on `max_keyframe_id` (viewer.cpp:147-190). Without the rerun
SDK the Viewer writes the same events to a JSONL transcript — asserted here.
"""

import json

import numpy as np
import pytest

from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
from stereovision_slam_tpu.slam.backend import Backend
from stereovision_slam_tpu.slam.pipeline import VisualOdometry
from stereovision_slam_tpu.viz.viewer import Viewer, _HAS_RERUN
from tests.test_pipeline_frontend import small_config
from tests import synthetic


@pytest.fixture(scope="module")
def transcript(tmp_path_factory):
    if _HAS_RERUN:
        pytest.skip("rerun installed; JSONL fallback not active")
    path = tmp_path_factory.mktemp("viz") / "viz.jsonl"
    rig = synthetic.make_stereo_rig()
    poses = synthetic.forward_motion_poses(12, step=0.4, yaw_rate=0.0)
    lefts, rights = synthetic.render_textured_stereo_sequence(
        poses, H=96, W=320, rig=rig)
    cfg = small_config()
    cfg.num_features_needed_for_keyframe = cfg.num_features + 1  # KF every frame
    viewer = Viewer(jsonl_path=str(path))
    vo = VisualOdometry(cfg, ArraySequenceDataset(
        np.asarray(lefts), np.asarray(rights), list(rig)),
        viewer=viewer, backend=Backend())
    vo.initialize()
    vo.run()
    viewer.close()
    return [json.loads(l) for l in path.read_text().splitlines()]


def test_pinhole_frusta_logged(transcript):
    pin = [e for e in transcript if e.get("archetype") == "Pinhole"]
    assert pin, "no pinhole frusta logged"
    # newest keyframe frustum plus at least one other in the window
    entities = {e["entity"] for e in pin}
    assert "world/stereosys0/cam_left" in entities
    assert "world/stereosys1/cam_left" in entities
    # focal length carries the camera intrinsics, resolution the image size
    assert pin[0]["focal_length"][0] > 0
    assert pin[0]["resolution"] == [320, 96]


def test_newest_keyframe_image_logged(transcript):
    imgs = [e for e in transcript if e.get("archetype") == "Image"]
    assert imgs, "no keyframe image logged"
    assert all(e["entity"] == "world/stereosys0/cam_left" for e in imgs)
    assert imgs[0]["shape"] == [96, 320]


def test_landmarks_and_path_logged(transcript):
    lm = [e for e in transcript if e.get("archetype") == "Points3D"]
    path = [e for e in transcript if e.get("archetype") == "LineStrips3D"]
    assert lm and lm[-1]["entity"] == "world/landmarks"
    assert lm[-1]["count"] > 20
    assert path and path[-1]["entity"] == "world/path"
    assert path[-1]["length"] >= 2


def test_mkf_timeline_logs(transcript):
    mkf = [e for e in transcript if e["event"] == "log_mkf"]
    assert mkf, "no max_keyframe_id-timeline logs"
    assert all("max_keyframe_id" in e for e in mkf)
    assert mkf[-1]["entity"] == "world/log"
    # keyframe ids increase along the run
    ids = [e["max_keyframe_id"] for e in mkf]
    assert ids == sorted(ids)


def test_plots_carry_both_timelines(transcript):
    plots = [e for e in transcript if e["event"] == "plot"]
    assert any(p["name"] == "plots/frontend_inlier_ratio" for p in plots)
    assert all("currentframe_id" in p and "max_keyframe_id" in p
               for p in plots)
