"""Device-side LOST recovery in the fused streaming program.

The reference tracks a LOST state but its `Frontend::Reset` is an
unimplemented stub (frontend.cpp:723-731); the classic pipeline here
relocalizes on the host. The fused program must recover ON DEVICE: a burst
of blank frames mid-sequence drops tracking to zero, the constant-velocity
model carries the pose through the outage, and the first good frame
re-initializes a fresh keyframe into the existing map — with bounded
post-recovery trajectory error and the archive intact.
"""

import numpy as np
import pytest

from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
from stereovision_slam_tpu.slam.fused import (FusedVisualOdometry,
                                              UnrolledVisualOdometry)
from tests import synthetic
from tests.test_pipeline_frontend import small_config

BLANK = range(12, 17)  # 5 blanked frames mid-sequence


@pytest.fixture(scope="module")
def outage_scene():
    H, W = 188, 620
    rig = synthetic.make_stereo_rig()
    T = 30
    poses = synthetic.forward_motion_poses(T, step=0.5, yaw_rate=0.0)
    lefts, rights = synthetic.render_textured_stereo_sequence(
        poses, H=H, W=W, rig=rig)
    lefts = np.asarray(lefts).copy()
    rights = np.asarray(rights).copy()
    for i in BLANK:
        lefts[i] = 0.0
        rights[i] = 0.0
    return lefts, rights, list(rig), np.asarray(poses)


def _centers(pose):
    R, t = pose[:, :3], pose[:, 3]
    return -R.T @ t


@pytest.mark.parametrize("cls", [FusedVisualOdometry, UnrolledVisualOdometry])
def test_streaming_recovers_from_blank_burst(outage_scene, cls):
    lefts, rights, rig, poses = outage_scene
    cfg = small_config()
    kw = {"chunk_size": 5} if cls is UnrolledVisualOdometry else {}
    vo = cls(cfg, ArraySequenceDataset(lefts, rights, rig), **kw)
    vo.initialize()
    vo.run()
    keyframes, landmarks, frames = vo.drain()

    by_fid = {fid: out for fid, out in frames}
    # tracking collapsed during the outage...
    assert int(by_fid[BLANK[2]].n_inliers) <= cfg.num_features_tracking_bad
    # ...and came back: frames after recovery track normally again
    post = [int(by_fid[f].n_inliers) for f in range(BLANK[-1] + 2, 30)
            if f in by_fid]
    assert post and min(post) > cfg.num_features_needed_for_keyframe // 2, post
    # a recovery keyframe was inserted at/after the first good frame
    recovery_kfs = [fid for fid, _ in keyframes.values()
                    if fid >= BLANK[-1] + 1]
    assert recovery_kfs, "no keyframe after the outage"
    # keyframes from before the outage survive in the archive
    assert any(fid < BLANK[0] for fid, _ in keyframes.values())

    # bounded post-recovery ATE: compare est vs gt keyframe centers after the
    # outage; drift accrued during 5 blind frames (constant-velocity
    # extrapolation) must stay within a small fraction of the path length
    errs = []
    for fid, pose in keyframes.values():
        if fid >= BLANK[-1] + 1:
            errs.append(np.linalg.norm(
                _centers(pose) - _centers(poses[fid])))
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.60, f"post-recovery ATE {ate:.3f} m"


def test_blank_frames_do_not_spam_keyframes(outage_scene):
    """Every blank frame fails the re-init gate (no landmarks) — it must NOT
    consume keyframe ids or evict good keyframes."""
    lefts, rights, rig, poses = outage_scene
    cfg = small_config()
    vo = FusedVisualOdometry(cfg, ArraySequenceDataset(lefts, rights, rig))
    vo.initialize()
    vo.run()
    keyframes, landmarks, frames = vo.drain()
    blank_kfs = [fid for fid, _ in keyframes.values() if fid in BLANK]
    assert not blank_kfs, f"keyframes inserted on blank frames: {blank_kfs}"
