"""Relocalization after tracking loss (the reference's Reset() is a stub)."""

import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
from stereovision_slam_tpu.slam.backend import Backend
from stereovision_slam_tpu.slam.config import SlamConfig
from stereovision_slam_tpu.slam import frontend as fe
from stereovision_slam_tpu.slam.pipeline import VisualOdometry
from stereovision_slam_tpu.utils.evaluation import camera_centers
from tests import synthetic


def test_relocalize_after_blank_frames():
    """Insert blank frames mid-sequence (tracking must go LOST), then resume
    with views matching the last keyframe -> pipeline relocalizes."""
    H, W, T = 188, 620, 18
    rig = synthetic.make_stereo_rig()
    fwd = synthetic.forward_motion_poses(10, step=0.4)
    # resume poses continue near pose 9 (where the last keyframes were)
    resume = [fwd[9]]
    import stereovision_slam_tpu.geometry.se3 as se3
    mv = se3.se3_exp(jnp.array([0., 0., -0.2, 0., 0., 0.]))
    for _ in range(4):
        resume.append(se3.se3_compose(mv, resume[-1]))
    poses_render = jnp.concatenate([fwd, jnp.stack(resume)])
    lefts, rights = synthetic.render_textured_stereo_sequence(
        poses_render, H=H, W=W, rig=rig)
    lefts, rights = np.asarray(lefts), np.asarray(rights)
    # splice 3 blank frames between frame 9 and the resume frames
    blank = np.full((3, H, W), 60.0, np.float32)
    lefts = np.concatenate([lefts[:10], blank, lefts[10:]])
    rights = np.concatenate([rights[:10], blank, rights[10:]])

    cfg = SlamConfig(num_features_needed_for_keyframe=120)
    ds = ArraySequenceDataset(lefts, rights, list(rig))
    vo = VisualOdometry(cfg, ds, backend=Backend())
    vo.initialize()
    statuses = []
    while vo.step():
        statuses.append(vo.status)
    assert fe.FrontendStatus.LOST in statuses, "blank frames must cause LOST"
    # after the resume frames the pipeline must be tracking again
    assert statuses[-1] in (fe.FrontendStatus.TRACKING_GOOD,
                            fe.FrontendStatus.TRACKING_BAD), statuses[-3:]
    # and the recovered pose must be near the resume ground truth
    est_c = camera_centers(np.asarray(vo.fs.T_cur)[None])[0]
    gt_c = camera_centers(np.asarray(poses_render[-1])[None])[0]
    assert np.linalg.norm(est_c - gt_c) < 0.5, np.linalg.norm(est_c - gt_c)
