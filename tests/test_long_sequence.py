"""Long-sequence stress: evictions + archives at scale, bounded drift."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
from stereovision_slam_tpu.slam.config import SlamConfig
from stereovision_slam_tpu.slam.fused import FusedVisualOdometry
from stereovision_slam_tpu.utils.evaluation import ate_rmse
from tests import synthetic


pytestmark = pytest.mark.slow  # >30 s e2e; -m "not slow" for the quick suite


def test_long_corridor_bounded_drift():
    H, W, T = 188, 620, 150
    rig = synthetic.make_stereo_rig()
    poses = synthetic.forward_motion_poses(T, step=0.4, yaw_rate=0.0)
    lefts, rights = synthetic.render_textured_stereo_sequence(
        poses, H=H, W=W, rig=rig)
    ds = ArraySequenceDataset(np.asarray(lefts), np.asarray(rights), list(rig))
    vo = FusedVisualOdometry(SlamConfig(), ds)
    vo.initialize()
    vo.run()
    keyframes, landmarks, frames = vo.drain()
    n_in = np.array([int(f.n_inliers) for _, f in frames])
    assert n_in[1:].min() > 30, "tracking degraded"
    assert len(keyframes) > 10, "eviction path not exercised"
    gt = {i: np.asarray(poses[i]) for i in range(T)}
    est = {fid: pose for fid, pose in keyframes.values()}
    err = ate_rmse(est, gt, align=False)
    dist = 0.4 * T
    assert err / dist < 0.02, f"drift {100*err/dist:.2f}% over {dist:.0f}m"
