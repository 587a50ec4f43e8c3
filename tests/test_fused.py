"""Fused single-program SLAM step vs the classic pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
from stereovision_slam_tpu.slam.backend import Backend
from stereovision_slam_tpu.slam.fused import FusedVisualOdometry
from stereovision_slam_tpu.slam.pipeline import VisualOdometry
from stereovision_slam_tpu.utils.evaluation import ate_rmse
from tests import synthetic
from tests.test_pipeline_frontend import small_config


@pytest.fixture(scope="module")
def scene():
    key = jax.random.PRNGKey(17)
    H, W = 120, 320
    rig = synthetic.make_stereo_rig(fx=260.0, fy=260.0, cx=160.0, cy=60.0)
    poses = synthetic.forward_motion_poses(14, step=0.5, yaw_rate=0.012)
    lms = jnp.concatenate([
        synthetic.random_landmarks(jax.random.PRNGKey(40), 80, z_range=(4, 40)),
        synthetic.random_landmarks(jax.random.PRNGKey(41), 60,
                                   z_range=(10, 50)) + jnp.array([0., 0., 6.]),
    ])
    lefts, rights = synthetic.render_stereo_sequence(key, poses, lms, H=H,
                                                     W=W, rig=rig)
    return np.asarray(lefts), np.asarray(rights), list(rig), poses


def test_fused_runs_and_is_accurate(scene):
    lefts, rights, rig, poses = scene
    vo = FusedVisualOdometry(small_config(), ArraySequenceDataset(lefts, rights, rig))
    vo.initialize()
    vo.run()
    keyframes, landmarks, frames = vo.drain()
    assert len(keyframes) >= 2
    assert len(landmarks) > 20
    gt = {i: np.asarray(poses[i]) for i in range(poses.shape[0])}
    est = {fid: pose for fid, pose in keyframes.values()}
    err = ate_rmse(est, gt, align=False)
    assert err < 0.15, f"fused ATE {err:.3f}"
    # per-frame outputs sane
    n_in = [int(f.n_inliers) for _, f in frames]
    assert all(v > 0 for v in n_in)


def test_fused_matches_classic(scene):
    lefts, rights, rig, poses = scene
    cfg = small_config()

    classic = VisualOdometry(cfg, ArraySequenceDataset(lefts, rights, rig),
                             backend=Backend())
    classic.initialize()
    classic.run()

    fused = FusedVisualOdometry(cfg, ArraySequenceDataset(lefts, rights, rig))
    fused.initialize()
    fused.run()
    keyframes, landmarks, frames = fused.drain()

    est_f = {fid: pose for fid, pose in keyframes.values()}
    est_c = classic.trajectory()
    # same keyframe selection
    assert set(est_f.keys()) == set(est_c.keys())
    for fid in est_f:
        np.testing.assert_allclose(est_f[fid], est_c[fid], atol=5e-3)


def test_warm_drain_is_pure_and_bucket_tolerant(scene):
    """warm_drain pre-loads the packed-drain executable (round-5 bench
    setup); it must not disturb streaming state, and a WRONG bucket hint
    must still leave drain() exact (it just pays a fresh executable)."""
    lefts, rights, rig, poses = scene
    cfg = small_config()

    ref = FusedVisualOdometry(cfg, ArraySequenceDataset(lefts, rights, rig))
    ref.initialize()
    ref.run()
    kf_ref, lm_ref, _ = ref.drain()

    vo = FusedVisualOdometry(cfg, ArraySequenceDataset(lefts, rights, rig))
    vo.initialize()
    assert vo.step()
    # mid-stream warm with deliberately mismatched hints
    vo.warm_drain(kf_hint=5, lm_hint=100, frame_hint=4, loop_hint=1)
    vo.run()
    keyframes, landmarks, _ = vo.drain()
    assert set(keyframes.keys()) == set(kf_ref.keys())
    for k in keyframes:
        np.testing.assert_array_equal(keyframes[k][1], kf_ref[k][1])
    assert set(landmarks.keys()) == set(lm_ref.keys())
