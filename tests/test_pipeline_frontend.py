"""End-to-end frontend-only VO on a synthetic blob world with known poses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
from stereovision_slam_tpu.slam.config import SlamConfig
from stereovision_slam_tpu.slam.pipeline import VisualOdometry
from stereovision_slam_tpu.slam import frontend as fe
from stereovision_slam_tpu.utils.evaluation import ate_rmse
from tests import synthetic


def small_config():
    return SlamConfig(
        num_features=60, num_features_init=20, num_features_tracking=25,
        num_features_tracking_bad=10, num_features_needed_for_keyframe=55,
        max_features=96, max_landmarks=1024, max_keyframes_window=8,
        num_active_keyframes=5, lk_num_levels=3, gftt_min_distance=10,
        image_height=120, image_width=320,
    )


@pytest.fixture(scope="module")
def synthetic_run():
    key = jax.random.PRNGKey(42)
    H, W = 120, 320
    rig = synthetic.make_stereo_rig(fx=260.0, fy=260.0, cx=160.0, cy=60.0)
    T = 12
    poses = synthetic.forward_motion_poses(T, step=0.45, yaw_rate=0.01)
    k1, k2 = jax.random.split(key)
    # two landmark fields so new points appear as the rig advances
    lm1 = synthetic.random_landmarks(k1, 70, x_range=(-12, 12),
                                    y_range=(-4, 4), z_range=(4, 40))
    lm2 = synthetic.random_landmarks(k2, 50, x_range=(-12, 12),
                                    y_range=(-4, 4), z_range=(8, 45))
    lm2 = lm2 + jnp.array([0.0, 0.0, 5.0])
    landmarks = jnp.concatenate([lm1, lm2])
    lefts, rights = synthetic.render_stereo_sequence(
        key, poses, landmarks, H=H, W=W, rig=rig)

    ds = ArraySequenceDataset(np.asarray(lefts), np.asarray(rights),
                              list(rig))
    vo = VisualOdometry(small_config(), ds)
    vo.initialize()
    vo.run()
    return vo, poses


def test_initializes_and_tracks(synthetic_run):
    vo, poses = synthetic_run
    assert vo.status in (fe.FrontendStatus.TRACKING_GOOD,
                         fe.FrontendStatus.TRACKING_BAD)
    assert len(vo.archived_keyframes) >= 2
    assert len(vo.archived_landmarks) > 20


def test_trajectory_accuracy(synthetic_run):
    vo, poses = synthetic_run
    est = vo.trajectory()
    gt = {i: np.asarray(poses[i]) for i in range(poses.shape[0])}
    err = ate_rmse(est, gt, align=False)
    # 12 frames x 0.45m forward motion: sub-decimeter without BA
    assert err < 0.15, f"ATE RMSE {err:.3f} m"


def test_outputs_roundtrip(tmp_path, synthetic_run):
    vo, _ = synthetic_run
    vo.cfg.output_dir = str(tmp_path)
    out = vo.save_output(timestamped_subdir=False)
    from stereovision_slam_tpu.slam.outputs import load_keyframes_file
    from stereovision_slam_tpu.io.pcd import read_pcd
    ddir, lcam, frames = load_keyframes_file(f"{out}/keyframes.txt")
    assert lcam == 0
    assert len(frames) == len(vo.archived_keyframes)
    ids = [fid for fid, _ in frames]
    assert ids == sorted(ids)
    pts, _ = read_pcd(f"{out}/landmarks.pcd")
    assert len(pts) == len(vo.archived_landmarks)
    assert np.all(np.isfinite(pts))


def _flat_first_sequence():
    """Frame 0 is featureless (stereo init must fail); frames 1.. textured."""
    key = jax.random.PRNGKey(7)
    H, W = 120, 320
    rig = synthetic.make_stereo_rig(fx=260.0, fy=260.0, cx=160.0, cy=60.0)
    T = 6
    poses = synthetic.forward_motion_poses(T, step=0.4)
    landmarks = synthetic.random_landmarks(key, 90, x_range=(-12, 12),
                                           y_range=(-4, 4), z_range=(4, 40))
    lefts, rights = synthetic.render_stereo_sequence(
        key, poses, landmarks, H=H, W=W, rig=rig)
    lefts = np.array(lefts)
    rights = np.array(rights)
    lefts[0] = 100.0  # flat: GFTT finds nothing, triangulation yields 0
    rights[0] = 100.0
    return ArraySequenceDataset(lefts, rights, list(rig))


def test_stereo_init_retries_after_flat_first_frame():
    """Regression: a failed stereo init donates the MapState buffer; the
    retry on the next frame must run on a fresh map, not the donated one."""
    ds = _flat_first_sequence()
    vo = VisualOdometry(small_config(), ds)
    vo.initialize()
    assert vo.step()  # frame 0: init fails, stays INITING
    assert vo.status == fe.FrontendStatus.INITING
    assert vo.step()  # frame 1: retry must succeed on a live buffer
    assert vo.status == fe.FrontendStatus.TRACKING_GOOD
    while vo.step():
        pass
    assert len(vo.archived_keyframes) >= 2
    # the failed attempt must not have registered a keyframe: the first
    # keyframe anchors at frame 1, not the flat frame 0
    assert min(r.frame_id for r in vo.archived_keyframes.values()) >= 1


def test_fused_stereo_init_retries_after_flat_first_frame():
    from stereovision_slam_tpu.slam.fused import FusedVisualOdometry
    ds = _flat_first_sequence()
    vo = FusedVisualOdometry(small_config(), ds)
    vo.initialize()
    assert vo.step()  # frame 0: init fails
    assert not vo._initialized_map
    assert vo.step()  # frame 1: retry
    assert vo._initialized_map
    while vo.step():
        pass
    keyframes, landmarks, frames = vo.drain()
    assert len(keyframes) >= 1 and len(landmarks) > 10
    # keyframe 0 anchors at frame 1, not the flat frame 0
    assert min(fid for fid, _ in keyframes.values()) >= 1
