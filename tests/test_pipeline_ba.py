"""End-to-end VO + sliding-window BA on a synthetic sequence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
from stereovision_slam_tpu.slam.backend import Backend
from stereovision_slam_tpu.slam.pipeline import VisualOdometry
from stereovision_slam_tpu.utils.evaluation import ate_rmse
from tests import synthetic
from tests.test_pipeline_frontend import small_config


@pytest.fixture(scope="module")
def ba_run():
    key = jax.random.PRNGKey(11)
    H, W = 120, 320
    rig = synthetic.make_stereo_rig(fx=260.0, fy=260.0, cx=160.0, cy=60.0)
    T = 14
    poses = synthetic.forward_motion_poses(T, step=0.5, yaw_rate=-0.012)
    k1, k2 = jax.random.split(key)
    lms = jnp.concatenate([
        synthetic.random_landmarks(k1, 80, z_range=(4, 40)),
        synthetic.random_landmarks(k2, 60, z_range=(10, 50)) + jnp.array([0., 0., 6.]),
    ])
    lefts, rights = synthetic.render_stereo_sequence(key, poses, lms, H=H,
                                                     W=W, rig=rig)
    ds = ArraySequenceDataset(np.asarray(lefts), np.asarray(rights), list(rig))
    vo = VisualOdometry(small_config(), ds, backend=Backend())
    vo.initialize()
    vo.run()
    return vo, poses


def test_ba_pipeline_tracks(ba_run):
    vo, poses = ba_run
    assert len(vo.archived_keyframes) >= 2
    assert vo.backend.last_stats is not None
    n_obs, n_out, th, n_ovf = vo.backend.last_stats
    assert int(n_obs) > 50


def test_ba_pipeline_accuracy(ba_run):
    vo, poses = ba_run
    gt = {i: np.asarray(poses[i]) for i in range(poses.shape[0])}
    err = ate_rmse(vo.trajectory(), gt, align=False)
    assert err < 0.12, f"ATE RMSE with BA {err:.3f} m"


def test_ba_landmarks_finite(ba_run):
    vo, _ = ba_run
    lm = np.stack(list(vo.archived_landmarks.values()))
    assert np.all(np.isfinite(lm))
