"""Scan-chunked offline mode vs the per-frame fused mode.

ScanVisualOdometry runs the same traced per-frame computation inside one
`lax.scan` program per chunk; its archives, keyframe selection, and per-frame
outputs must match FusedVisualOdometry on the same sequence, including when
the sequence length is not a multiple of the chunk size (tail padding).
"""

import numpy as np
import pytest

from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
from stereovision_slam_tpu.slam.fused import (
    FusedVisualOdometry, ScanVisualOdometry, UnrolledVisualOdometry)
from tests.test_fused import scene  # noqa: F401  (fixture)
from tests.test_pipeline_frontend import small_config


def _run(vo):
    vo.initialize()
    vo.run()
    return vo.drain()


@pytest.mark.parametrize("cls,chunk", [(ScanVisualOdometry, 4),
                                       (ScanVisualOdometry, 5),
                                       (ScanVisualOdometry, 32),
                                       (UnrolledVisualOdometry, 5)])
def test_scan_matches_fused(scene, cls, chunk):  # noqa: F811
    lefts, rights, rig, poses = scene
    cfg = small_config()

    kf_f, lm_f, fr_f = _run(
        FusedVisualOdometry(cfg, ArraySequenceDataset(lefts, rights, rig)))
    kf_s, lm_s, fr_s = _run(cls(
        cfg, ArraySequenceDataset(lefts, rights, rig), chunk_size=chunk))

    assert set(kf_s) == set(kf_f)
    for kf_id in kf_f:
        fid_f, pose_f = kf_f[kf_id]
        fid_s, pose_s = kf_s[kf_id]
        assert fid_s == fid_f
        np.testing.assert_allclose(pose_s, pose_f, atol=1e-4)

    assert set(lm_s) == set(lm_f)

    assert [fid for fid, _ in fr_s] == [fid for fid, _ in fr_f]
    for (fid, a), (_, b) in zip(fr_s, fr_f):
        assert int(a.n_inliers) == int(b.n_inliers), fid
        assert bool(a.kf_inserted) == bool(b.kf_inserted), fid
        np.testing.assert_allclose(a.pose, b.pose, atol=1e-4)


def test_scan_drain_idempotent(scene):  # noqa: F811
    lefts, rights, rig, _ = scene
    vo = ScanVisualOdometry(small_config(),
                            ArraySequenceDataset(lefts, rights, rig),
                            chunk_size=6)
    kf1, lm1, fr1 = _run(vo)
    kf2, lm2, fr2 = vo.drain()
    assert len(fr2) == len(fr1)
    assert set(kf2) == set(kf1)


def test_scan_mode_output_buffer_guard():
    """A chunk that would overflow the preallocated output buffer must fail
    loudly instead of silently clobbering earlier frames (code-review r3)."""
    import numpy as np
    import pytest
    from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
    from stereovision_slam_tpu.slam.config import SlamConfig
    from stereovision_slam_tpu.slam.fused import ScanVisualOdometry
    from tests import synthetic

    rig = synthetic.make_stereo_rig(fx=200.0, fy=200.0, cx=160.0, cy=48.0)
    poses = synthetic.forward_motion_poses(10, step=0.4)
    lefts, rights = synthetic.render_textured_stereo_sequence(
        poses, H=96, W=320, rig=rig)
    cfg = SlamConfig(num_features=60, num_features_init=15, max_features=96,
                     max_landmarks=512, num_active_keyframes=5)
    vo = ScanVisualOdometry(cfg, ArraySequenceDataset(
        np.asarray(lefts), np.asarray(rights), list(rig)), chunk_size=4,
        max_total_keyframes=64, max_total_landmarks=2048, max_frames=8)
    vo.initialize()
    vo.step()  # frames 0-3
    vo.step()  # frames 4-7: buffer now full
    with pytest.raises(RuntimeError, match="output buffer full"):
        vo.step()  # frames 8-9 would overflow
