"""Device-side loop closure (slam/fused_loop.py) on a synthetic arena circuit.

The fused streaming pipeline runs the ENTIRE loop-closure state machine
inside the per-frame device program (embedding, similarity scan, matching,
PnP verification, rigid fusion + landmark merge, cooldown, edge log) —
zero host readbacks until drain. These tests drive the same arena-circuit
revisit as the classic-pipeline e2e (tests/test_loop_e2e.py) and assert the
same outcomes: the loop fires on the revisit, the device edge log records
it, and the host-side shutdown PGO flattens the drift.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
from stereovision_slam_tpu.slam.config import SlamConfig
from stereovision_slam_tpu.slam.fused_loop import FusedLoopVisualOdometry
from tests import synthetic


pytestmark = pytest.mark.slow  # >30 s e2e; -m "not slow" for the quick suite


def _arena(T=112, extra=10):
    # gentler turn rate than the classic e2e (tests/test_loop_e2e.py): the
    # first post-init frames have no constant-velocity motion model yet, and
    # at ~6.4 deg/frame the LK guesses land on the arena's repeating texture
    # (wrong-locks). The classic pipeline recovers through its host-side
    # relocalization (a classic-mode feature); the streaming pipeline keeps
    # tracking through the revisit when the turn is ~3 deg/frame.
    yaw = 2 * np.pi / T
    rig = synthetic.make_stereo_rig()
    poses = synthetic.forward_motion_poses(T + extra, step=0.35, yaw_rate=yaw)
    lefts, rights = synthetic.render_arena_stereo_sequence(
        poses, rig=rig, center=(0.0, 6.0), radius=25.0)
    ds = ArraySequenceDataset(np.asarray(lefts), np.asarray(rights),
                              [rig[0], rig[1]])
    return poses, ds


def _cfg():
    return SlamConfig(num_features_needed_for_keyframe=1000,  # kf every frame
                      keyframes_to_skip_in_candidate_search=25,
                      potential_loop_strong_threshold=0.90,
                      potential_loop_weak_threshold=0.85,
                      max_num_weak_threshold=100,
                      min_num_acceptable_keypoint_match=10)


def test_fused_loop_closes_on_arena_circuit():
    poses, ds = _arena()
    vo = FusedLoopVisualOdometry(_cfg(), ds, max_total_keyframes=256,
                                 max_total_landmarks=1 << 14)
    vo.initialize()
    vo.run()

    edges = vo.loop_edges()
    assert len(edges) >= 1, "no loop recorded in the device edge log"
    e = edges[0]
    assert e.kf_id - e.loop_kf_id >= 40, (e.kf_id, e.loop_kf_id)
    assert np.all(np.isfinite(e.relative_pose))

    traj = vo.run_pgo()
    errs = [float(se3.se3_distance(jnp.asarray(traj[f]), poses[f]))
            for f in traj]
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.3, f"post-PGO ATE {ate:.3f} too large"


def test_fused_loop_no_false_positive_on_straight_line():
    rig = synthetic.make_stereo_rig()
    poses = synthetic.forward_motion_poses(40, step=0.5, yaw_rate=0.0)
    lefts, rights = synthetic.render_textured_stereo_sequence(
        poses, H=188, W=620, rig=rig)
    ds = ArraySequenceDataset(np.asarray(lefts), np.asarray(rights),
                              [rig[0], rig[1]])
    cfg = _cfg()
    # reference-default similarity gates: under the shift-tolerant thumbnail
    # embedder (models/mobilenet_v2.py) forward views ~12 m apart score
    # ~0.9 — the strong gate, not PnP, is what must reject them here (the
    # reference's own discipline: skip recent keyframes + a high strong
    # threshold, loopclosure.cpp:240-279)
    cfg.potential_loop_strong_threshold = 0.95
    cfg.potential_loop_weak_threshold = 0.92
    vo = FusedLoopVisualOdometry(cfg, ds, max_total_keyframes=256,
                                 max_total_landmarks=1 << 14)
    vo.initialize()
    vo.run()
    assert vo.loop_edges() == [], "false-positive loop on a straight line"
    # pipeline quality unaffected by the loop hook
    keyframes, landmarks, frames = vo.drain()
    n_in = [int(f.n_inliers) for _, f in frames]
    assert min(n_in[1:]) > 10


def test_scan_loop_matches_fused_loop():
    """ScanLoopVisualOdometry (chunked dispatch incl. the loop hook) must
    reproduce the per-frame fused-loop pipeline exactly — same traced
    computation, different dispatch topology."""
    from stereovision_slam_tpu.slam.fused_loop import ScanLoopVisualOdometry

    rig = synthetic.make_stereo_rig()
    T = 20
    poses = synthetic.forward_motion_poses(T, step=0.5, yaw_rate=0.0)
    lefts, rights = synthetic.render_textured_stereo_sequence(
        poses, H=188, W=620, rig=rig)
    lefts, rights = np.asarray(lefts), np.asarray(rights)
    cfg = _cfg()

    vo_f = FusedLoopVisualOdometry(
        cfg, ArraySequenceDataset(lefts, rights, list(rig)),
        max_total_keyframes=64, max_total_landmarks=1 << 13)
    vo_f.initialize()
    vo_f.run()
    kf_f, lm_f, frames_f = vo_f.drain()

    vo_s = ScanLoopVisualOdometry(
        cfg, ArraySequenceDataset(lefts, rights, list(rig)),
        chunk_size=8, max_total_keyframes=64, max_total_landmarks=1 << 13)
    vo_s.initialize()
    vo_s.run()
    kf_s, lm_s, frames_s = vo_s.drain()

    assert len(frames_s) == len(frames_f) == T
    assert [int(f.n_inliers) for _, f in frames_s] == \
           [int(f.n_inliers) for _, f in frames_f]
    assert set(kf_s) == set(kf_f)
    for k in kf_f:
        np.testing.assert_allclose(kf_s[k][1], kf_f[k][1], atol=1e-5)
    assert vo_s.loop_edges() == vo_f.loop_edges() == []
