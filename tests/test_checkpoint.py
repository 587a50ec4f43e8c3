"""Checkpoint/resume: a split run must match an uninterrupted run exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
from stereovision_slam_tpu.slam.backend import Backend
from stereovision_slam_tpu.slam.checkpoint import save_checkpoint, load_checkpoint
from stereovision_slam_tpu.slam.pipeline import VisualOdometry
from tests import synthetic
from tests.test_pipeline_frontend import small_config


def make_dataset(seed=21, T=14):
    key = jax.random.PRNGKey(seed)
    H, W = 120, 320
    rig = synthetic.make_stereo_rig(fx=260.0, fy=260.0, cx=160.0, cy=60.0)
    poses = synthetic.forward_motion_poses(T, step=0.5, yaw_rate=0.01)
    lms = jnp.concatenate([
        synthetic.random_landmarks(jax.random.PRNGKey(30), 80, z_range=(4, 40)),
        synthetic.random_landmarks(jax.random.PRNGKey(31), 60,
                                   z_range=(10, 50)) + jnp.array([0., 0., 6.]),
    ])
    lefts, rights = synthetic.render_stereo_sequence(key, poses, lms, H=H,
                                                     W=W, rig=rig)
    return (np.asarray(lefts), np.asarray(rights), list(rig))


def run_full(data, steps=None):
    vo = VisualOdometry(small_config(),
                        ArraySequenceDataset(*data), backend=Backend())
    vo.initialize()
    n = 0
    while vo.step():
        n += 1
        if steps is not None and n >= steps:
            break
    return vo


def test_checkpoint_roundtrip_exact(tmp_path):
    data = make_dataset()

    # uninterrupted run
    vo_full = run_full(data)

    # split run: 7 frames, checkpoint, new process-equivalent resume
    vo_a = run_full(data, steps=7)
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(vo_a, ckpt)

    vo_b = VisualOdometry(small_config(),
                          ArraySequenceDataset(*data), backend=Backend())
    vo_b.initialize()
    load_checkpoint(vo_b, ckpt)
    assert vo_b.dataset.current_index == 7
    while vo_b.step():
        pass

    # identical trajectories (deterministic pipeline => bitwise-comparable)
    ta = vo_full.trajectory()
    tb = vo_b.trajectory()
    assert set(ta.keys()) == set(tb.keys())
    for fid in ta:
        np.testing.assert_allclose(ta[fid], tb[fid], atol=1e-5)
    assert len(vo_full.archived_landmarks) == len(vo_b.archived_landmarks)


def test_checkpoint_preserves_scalars(tmp_path):
    data = make_dataset()
    vo = run_full(data, steps=6)
    ckpt = str(tmp_path / "s.npz")
    save_checkpoint(vo, ckpt)
    vo2 = VisualOdometry(small_config(),
                         ArraySequenceDataset(*data), backend=Backend())
    vo2.initialize()
    load_checkpoint(vo2, ckpt)
    assert vo2.status == vo.status
    assert vo2.kf_count == vo.kf_count
    assert vo2.inlier_history == vo.inlier_history
    np.testing.assert_allclose(np.asarray(vo2.fs.T_cur),
                               np.asarray(vo.fs.T_cur), atol=0)
    np.testing.assert_allclose(np.asarray(vo2.ms.lm_pos),
                               np.asarray(vo.ms.lm_pos), atol=0)


def test_checkpoint_roundtrips_loop_closure_state(tmp_path):
    """The loop-closure database (embeddings, descriptors, landmark
    snapshots), recorded loop edges, and cooldown survive a resume — so a
    resumed run's shutdown PGO sees every loop found before the save."""
    from stereovision_slam_tpu.slam.loop_closure import (
        LoopClosure, LoopEdge, ProcessedKeyframe)
    from stereovision_slam_tpu.slam.config import SlamConfig

    data = make_dataset()
    vo = run_full(data, steps=6)
    rng = np.random.default_rng(0)
    F = 32
    lc = LoopClosure(SlamConfig(), vo.cam_left, embedder="thumbnail")
    ok = np.zeros(F, bool); ok[:10] = True
    lc.db[3] = ProcessedKeyframe(
        kf_id=3, frame_id=9,
        embedding=rng.normal(size=1280).astype(np.float32),
        desc=rng.integers(0, 2**32, (F, 8), dtype=np.uint32),
        desc_ok=ok, feat_uv=rng.uniform(0, 100, (F, 2)).astype(np.float32),
        lm_pos=rng.normal(size=(F, 3)).astype(np.float32), lm_has=ok.copy(),
        lm_id=np.where(ok, np.arange(F), -1).astype(np.int32),
        lm_first_kf=np.where(ok, 1, -1).astype(np.int32),
        pose=np.eye(3, 4, dtype=np.float32))
    lc.loop_edges.append(LoopEdge(
        kf_id=8, loop_kf_id=3, relative_pose=np.eye(3, 4, dtype=np.float32)))
    lc.last_closed_kf_id = 8
    lc.last_deep_score = 0.97
    vo.loop_closure = lc

    ckpt = str(tmp_path / "lc.npz")
    save_checkpoint(vo, ckpt)

    vo2 = VisualOdometry(small_config(),
                         ArraySequenceDataset(*data), backend=Backend())
    vo2.initialize()
    vo2.loop_closure = LoopClosure(SlamConfig(), vo.cam_left,
                                   embedder="thumbnail")
    load_checkpoint(vo2, ckpt)
    lc2 = vo2.loop_closure
    assert set(lc2.db.keys()) == {3}
    p, q = lc.db[3], lc2.db[3]
    for f in ("embedding", "desc", "desc_ok", "feat_uv", "lm_pos", "lm_has",
              "lm_id", "lm_first_kf", "pose"):
        np.testing.assert_array_equal(getattr(p, f), getattr(q, f))
    assert q.frame_id == 9
    assert len(lc2.loop_edges) == 1 and lc2.loop_edges[0].loop_kf_id == 3
    assert lc2.last_closed_kf_id == 8
    assert lc2.last_deep_score == 0.97


# ---------------------------------------------------------------------- #
# fused-mode checkpoint/resume (streaming state is a device pytree)

def _fused_traj(vo):
    kf, lm, fr = vo.drain()
    return {fid: pose for fid, pose in kf.values()}, lm, fr


def test_fused_checkpoint_roundtrip_exact(tmp_path):
    from stereovision_slam_tpu.slam.checkpoint import (
        load_fused_checkpoint, save_fused_checkpoint)
    from stereovision_slam_tpu.slam.fused import FusedVisualOdometry
    data = make_dataset()

    vo_full = FusedVisualOdometry(small_config(), ArraySequenceDataset(*data))
    vo_full.initialize()
    vo_full.run()

    vo_a = FusedVisualOdometry(small_config(), ArraySequenceDataset(*data))
    vo_a.initialize()
    for _ in range(7):
        vo_a.step()
    ckpt = str(tmp_path / "fused.npz")
    save_fused_checkpoint(vo_a, ckpt)

    vo_b = FusedVisualOdometry(small_config(), ArraySequenceDataset(*data))
    vo_b.initialize()
    load_fused_checkpoint(vo_b, ckpt)
    vo_b.run()

    ta, la, fa = _fused_traj(vo_full)
    tb, lb, fb = _fused_traj(vo_b)
    assert set(ta) == set(tb)
    for fid in ta:  # bit-identical: resumed state is the same device pytree
        np.testing.assert_array_equal(ta[fid], tb[fid])
    assert set(la) == set(lb)
    assert [fid for fid, _ in fa] == [fid for fid, _ in fb]
    for (_, a), (_, b) in zip(fa, fb):
        assert int(a.n_inliers) == int(b.n_inliers)


def test_fused_checkpoint_mode_mismatch_rejected(tmp_path):
    import pytest
    from stereovision_slam_tpu.slam.checkpoint import (
        load_fused_checkpoint, save_fused_checkpoint)
    from stereovision_slam_tpu.slam.fused import (FusedVisualOdometry,
                                                  ScanVisualOdometry)
    from stereovision_slam_tpu.utils.exceptions import CheckpointError
    data = make_dataset()
    vo = FusedVisualOdometry(small_config(), ArraySequenceDataset(*data))
    vo.initialize()
    for _ in range(4):
        vo.step()
    ckpt = str(tmp_path / "f.npz")
    save_fused_checkpoint(vo, ckpt)
    vo2 = ScanVisualOdometry(small_config(), ArraySequenceDataset(*data),
                             chunk_size=4)
    vo2.initialize()
    with pytest.raises(CheckpointError):
        load_fused_checkpoint(vo2, ckpt)


def test_scan_checkpoint_roundtrip(tmp_path):
    from stereovision_slam_tpu.slam.checkpoint import (
        load_fused_checkpoint, save_fused_checkpoint)
    from stereovision_slam_tpu.slam.fused import ScanVisualOdometry
    data = make_dataset()

    vo_full = ScanVisualOdometry(small_config(), ArraySequenceDataset(*data),
                                 chunk_size=4)
    vo_full.initialize()
    vo_full.run()

    vo_a = ScanVisualOdometry(small_config(), ArraySequenceDataset(*data),
                              chunk_size=4)
    vo_a.initialize()
    vo_a.step()  # 4 frames
    ckpt = str(tmp_path / "scan.npz")
    save_fused_checkpoint(vo_a, ckpt)

    vo_b = ScanVisualOdometry(small_config(), ArraySequenceDataset(*data),
                              chunk_size=4)
    vo_b.initialize()
    load_fused_checkpoint(vo_b, ckpt)
    vo_b.run()

    ta, la, _ = _fused_traj(vo_full)
    tb, lb, _ = _fused_traj(vo_b)
    assert set(ta) == set(tb)
    for fid in ta:
        np.testing.assert_array_equal(ta[fid], tb[fid])
