"""Batched multi-sequence SLAM vs per-stream single fused runs."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
from stereovision_slam_tpu.slam.batched import BatchedFusedVisualOdometry
from stereovision_slam_tpu.slam.config import SlamConfig
from stereovision_slam_tpu.slam.fused import FusedVisualOdometry
from tests import synthetic

H, W = 96, 320


pytestmark = pytest.mark.slow  # >30 s e2e; -m "not slow" for the quick suite


def make_stream(seed, T=10):
    rig = synthetic.make_stereo_rig(fx=200.0, fy=200.0, cx=W / 2, cy=H / 2)
    poses = synthetic.forward_motion_poses(
        T, step=0.35 + 0.05 * seed, yaw_rate=0.002 * seed)
    lefts, rights = synthetic.render_textured_stereo_sequence(
        poses, H=H, W=W, rig=rig)
    return (np.asarray(lefts), np.asarray(rights), [rig[0], rig[1]]), poses


def small_config():
    return SlamConfig(num_features=60, num_features_init=15,
                      num_features_needed_for_keyframe=45,
                      max_features=96, max_landmarks=512,
                      num_active_keyframes=5)


def test_batched_matches_single_stream():
    streams = [make_stream(s) for s in range(3)]
    cfg = small_config()

    single_trajs = []
    for data, _ in streams:
        vo = FusedVisualOdometry(cfg, ArraySequenceDataset(*data),
                                 max_total_keyframes=64,
                                 max_total_landmarks=2048)
        vo.initialize()
        vo.run()
        single_trajs.append(vo.trajectory())

    bvo = BatchedFusedVisualOdometry(
        cfg, [ArraySequenceDataset(*data) for data, _ in streams],
        max_total_keyframes=64, max_total_landmarks=2048)
    bvo.initialize()
    bvo.run()
    batched_trajs = bvo.trajectories()

    for b, (single, batched) in enumerate(zip(single_trajs, batched_trajs)):
        assert set(single.keys()) == set(batched.keys()), \
            f"stream {b}: keyframe sets differ"
        for fid in single:
            # the single-stream program wraps tracking in the device-side
            # stereo-init lax.cond (init_branch=True) while the batched one
            # initializes host-side; identical math, but the different
            # program structure changes XLA fusion order -> small float
            # reassociation differences accumulate over the sequence
            np.testing.assert_allclose(batched[fid], single[fid], atol=2e-3,
                                       err_msg=f"stream {b} frame {fid}")


def test_batched_trajectories_track_ground_truth():
    streams = [make_stream(s, T=12) for s in range(2)]
    cfg = small_config()
    bvo = BatchedFusedVisualOdometry(
        cfg, [ArraySequenceDataset(*data) for data, _ in streams],
        max_total_keyframes=64, max_total_landmarks=2048)
    bvo.initialize()
    bvo.run()
    for b, traj in enumerate(bvo.trajectories()):
        _, poses = streams[b]
        errs = [float(se3.se3_distance(jnp.asarray(traj[f]), poses[f]))
                for f in traj]
        ate = float(np.sqrt(np.mean(np.square(errs))))
        assert ate < 0.25, f"stream {b} ATE {ate:.3f}"


def test_batched_unequal_lengths():
    """A stream ending early must not corrupt the others."""
    streams = [make_stream(0, T=6), make_stream(1, T=12)]
    cfg = small_config()
    bvo = BatchedFusedVisualOdometry(
        cfg, [ArraySequenceDataset(*data) for data, _ in streams],
        max_total_keyframes=64, max_total_landmarks=2048)
    bvo.initialize()
    bvo.run()
    trajs = bvo.trajectories()
    # long stream still tracks its ground truth
    _, poses1 = streams[1]
    errs = [float(se3.se3_distance(jnp.asarray(trajs[1][f]), poses1[f]))
            for f in trajs[1]]
    assert float(np.sqrt(np.mean(np.square(errs)))) < 0.25
    # short stream's outputs stop at its end
    assert max(fid for fid, _ in bvo.outputs[0]) <= 5


def test_batched_mesh_sharded_matches_unsharded():
    """dp-sharded batched streams (8 lanes over the 8-device CPU mesh) must
    produce exactly the unsharded batched results — streams are independent,
    so the partitioned program has no collectives to introduce skew."""
    from stereovision_slam_tpu.parallel.mesh import make_ba_mesh

    streams = [make_stream(s % 4, T=8) for s in range(8)]
    cfg = small_config()

    plain = BatchedFusedVisualOdometry(
        cfg, [ArraySequenceDataset(*data) for data, _ in streams],
        max_total_keyframes=64, max_total_landmarks=2048)
    plain.initialize()
    plain.run()

    mesh = jax.make_mesh((8,), ("dp",))
    sharded = BatchedFusedVisualOdometry(
        cfg, [ArraySequenceDataset(*data) for data, _ in streams],
        max_total_keyframes=64, max_total_landmarks=2048, mesh=mesh)
    sharded.initialize()
    # state actually lands sharded over the devices
    assert len(sharded.fs.T_cur.sharding.device_set) == 8
    sharded.run()

    for a, b in zip(plain.trajectories(), sharded.trajectories()):
        assert set(a.keys()) == set(b.keys())
        for fid in a:
            # partitioned programs reorder float ops (layout/fusion changes);
            # observed max divergence ~1e-4 over a full run
            np.testing.assert_allclose(a[fid], b[fid], atol=1e-3)


def test_batched_mesh_requires_divisible_batch():
    import pytest
    mesh = jax.make_mesh((8,), ("dp",))
    streams = [make_stream(0, T=4) for _ in range(3)]
    with pytest.raises(ValueError, match="divide"):
        BatchedFusedVisualOdometry(
            small_config(),
            [ArraySequenceDataset(*data) for data, _ in streams], mesh=mesh)


def test_batched_staggered_tracks_accurately():
    """kf_stagger mode (rotating keyframe sub-batch, the serving-throughput
    configuration) must keep every lane tracking with bounded drift — the
    keyframe cadence policy changes, not the math."""
    B, k, T = 4, 4, 16
    streams = [make_stream(s, T=T) for s in range(B)]
    cfg = small_config()
    bvo = BatchedFusedVisualOdometry(
        cfg, [ArraySequenceDataset(*data) for data, _ in streams],
        max_total_keyframes=64, max_total_landmarks=2048, kf_stagger=k)
    bvo.initialize()
    bvo.run()
    trajs = bvo.trajectories()
    for b, ((_, poses), traj) in enumerate(zip(streams, trajs)):
        assert len(traj) >= 2, f"lane {b}: no keyframes inserted"
        errs = []
        for fid, pose in traj.items():
            c_est = -pose[:, :3].T @ pose[:, 3]
            gt = np.asarray(poses[fid])
            c_gt = -gt[:, :3].T @ gt[:, 3]
            errs.append(np.linalg.norm(c_est - c_gt))
        ate = float(np.sqrt(np.mean(np.square(errs))))
        dist = float(0.35 + 0.05 * b) * T
        assert ate < 0.05 * dist, f"lane {b}: ATE {ate:.3f} over {dist:.1f} m"
    # inlier stream healthy in every lane
    for b in range(B):
        n_in = [int(o.n_inliers) for _, o in bvo.outputs[b]]
        assert min(n_in) > 10, f"lane {b}: {n_in}"


def test_staggered_fold_matches_vmap_topology():
    """The lane-folded serving tracking (fe.track_step_serving, round 5)
    must produce EXACTLY the per-stream results of the vmapped track_step
    topology — the fold only changes how LK lanes are batched, never the
    per-group math."""
    from stereovision_slam_tpu.slam.batched import batched_staggered_step
    from stereovision_slam_tpu.slam import frontend as fe
    from stereovision_slam_tpu.slam import map_state as mapmod
    from stereovision_slam_tpu.ops import image as imops

    B, T = 3, 6
    streams = [make_stream(s, T=T) for s in range(B)]
    cfg = small_config()
    bvo = BatchedFusedVisualOdometry(
        cfg, [ArraySequenceDataset(*data) for data, _ in streams],
        max_total_keyframes=64, max_total_landmarks=2048, kf_stagger=B)
    bvo.initialize()
    # drive a few frames with the default (folded) path to build real state
    for _ in range(3):
        bvo.step()
    lefts = jnp.asarray(np.stack([np.asarray(s[0][0][4]) for s in streams]))
    rights = jnp.asarray(np.stack([np.asarray(s[0][1][4]) for s in streams]))
    fids = jnp.full((B,), 4, jnp.int32)
    statics = dict(
        num_levels=cfg.lk_num_levels, num_features=cfg.num_features,
        min_distance=cfg.gftt_min_distance,
        quality_level=cfg.gftt_quality_level,
        max_depth=cfg.max_triangulation_depth,
        num_active=cfg.num_active_keyframes,
        kf_threshold=cfg.num_features_needed_for_keyframe,
        bad_threshold=cfg.num_features_tracking_bad,
        chi2_th=cfg.chi2_th, backend_on=True, ba_iters=4,
        detector="gftt", ba_max_active=None, m=1,
        lk_iters=12, pose_rounds=3, pose_iters=6)
    outs = {}
    for fold in (True, False):
        fs, ms, arc, kfc, out = batched_staggered_step(
            jax.tree.map(jnp.copy, bvo.fs),
            jax.tree.map(jnp.copy, bvo.ms),
            jax.tree.map(jnp.copy, bvo.arc),
            jnp.copy(bvo.kf_count), lefts, rights, fids,
            jnp.asarray(0, jnp.int32), bvo.cam_left, bvo.cam_right,
            fold_tracks=fold, **statics)
        outs[fold] = (fs, out)
    fa, oa = outs[True]
    fb, ob = outs[False]
    np.testing.assert_allclose(np.asarray(fa.T_cur), np.asarray(fb.T_cur),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(oa.n_inliers),
                                  np.asarray(ob.n_inliers))
    np.testing.assert_allclose(np.asarray(fa.feat_uv),
                               np.asarray(fb.feat_uv), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(fa.feat_valid),
                                  np.asarray(fb.feat_valid))
