"""Loop-closure pipeline tests: gating, rigid fusion, shutdown PGO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereovision_slam_tpu.geometry import se3, jacobians
from stereovision_slam_tpu.slam import map_state as mapmod
from stereovision_slam_tpu.slam.config import SlamConfig
from stereovision_slam_tpu.slam.loop_closure import (
    LoopClosure, ProcessedKeyframe, LoopEdge, _apply_rigid_correction)
from stereovision_slam_tpu.slam.pipeline import KeyframeRecord, VisualOdometry
from tests import synthetic


def test_rigid_correction_consistency():
    """After LocalFusion, reprojections must be unchanged (rigid world map)."""
    from tests.test_backend_ba import build_window, reproj_rmse
    m, poses_gt, lms_gt, lm_slots, cams = build_window(seed=7)
    before = reproj_rmse(m, cams)
    T_old = m.kf_pose[jnp.argmax(jnp.where(m.kf_valid, m.kf_id, -1))]
    T_corr = se3.se3_compose(
        se3.se3_exp(jnp.array([1.0, 0.5, -2.0, 0.05, 0.1, -0.02])), T_old)
    fs_T = T_old
    m2, new_T = _apply_rigid_correction(m, T_old, T_corr, fs_T)
    after = reproj_rmse(m2, cams)
    np.testing.assert_allclose(after, before, atol=1e-2)
    np.testing.assert_allclose(np.asarray(new_T), np.asarray(T_corr), atol=1e-4)


class FakeVO:
    """Minimal stand-in exposing what LoopClosure touches."""
    def __init__(self):
        self.kf_count = 0
        self.archived_keyframes = {}
        self.archived_landmarks = {}
        self.archived_landmark_first_kf = {}
        self.fs = None
        self.ms = None

    def _sync_active_to_archive(self):
        pass


def make_entry(kf_id, embedding, pose=None, n_feat=32, seed=0):
    rng = np.random.default_rng(seed)
    F = 96
    if pose is None:
        pose = np.asarray(se3.se3_identity())
    desc = rng.integers(0, 2**32, (F, 8), dtype=np.uint32)
    ok = np.zeros(F, bool); ok[:n_feat] = True
    return ProcessedKeyframe(
        kf_id=kf_id, frame_id=kf_id, embedding=embedding,
        desc=desc, desc_ok=ok,
        feat_uv=rng.uniform(0, 300, (F, 2)).astype(np.float32),
        lm_pos=rng.uniform(-5, 5, (F, 3)).astype(np.float32),
        lm_has=ok.copy(),
        lm_id=np.where(ok, np.arange(F), -1).astype(np.int32),
        lm_first_kf=np.where(ok, kf_id, -1).astype(np.int32),
        pose=np.asarray(pose, np.float32))


def unit_vec(seed, d=1280):
    v = np.random.default_rng(seed).normal(size=d).astype(np.float32)
    return v / np.linalg.norm(v)


def test_candidate_gating():
    cfg = SlamConfig(keyframes_to_skip_in_candidate_search=5)
    left, _ = synthetic.make_stereo_rig()
    lc = LoopClosure(cfg, left)

    e0 = unit_vec(0)
    # db: kf0 has embedding e0; kf1 something else
    lc.db[0] = make_entry(0, e0)
    lc.db[1] = make_entry(1, unit_vec(1))

    # recent keyframe -> skipped entirely
    recent = make_entry(3, e0)
    assert lc._find_candidate(recent) is None

    # far keyframe with near-identical embedding -> candidate found
    far = make_entry(30, (e0 + 0.01 * unit_vec(9)) /
                     np.linalg.norm(e0 + 0.01 * unit_vec(9)))
    cand = lc._find_candidate(far)
    assert cand is not None and cand.kf_id == 0

    # weak-threshold flooding -> rejected (too many similar keyframes)
    for k in range(2, 8):
        lc.db[k] = make_entry(k, e0)
    assert lc._find_candidate(far) is None


def test_full_closure_updates_map_and_records_edge():
    """Fabricate a genuine revisit: candidate kf0 with known landmarks; the
    current keyframe sees the same landmarks from a drifted pose estimate."""
    cfg = SlamConfig(keyframes_to_skip_in_candidate_search=5,
                     min_num_acceptable_keypoint_match=11)
    left, right = synthetic.make_stereo_rig()
    lc = LoopClosure(cfg, left)

    key = jax.random.PRNGKey(0)
    F = 96
    n = 48
    lms = synthetic.random_landmarks(key, n)  # world points (kf0 at identity)

    # --- candidate keyframe 0: at identity, observing lms ---
    amps = jnp.asarray(80.0 + 170.0 * ((jnp.arange(n) * 0.731) % 1.0))
    img0 = synthetic.render_blobs(
        jacobians.project_points(left, se3.se3_identity(), lms)[0], 188, 620,
        sigma=2.2, amplitudes=amps, distinct=True)
    from stereovision_slam_tpu.ops import descriptors as desc_mod
    uv0, _ = jacobians.project_points(left, se3.se3_identity(), lms)
    uv0_pad = jnp.zeros((F, 2)).at[:n].set(uv0)
    valid_pad = jnp.zeros((F,), bool).at[:n].set(True)
    d0, ok0 = desc_mod.compute(img0, uv0_pad, valid_pad)
    cand = ProcessedKeyframe(
        kf_id=0, frame_id=0, embedding=unit_vec(0),
        desc=np.asarray(d0), desc_ok=np.asarray(ok0),
        feat_uv=np.asarray(uv0_pad),
        lm_pos=np.asarray(jnp.zeros((F, 3)).at[:n].set(lms)),
        lm_has=np.asarray(valid_pad),
        lm_id=np.where(np.asarray(valid_pad), 1000 + np.arange(F), -1
                       ).astype(np.int32),
        lm_first_kf=np.where(np.asarray(valid_pad), 0, -1).astype(np.int32),
        pose=np.asarray(se3.se3_identity()))
    lc.db[0] = cand

    # --- current keyframe 30: true pose = small offset from kf0, but the
    # accumulated estimate is drifted by ~2m ---
    T_true = se3.se3_exp(jnp.array([0.2, 0.0, 0.3, 0.0, 0.02, 0.0]))
    T_drift = se3.se3_compose(
        se3.se3_exp(jnp.array([1.5, 0.3, -1.0, 0.0, 0.05, 0.0])), T_true)
    uv1, _ = jacobians.project_points(left, T_true, lms)
    img1 = synthetic.render_blobs(uv1, 188, 620, sigma=2.2, amplitudes=amps,
                                  distinct=True)
    uv1_pad = jnp.zeros((F, 2)).at[:n].set(uv1)
    d1, ok1 = desc_mod.compute(img1, uv1_pad, valid_pad)

    # VO state: map with one active keyframe (the current one) + landmarks
    # at drift-consistent positions
    vo = FakeVO()
    vo.kf_count = 30
    K, L = 8, 256
    m = mapmod.empty_map(K, F, L)
    D = se3.se3_compose(se3.se3_inverse(T_true), T_drift)  # drift transform
    lms_drifted = se3.se3_apply(se3.se3_inverse(D), lms)
    create = valid_pad
    m, slots = mapmod.add_landmarks(m, jnp.zeros((F, 3)).at[:n].set(lms_drifted),
                                    create, jnp.asarray(30))
    m, _ = mapmod.insert_keyframe(m, T_drift, jnp.asarray(30), jnp.asarray(30),
                                  uv1_pad, uv1_pad, jnp.where(create, slots, -1),
                                  create, create, num_active=8)
    vo.ms = m
    from stereovision_slam_tpu.slam import frontend as fe
    vo.fs = fe.FrontendState(T_cur=T_drift, T_rel=se3.se3_identity(),
                             feat_uv=uv1_pad, feat_lm=jnp.where(create, slots, -1),
                             feat_valid=create, pyr=(img1,),
                             ref_uv=uv1_pad, ref_pyr=(img1,))
    vo.archived_keyframes[30] = KeyframeRecord(frame_id=30, kf_id=30,
                                               pose=np.asarray(T_drift))

    entry = ProcessedKeyframe(
        kf_id=30, frame_id=30, embedding=unit_vec(0),
        desc=np.asarray(d1), desc_ok=np.asarray(ok1),
        feat_uv=np.asarray(uv1_pad),
        lm_pos=np.asarray(jnp.zeros((F, 3))), lm_has=np.zeros(F, bool),
        lm_id=np.full(F, -1, np.int32), lm_first_kf=np.full(F, -1, np.int32),
        pose=np.asarray(T_drift))

    lc._attempt_closure(vo, entry, cand)

    assert len(lc.loop_edges) == 1, "loop edge must be recorded"
    assert lc.last_closed_kf_id == 30
    # the corrected current pose must be close to the true pose
    err = float(se3.se3_distance(vo.fs.T_cur, T_true))
    assert err < 0.1, f"corrected pose error {err:.3f}"
    # active landmarks moved back to (approximately) true world positions
    lm_now = np.asarray(vo.ms.lm_pos[np.asarray(slots[:n])])
    np.testing.assert_allclose(lm_now, np.asarray(lms), atol=0.3)
    # duplicate merge: most matched features' slots now carry the LOOP
    # keyframe's landmark identities (ids 1000+) and exact positions
    ids_now = np.asarray(vo.ms.lm_id[np.asarray(slots[:n])])
    n_merged = int(np.sum(ids_now >= 1000))
    assert n_merged >= 11, f"only {n_merged} duplicates merged"


def test_shutdown_pgo_via_stop():
    cfg = SlamConfig()
    left, _ = synthetic.make_stereo_rig()
    lc = LoopClosure(cfg, left)
    vo = FakeVO()
    # drifted straight-line trajectory of 30 keyframes + one loop edge
    n = 30
    rng = np.random.default_rng(0)
    gt, est = [np.asarray(se3.se3_identity())], [np.asarray(se3.se3_identity())]
    step = np.asarray(se3.se3_exp(jnp.array([0, 0, -0.5, 0, 0, 0.0])))
    for k in range(1, n):
        gt.append(np.asarray(se3.se3_compose(jnp.asarray(step), jnp.asarray(gt[-1]))))
        noisy = np.asarray(se3.se3_compose(
            se3.se3_exp(jnp.asarray(rng.normal(0, 0.01, 6), dtype=jnp.float32)),
            jnp.asarray(step)))
        est.append(np.asarray(se3.se3_compose(jnp.asarray(noisy), jnp.asarray(est[-1]))))
    for k in range(n):
        rel = None
        if k > 0:
            rel = np.asarray(se3.se3_compose(
                jnp.asarray(est[k]), se3.se3_inverse(jnp.asarray(est[k - 1]))))
        vo.archived_keyframes[k] = KeyframeRecord(frame_id=k, kf_id=k,
                                                  pose=est[k], rel_to_prev=rel)
    # loop edge with the TRUE relative pose between last and first
    true_rel = np.asarray(se3.se3_compose(
        jnp.asarray(gt[-1]), se3.se3_inverse(jnp.asarray(gt[0]))))
    lc.loop_edges.append(LoopEdge(kf_id=n - 1, loop_kf_id=0,
                                  relative_pose=true_rel))
    # one landmark anchored at the last keyframe
    vo.archived_landmarks[7] = np.array([1.0, 0.0, 5.0], np.float32)
    vo.archived_landmark_first_kf[7] = n - 1

    err_before = np.linalg.norm(vo.archived_keyframes[n - 1].pose[:, 3]
                                - gt[-1][:, 3])
    lc.stop(vo)
    assert lc.pgo_ran
    err_after = np.linalg.norm(vo.archived_keyframes[n - 1].pose[:, 3]
                               - gt[-1][:, 3])
    assert err_after < err_before * 0.5
    # landmark was re-anchored (moved consistently with its keyframe)
    assert not np.allclose(vo.archived_landmarks[7], [1.0, 0.0, 5.0])
