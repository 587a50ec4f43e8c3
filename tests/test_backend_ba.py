"""Bundle-adjustment tests on synthetic windows with exact ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.geometry import se3, jacobians
from stereovision_slam_tpu.slam import map_state as mapmod
from stereovision_slam_tpu.slam.backend import optimize_window, flatten_observations
from tests import synthetic

K, F, L = 8, 64, 256


def build_window(seed=0, n_kf=5, n_lm=60, pose_noise=0.02, lm_noise=0.15,
                 px_noise=0.0, n_bad_obs=0):
    """A ground-truth window + a perturbed MapState observing it."""
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 8)
    left, right = synthetic.make_stereo_rig(fx=260.0, fy=260.0, cx=160.0, cy=60.0)
    poses_gt = synthetic.forward_motion_poses(n_kf, step=0.6, yaw_rate=0.01)
    lms_gt = synthetic.random_landmarks(keys[0], n_lm, x_range=(-10, 10),
                                        y_range=(-4, 4), z_range=(5, 45))

    m = mapmod.empty_map(K, F, L)
    # create landmarks at perturbed positions
    create = jnp.zeros((F,), bool).at[:n_lm].set(True)
    lm_noisy = lms_gt + jax.random.normal(keys[1], lms_gt.shape) * lm_noise
    pos_pad = jnp.zeros((F, 3)).at[:n_lm].set(lm_noisy)
    m, slots = mapmod.add_landmarks(m, pos_pad, create, jnp.asarray(0))
    lm_slots = slots[:n_lm]

    obs_count = 0
    for k in range(n_kf):
        uv_l, _ = jacobians.project_points(left, poses_gt[k], lms_gt)
        uv_r, _ = jacobians.project_points(right, poses_gt[k], lms_gt)
        if px_noise > 0:
            uv_l = uv_l + jax.random.normal(keys[2 + k % 4], uv_l.shape) * px_noise
            uv_r = uv_r + jax.random.normal(keys[3 + k % 4], uv_r.shape) * px_noise
        if n_bad_obs and k == 1:
            uv_l = uv_l.at[:n_bad_obs].add(40.0)  # gross outliers in kf1
        feat_uv = jnp.zeros((F, 2)).at[:n_lm].set(uv_l)
        feat_uvr = jnp.zeros((F, 2)).at[:n_lm].set(uv_r)
        feat_lm = jnp.full((F,), -1, jnp.int32).at[:n_lm].set(lm_slots)
        feat_valid = jnp.zeros((F,), bool).at[:n_lm].set(True)
        has_r = feat_valid
        pose_k = poses_gt[k]
        if k > 0:  # perturb all but the first pose
            noise = jax.random.normal(keys[4 + k % 3], (6,)) * pose_noise
            pose_k = se3.se3_compose(se3.se3_exp(noise), pose_k)
        m, _ = mapmod.insert_keyframe(m, pose_k, jnp.asarray(k),
                                     jnp.asarray(k), feat_uv, feat_uvr,
                                     feat_lm, has_r, feat_valid, num_active=K)
        obs_count += n_lm
    return m, poses_gt, lms_gt, lm_slots, (left, right)


def reproj_rmse(m, cams):
    left, right = cams
    obs = flatten_observations(m)
    from stereovision_slam_tpu.slam.backend import _blend_cameras, _residuals
    cam_obs = _blend_cameras(left, right, obs.is_right)
    r, _, _, in_front = _residuals(cam_obs, m.kf_pose, m.lm_pos, obs)
    c = jnp.sum(r * r, axis=-1)
    mask = obs.valid & in_front
    return float(jnp.sqrt(jnp.sum(jnp.where(mask, c, 0.0)) / jnp.sum(mask)))


def test_ba_reduces_reprojection_error():
    m, poses_gt, lms_gt, lm_slots, cams = build_window()
    before = reproj_rmse(m, cams)
    m2, (n_obs, n_out, th, n_ovf) = optimize_window(m, cams[0], cams[1])
    after = reproj_rmse(m2, cams)
    assert after < before * 0.05, f"before {before:.3f}, after {after:.3f}"
    assert int(n_obs) == 5 * 60 * 2


def test_ba_recovers_poses():
    m, poses_gt, lms_gt, lm_slots, cams = build_window(seed=1)
    m2, _ = optimize_window(m, cams[0], cams[1])
    # BA has gauge freedom; compare relative pose kf0 -> kf_last
    k_last = 4
    def rel(poses_a, a, b):
        return se3.se3_compose(poses_a[b], se3.se3_inverse(poses_a[a]))
    rel_est = rel(m2.kf_pose, 0, k_last)
    rel_gt = rel(poses_gt, 0, k_last)
    err = float(se3.se3_distance(rel_est, rel_gt))
    assert err < 5e-3, f"relative pose error {err}"


def test_ba_with_noise_and_outliers():
    m, poses_gt, lms_gt, lm_slots, cams = build_window(
        seed=2, px_noise=0.4, n_bad_obs=10)
    links_before = np.asarray(m.obs_lm[1][:10])  # copy before donation
    m2, (n_obs, n_out, th, n_ovf) = optimize_window(m, cams[0], cams[1])
    # the 10 gross outliers (40px off) must be flagged and unlinked
    assert int(n_out) >= 10
    # links severed in kf slot 1
    sev = links_before != np.asarray(m2.obs_lm[1][:10])
    assert sev.sum() >= 8
    after = reproj_rmse(m2, cams)
    assert after < 2.0, f"post-BA rmse {after}"


def test_ba_empty_map_no_crash():
    m = mapmod.empty_map(K, F, L)
    m2, (n_obs, n_out, th, n_ovf) = optimize_window(m, *synthetic.make_stereo_rig())
    assert int(n_obs) == 0
    assert np.all(np.isfinite(np.asarray(m2.kf_pose)))


def test_ba_compaction_identical_results():
    """Landmark-axis compaction (gather->solve at La->scatter) must be
    result-identical to the full-table solve while the active landmarks fit."""
    m, *_, cams = build_window(seed=4, px_noise=0.3, n_bad_obs=6)
    m_copy = jax.tree.map(jnp.copy, m)  # optimize_window donates its input
    m_full, (n_obs_f, n_out_f, th_f, ovf_f) = optimize_window(
        m, cams[0], cams[1], max_active_landmarks=None)
    m_cmp, (n_obs_c, n_out_c, th_c, ovf_c) = optimize_window(
        m_copy, cams[0], cams[1], max_active_landmarks=128)
    assert int(ovf_f) == 0 and int(ovf_c) == 0
    assert int(n_obs_f) == int(n_obs_c)
    assert int(n_out_f) == int(n_out_c)
    np.testing.assert_allclose(np.asarray(m_full.kf_pose),
                               np.asarray(m_cmp.kf_pose), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_full.lm_pos),
                               np.asarray(m_cmp.lm_pos), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_full.obs_lm),
                                  np.asarray(m_cmp.obs_lm))


def test_ba_compaction_overflow_degrades_gracefully():
    """With La below the active count, overflowing landmarks keep their
    positions, the overflow is reported, and the solve stays finite."""
    m, *_ , cams = build_window(seed=5)
    lm_pos_before = np.asarray(m.lm_pos)
    active_before = np.asarray(m.lm_valid & (m.lm_obs_count > 0))
    m2, (n_obs, n_out, th, ovf) = optimize_window(
        m, cams[0], cams[1], max_active_landmarks=32)
    assert int(ovf) == int(active_before.sum()) - 32
    assert np.all(np.isfinite(np.asarray(m2.kf_pose)))
    # landmarks beyond the compact table are untouched
    sel = np.nonzero(active_before)[0][32:]
    np.testing.assert_array_equal(np.asarray(m2.lm_pos)[sel],
                                  lm_pos_before[sel])


def test_ba_landmark_positions_improve():
    m, poses_gt, lms_gt, lm_slots, cams = build_window(seed=3, pose_noise=0.0,
                                                       lm_noise=0.3)
    before = float(jnp.mean(jnp.linalg.norm(
        m.lm_pos[lm_slots] - lms_gt, axis=-1)))
    m2, _ = optimize_window(m, cams[0], cams[1])
    after = float(jnp.mean(jnp.linalg.norm(
        m2.lm_pos[lm_slots] - lms_gt, axis=-1)))
    assert after < before * 0.1, f"lm err before {before:.3f} after {after:.3f}"


def test_flat_assembly_matches_stacked():
    """The flat-column fast path (_residuals_lr_cols + _assemble_flat) must
    reproduce the stacked reference path (_residuals_lr + _assemble_onehot)
    bit-close: same contraction orders, only intermediate layouts differ."""
    from stereovision_slam_tpu.slam.backend import (
        _assemble_flat, _assemble_onehot, _residuals_lr, _residuals_lr_cols)
    m, poses_gt, lms_gt, lm_slots, cams = build_window(
        seed=3, px_noise=0.3, n_bad_obs=4)
    left, right = cams
    obs = flatten_observations(m)
    L = m.lm_valid.shape[0]
    Kw = m.obs_lm.shape[0]
    O = ((obs.lm[:, None] == jnp.arange(L, dtype=jnp.int32)[None, :])
         & obs.valid[:, None]).astype(jnp.float32)

    r0, Jp0, Jl0, f0 = _residuals_lr(left, right, m.kf_pose, m.lm_pos, obs,
                                     lm_onehot=O)
    r1, Jp1c, Jl1c, f1 = _residuals_lr_cols(left, right, m.kf_pose, m.lm_pos,
                                            obs, O)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                               rtol=1e-6, atol=1e-5)
    assert bool(jnp.all(f0 == f1))
    Jp1 = jnp.stack(Jp1c, axis=-1).reshape(-1, 2, 6)
    Jl1 = jnp.stack(Jl1c, axis=-1).reshape(-1, 2, 3)
    np.testing.assert_allclose(np.asarray(Jp1), np.asarray(Jp0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Jl1), np.asarray(Jl0),
                               rtol=1e-5, atol=1e-5)

    w = jnp.where(obs.valid & f0, 1.0, 0.0) * jacobians.huber_weight(
        jnp.sum(r0 * r0, axis=-1), jnp.asarray(5.991**2))
    ref = _assemble_onehot(r0, Jp0, Jl0, w, O, Kw)
    got = _assemble_flat(r1, Jp1c, Jl1c, w, O, Kw)
    for a, b, name in zip(got, ref, ("H_pp", "b_p", "H_ll", "b_l", "G")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4, err_msg=name)
