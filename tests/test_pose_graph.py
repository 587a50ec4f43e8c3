"""Pose-graph optimization tests: loop correction on drifted trajectories."""

import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.slam.pose_graph import (
    PoseGraph, optimize_pose_graph, reanchor_landmarks)


def circle_trajectory(n, radius=20.0):
    """Ground-truth poses around a circle (ends where it starts)."""
    poses = []
    for k in range(n):
        ang = 2 * np.pi * k / n
        # rig at angle ang on the circle, heading tangentially
        Rwc = np.array([
            [np.cos(ang), 0, -np.sin(ang)],
            [0, 1, 0],
            [np.sin(ang), 0, np.cos(ang)],
        ])
        c = np.array([radius * np.sin(ang), 0.0, radius * (1 - np.cos(ang))])
        R = Rwc.T
        t = -R @ c
        poses.append(np.concatenate([R, t[:, None]], axis=1))
    return jnp.asarray(np.stack(poses), jnp.float32)


def build_graph(n=40, drift=0.004, loop=True, seed=0):
    gt = circle_trajectory(n)
    rel_gt = jax.vmap(lambda a, b: se3.se3_compose(b, se3.se3_inverse(a)))(
        gt[:-1], gt[1:])
    # integrate drifted odometry: each relative measurement slightly wrong
    rng = np.random.default_rng(seed)
    noise = jnp.asarray(rng.normal(0, drift, (n - 1, 6)), jnp.float32)
    poses = [gt[0]]
    for k in range(n - 1):
        rel_noisy = se3.se3_compose(se3.se3_exp(noise[k]), rel_gt[k])
        poses.append(se3.se3_compose(rel_noisy, poses[-1]))
    poses = jnp.stack(poses)

    edge_i = list(range(1, n))
    edge_j = list(range(0, n - 1))
    # consecutive measurements = the drifted odometry (consistent with init)
    meas = [se3.se3_compose(poses[i], se3.se3_inverse(poses[j]))
            for i, j in zip(edge_i, edge_j)]
    if loop:
        # loop edge: last frame sees the first with the TRUE relative pose
        edge_i.append(n - 1)
        edge_j.append(0)
        meas.append(se3.se3_compose(gt[n - 1], se3.se3_inverse(gt[0])))
    E = len(edge_i)
    g = PoseGraph(
        poses=poses,
        pose_valid=jnp.ones((n,), bool),
        edge_i=jnp.asarray(edge_i, jnp.int32),
        edge_j=jnp.asarray(edge_j, jnp.int32),
        edge_meas=jnp.stack(meas),
        edge_valid=jnp.ones((E,), bool),
    )
    return g, gt, poses


def centers(poses):
    R = np.asarray(poses)[:, :3, :3]
    t = np.asarray(poses)[:, :3, 3]
    return -np.einsum("nij,ni->nj", R, t)


def test_pgo_closes_the_loop():
    g, gt, drifted = build_graph()
    out = optimize_pose_graph(g, iters=22)
    err_before = np.linalg.norm(centers(drifted) - centers(gt), axis=1)
    err_after = np.linalg.norm(centers(out) - centers(gt), axis=1)
    # mid-loop residual is the MAP optimum under noisy odometry; the hard
    # guarantee is that the loop-end drift collapses and the overall error
    # shrinks substantially
    assert err_after.max() < err_before.max() * 0.7
    # end-of-loop error (the drift accumulation point) collapses
    assert err_after[-1] < 0.05


def test_pgo_first_pose_fixed():
    g, gt, drifted = build_graph()
    out = optimize_pose_graph(g, iters=10)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(g.poses[0]),
                               atol=1e-6)


def test_pgo_no_loop_stays_consistent():
    # without a loop edge the drifted trajectory is already consistent with
    # the measurements -> PGO must not change it (chi2 is already ~0)
    g, gt, drifted = build_graph(loop=False)
    out = optimize_pose_graph(g, iters=5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(drifted), atol=1e-3)


def test_pgo_respects_validity_padding():
    g, gt, drifted = build_graph(n=20)
    T = 32  # pad to 32 slots
    pad = T - 20
    g2 = PoseGraph(
        poses=jnp.concatenate([g.poses, jnp.tile(se3.se3_identity()[None], (pad, 1, 1))]),
        pose_valid=jnp.concatenate([g.pose_valid, jnp.zeros((pad,), bool)]),
        edge_i=jnp.concatenate([g.edge_i, jnp.zeros((4,), jnp.int32)]),
        edge_j=jnp.concatenate([g.edge_j, jnp.zeros((4,), jnp.int32)]),
        edge_meas=jnp.concatenate([g.edge_meas,
                                   jnp.tile(se3.se3_identity()[None], (4, 1, 1))]),
        edge_valid=jnp.concatenate([g.edge_valid, jnp.zeros((4,), bool)]),
    )
    out = optimize_pose_graph(g2, iters=10)
    assert np.all(np.isfinite(np.asarray(out)))
    # padded slots untouched
    np.testing.assert_allclose(np.asarray(out[20:]),
                               np.asarray(g2.poses[20:]), atol=1e-6)


def test_reanchor_landmarks():
    old = jnp.stack([se3.se3_identity(),
                     se3.se3_exp(jnp.array([1.0, 0, 0, 0, 0, 0]))])
    # new poses: kf1 shifted by additional +1 x
    new = jnp.stack([se3.se3_identity(),
                     se3.se3_exp(jnp.array([2.0, 0, 0, 0, 0, 0]))])
    lm = jnp.array([[5.0, 0.0, 10.0], [1.0, 1.0, 4.0]])
    first = jnp.array([1, -1], jnp.int32)
    out = reanchor_landmarks(lm, first, old, new, jnp.ones(2, bool))
    # landmark 0 anchored to kf1: rig-frame point preserved =>
    # world pos shifts by the pose delta (T_new^-1 T_old) = -1 in x
    np.testing.assert_allclose(np.asarray(out[0]), [4.0, 0.0, 10.0], atol=1e-5)
    # landmark 1 has no anchor -> unchanged
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(lm[1]), atol=1e-6)


# ---------------------------------------------------------------------------
# Information-weighted loop edges.
#
# Scenario calibration matters here: the corruption must be FAR larger than
# the odometry drift for "the blind direction is ignored" to be observable,
# and the assertion floor is what PGO achieves with a PERFECTLY CLEAN loop
# edge (a single loop edge only constrains the loop endpoint; mid-loop drift
# is irreducible — measured: at drift sigma 0.004/step the clean-edge floor
# is 0.78 m max error because rotational drift x the 20 m lever dominates).
# At sigma 5e-4/step: drift max 0.18 m, clean floor 0.16 m, so a 0.8 m
# corruption is ~9x the drift and its signature is unambiguous.
# ---------------------------------------------------------------------------

_INFO_DRIFT = 5e-4


def _corrupted_loop_graph(delta_resid=None, meas_override=None):
    """Graph with the loop edge corrupted by +delta in the RESIDUAL tangent
    frame (meas' = meas . exp(-delta) makes r = log(meas'^-1 Ti Tj^-1) pick
    up exactly +delta at the true poses)."""
    g, gt, drifted = build_graph(drift=_INFO_DRIFT)
    meas = np.asarray(g.edge_meas).copy()
    if meas_override is not None:
        meas[-1] = np.asarray(meas_override(jnp.asarray(meas[-1])))
    else:
        meas[-1] = np.asarray(se3.se3_compose(
            jnp.asarray(meas[-1]), se3.se3_exp(-jnp.asarray(delta_resid))))
    return g._replace(edge_meas=jnp.asarray(meas)), g, gt, drifted


def _with_loop_info(g, info_last):
    E = g.edge_i.shape[0]
    info = np.tile(np.eye(6, dtype=np.float32)[None], (E, 1, 1))
    info[-1] = np.asarray(info_last)
    return g._replace(edge_info=jnp.asarray(info))


def _errs(out, gt):
    return np.linalg.norm(centers(out) - centers(gt), axis=1)


def test_info_weighted_loop_edge_ignores_blind_directions():
    """A loop edge whose information matrix is rank-deficient must correct
    the observed directions and leave the blind ones alone (the round-4 fix
    for PGO degrading the trajectory: a PnP loop pose can be wrong along
    its unobservable tangent directions, and an identity-weighted edge
    pushes the whole trajectory into that null space)."""
    bad = np.zeros(6, np.float32)
    bad[1] = 0.8                                   # y-translation, 0.8 m
    g_bad, g_clean, gt, drifted = _corrupted_loop_graph(bad)
    info = np.eye(6, dtype=np.float32)
    info[1, 1] = 0.0                               # y-translation: blind

    err_clean = _errs(optimize_pose_graph(g_clean, iters=22), gt)
    err_info = _errs(optimize_pose_graph(_with_loop_info(g_bad, info),
                                         iters=22), gt)
    err_ident = _errs(optimize_pose_graph(g_bad, iters=22), gt)

    # the blind-direction corruption must be (near-)invisible: the weighted
    # solve matches the clean-edge floor, the identity solve is dragged
    assert err_info.max() < err_clean.max() + 0.05, (err_info.max(),
                                                     err_clean.max())
    assert err_info.max() < 0.25, err_info.max()
    assert err_ident.max() > 0.4, err_ident.max()
    # observed directions still get their loop correction: the x/z endpoint
    # error collapses (the y drift stays — that direction is unconstrained)
    delta_xz = (centers(optimize_pose_graph(_with_loop_info(g_bad, info),
                                            iters=22)) - centers(gt))[-1][[0, 2]]
    assert np.linalg.norm(delta_xz) < 0.05, delta_xz


def test_info_weighted_rotated_blind_direction():
    """Frame correctness, part 1: the blind direction is NOT axis-aligned.
    info = I - u u^T (u a unit tangent direction mixing x and y translation)
    must gate a corruption along u — and an AXIS-aligned y-blind info must
    NOT (proving the whitening really lives in the residual tangent frame,
    not in any per-axis approximation)."""
    u = np.array([0.6, 0.8, 0.0, 0.0, 0.0, 0.0], np.float32)
    g_bad, g_clean, gt, drifted = _corrupted_loop_graph(0.8 * u)
    info_u = np.eye(6, dtype=np.float32) - np.outer(u, u)
    info_y = np.eye(6, dtype=np.float32)
    info_y[1, 1] = 0.0

    err_clean = _errs(optimize_pose_graph(g_clean, iters=22), gt)
    err_u = _errs(optimize_pose_graph(_with_loop_info(g_bad, info_u),
                                      iters=22), gt)
    err_y = _errs(optimize_pose_graph(_with_loop_info(g_bad, info_y),
                                      iters=22), gt)
    err_ident = _errs(optimize_pose_graph(g_bad, iters=22), gt)

    assert err_u.max() < err_clean.max() + 0.05, (err_u.max(), err_clean.max())
    assert err_ident.max() > 0.4, err_ident.max()
    # wrong-frame info only gates the y component of u -> visibly dragged
    assert err_y.max() > err_u.max() + 0.15, (err_y.max(), err_u.max())


def test_info_pose_frame_hessian_needs_adjoint_transport():
    """Frame correctness, part 2: the PnP-Hessian pathway. The loop solve's
    Hessian lives in the LEFT tangent of the corrected pose Ti; a blind
    direction there (here: mixed y-translation + x-rotation, so the adjoint's
    lever-arm coupling matters) must be transported into the edge-residual
    tangent by Adj(meas) before whitening — exactly what fused_loop.py does.
    The untransported matrix is measurably wrong (2x the clean floor)."""
    delta = np.array([0.0, 0.45, 0.0, 0.2, 0.0, 0.0], np.float32)
    u = delta / np.linalg.norm(delta)
    # PnP pose wrong by exp(delta) on the left => meas' = exp(delta) . meas
    g_bad, g_clean, gt, drifted = _corrupted_loop_graph(
        meas_override=lambda m: se3.se3_compose(
            se3.se3_exp(jnp.asarray(delta)), m))
    H_pose = np.eye(6, dtype=np.float32) - np.outer(u, u)
    A = np.asarray(se3.se3_adjoint(jnp.asarray(
        np.asarray(g_bad.edge_meas)[-1])))
    H_res = A.T @ H_pose @ A
    H_res = (H_res / np.linalg.eigvalsh(H_res).max()).astype(np.float32)

    err_clean = _errs(optimize_pose_graph(g_clean, iters=22), gt)
    err_good = _errs(optimize_pose_graph(_with_loop_info(g_bad, H_res),
                                         iters=22), gt)
    err_raw = _errs(optimize_pose_graph(_with_loop_info(g_bad, H_pose),
                                        iters=22), gt)
    err_ident = _errs(optimize_pose_graph(g_bad, iters=22), gt)

    assert err_good.max() < err_clean.max() + 0.05, (err_good.max(),
                                                     err_clean.max())
    assert err_ident.max() > 1.0, err_ident.max()
    # without the transport the blind direction lands rotated in the
    # residual frame and leaks through the whitening
    assert err_raw.max() > err_good.max() + 0.15, (err_raw.max(),
                                                   err_good.max())


def test_dense_rank_deficient_info_still_optimizes():
    """Regression: float32 Cholesky of a DENSE exactly-rank-deficient info
    matrix NaN'd, the NaN poisoned chi2, and the LM accept test silently
    rejected every step — optimize_pose_graph returned its input unchanged.
    The eigh-based whitening must keep optimizing."""
    delta = np.array([0.0, 0.45, 0.0, 0.2, 0.0, 0.0], np.float32)
    u = delta / np.linalg.norm(delta)
    g_bad, g_clean, gt, drifted = _corrupted_loop_graph(
        meas_override=lambda m: se3.se3_compose(
            se3.se3_exp(jnp.asarray(delta)), m))
    A = np.asarray(se3.se3_adjoint(jnp.asarray(
        np.asarray(g_bad.edge_meas)[-1])))
    H = A.T @ (np.eye(6, dtype=np.float32) - np.outer(u, u)) @ A
    H = (H / np.linalg.eigvalsh(H).max()).astype(np.float32)
    out = optimize_pose_graph(_with_loop_info(g_bad, H), iters=22)
    assert np.all(np.isfinite(np.asarray(out)))
    # the poses MUST move (loop-end drift gets corrected in observed dirs)
    moved = np.abs(np.asarray(out) - np.asarray(g_bad.poses)).max()
    assert moved > 1e-3, moved


def test_identity_info_matches_no_info():
    """edge_info = stacked identities must reproduce the default path."""
    g, gt, drifted = build_graph()
    E = g.edge_i.shape[0]
    g_eye = g._replace(edge_info=jnp.tile(jnp.eye(6)[None], (E, 1, 1)))
    out_a = optimize_pose_graph(g, iters=10)
    out_b = optimize_pose_graph(g_eye, iters=10)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-4)
