"""The fused Pallas pose solver vs the XLA `_lm_rounds` schedule.

The kernel's 6x6 solve is an unrolled Cholesky (XLA: LU custom call) and its
reductions associate differently, so parity is semantic, not bitwise: on
healthy synthetic problems the kernel must recover the same pose (sub-mm),
the same inlier set, and an equal-or-comparable robust cost.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.geometry import se3, jacobians
from stereovision_slam_tpu.ops.pose_pallas import solve_pose_multi_lr
from stereovision_slam_tpu.slam.frontend import _blend_obs_cameras
from stereovision_slam_tpu.slam.pose_solver import solve_pose_multi
from tests import synthetic


def _problem(seed=0, F=128, n_out=6, px_noise=0.25):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    left, right = synthetic.make_stereo_rig()
    T_gt = se3.se3_exp(jnp.asarray([0.3, -0.1, 0.5, 0.02, -0.03, 0.01]))
    pts = synthetic.random_landmarks(ks[0], F, x_range=(-8, 8),
                                     y_range=(-3, 3), z_range=(6, 40))
    uv_l, _ = jacobians.project_points(left, T_gt, pts)
    uv_r, _ = jacobians.project_points(right, T_gt, pts)
    uv_l = uv_l + jax.random.normal(ks[1], uv_l.shape) * px_noise
    uv_r = uv_r + jax.random.normal(ks[2], uv_r.shape) * px_noise
    if n_out:
        uv_l = uv_l.at[:n_out].add(35.0)  # gross outliers
    valid_l = jnp.ones((F,), bool)
    valid_r = jnp.ones((F,), bool).at[F - 3:].set(False)
    # starts: perturbed guess, identity-ish, another perturbation
    T0 = se3.se3_compose(se3.se3_exp(jnp.asarray(
        [0.05, 0.02, -0.08, 0.01, 0.005, -0.01])), T_gt)
    T_inits = jnp.stack([T0, se3.se3_identity(), se3.se3_compose(
        se3.se3_exp(jnp.asarray([-0.1, 0.0, 0.1, 0.0, 0.01, 0.0])), T_gt)])
    return (left, right), T_gt, pts, uv_l, uv_r, valid_l, valid_r, T_inits


def _xla_solve(cams, T_inits, pts, uv_l, uv_r, valid_l, valid_r,
               rounds=3, iters=6):
    left, right = cams
    F = pts.shape[0]
    cam_obs = _blend_obs_cameras(left, right, F, F)
    return solve_pose_multi(
        cam_obs, T_inits, jnp.concatenate([pts, pts]),
        jnp.concatenate([uv_l, uv_r]),
        jnp.concatenate([valid_l, valid_r]),
        chi2_th=5.991, rounds=rounds, iters=iters)


def test_pose_kernel_matches_xla_interpret():
    cams, T_gt, pts, uv_l, uv_r, vl, vr, T_inits = _problem()
    T_x, inl_x, _ = _xla_solve(cams, T_inits, pts, uv_l, uv_r, vl, vr)
    T_p, inl_p, n_p = solve_pose_multi_lr(
        cams[0], cams[1], T_inits, pts, uv_l, uv_r, vl, vr,
        chi2_th=5.991, rounds=3, iters=6, interpret=True)
    # both must recover the ground-truth pose (noise-floor accuracy)
    err_x = float(jnp.linalg.norm(se3.se3_log(
        se3.se3_compose(T_x, se3.se3_inverse(T_gt)))))
    err_p = float(jnp.linalg.norm(se3.se3_log(
        se3.se3_compose(T_p, se3.se3_inverse(T_gt)))))
    assert err_p < 5e-3, err_p
    assert err_p < err_x * 1.5 + 1e-3
    # same outlier classification
    agree = float(jnp.mean((inl_p == inl_x).astype(jnp.float32)))
    assert agree > 0.97, agree
    # the planted gross outliers must be rejected
    assert not bool(jnp.any(inl_p[:6]))
    assert int(n_p) > 100


def test_pose_kernel_masks_and_degenerate():
    cams, T_gt, pts, uv_l, uv_r, vl, vr, T_inits = _problem(
        seed=3, n_out=0, px_noise=0.0)
    # all-invalid right half + a behind-camera point must not produce NaNs
    vr = jnp.zeros_like(vr)
    pts = pts.at[0].set(jnp.asarray([0.0, 0.0, -5.0]))
    T_p, inl_p, n_p = solve_pose_multi_lr(
        cams[0], cams[1], T_inits, pts, uv_l, uv_r, vl, vr,
        chi2_th=5.991, rounds=3, iters=6, interpret=True)
    assert bool(jnp.all(jnp.isfinite(T_p)))
    err = float(jnp.linalg.norm(se3.se3_log(
        se3.se3_compose(T_p, se3.se3_inverse(T_gt)))))
    assert err < 5e-3, err
    assert not bool(inl_p[0])  # behind-camera point is never an inlier
