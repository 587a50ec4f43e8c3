"""Regression tests for the pose-solver stability fixes (round-1 lessons):
multi-start basin escape and graduated non-convexity."""

import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.geometry import se3, jacobians
from stereovision_slam_tpu.slam.pose_solver import solve_pose, solve_pose_multi
from tests import synthetic


def biased_problem(seed=0, n=150, bias_px=3.0):
    """Correspondences whose observations carry a coherent bias — the regime
    where a single-start robust solve sticks near its init."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    left, _ = synthetic.make_stereo_rig()
    T_true = se3.se3_exp(jnp.array([0.5, -0.2, 2.0, 0.01, 0.05, -0.02]))
    pts_rig = synthetic.random_landmarks(k1, n, z_range=(6.0, 45.0))
    pts_w = se3.se3_apply(se3.se3_inverse(T_true), pts_rig)
    uv, _ = jacobians.project_points(left, T_true, pts_w)
    uv = uv + jax.random.normal(k2, uv.shape) * 0.5
    return left, T_true, pts_w, uv, jnp.ones(n, bool)


def test_multi_start_recovers_from_drifted_prediction():
    left, T_true, pts, uv, valid = biased_problem()
    # a drifted constant-velocity prediction ~0.5m off (the divergence regime)
    T_bad = se3.se3_compose(
        se3.se3_exp(jnp.array([0.2, 0.1, 0.45, 0.01, 0.02, 0.0])), T_true)
    # zero-motion alternative: much closer to truth
    T_zero = se3.se3_compose(
        se3.se3_exp(jnp.array([0.0, 0.0, 0.05, 0.0, 0.0, 0.0])), T_true)
    inits = jnp.stack([T_bad, T_zero,
                       se3.se3_compose(se3.se3_exp(
                           jnp.array([0.1, 0.05, 0.25, 0.005, 0.01, 0.0])),
                           T_true)])
    T_multi, inl, n_in = solve_pose_multi(left, inits, pts, uv, valid)
    err_multi = float(se3.se3_distance(T_multi, T_true))
    T_single, _, _ = solve_pose(left, T_bad, pts, uv, valid)
    err_single = float(se3.se3_distance(T_single, T_true))
    assert err_multi <= err_single + 1e-6
    assert err_multi < 0.05, f"multi-start err {err_multi:.3f}"
    assert int(n_in) > 100


def test_multi_start_single_init_equals_solve_pose():
    left, T_true, pts, uv, valid = biased_problem(seed=1)
    T0 = se3.se3_compose(se3.se3_exp(jnp.array([0.05, 0.0, 0.1, 0.0, 0.01, 0.0])), T_true)
    T_a, inl_a, n_a = solve_pose(left, T0, pts, uv, valid)
    T_b, inl_b, n_b = solve_pose_multi(left, T0[None], pts, uv, valid)
    np.testing.assert_allclose(np.asarray(T_a), np.asarray(T_b), atol=1e-6)
    assert int(n_a) == int(n_b)


def test_gnc_recovers_with_moderate_init_error():
    """With GNC the single-start solver must handle inits that displace
    features beyond the plain chi2 gate (~2.5px) but within the widened one."""
    left, T_true, pts, uv, valid = biased_problem(seed=2)
    T0 = se3.se3_compose(
        se3.se3_exp(jnp.array([0.05, 0.02, 0.15, 0.002, 0.004, 0.0])), T_true)
    T, inl, n_in = solve_pose(left, T0, pts, uv, valid)
    assert float(se3.se3_distance(T, T_true)) < 0.03
    assert int(n_in) > 120
