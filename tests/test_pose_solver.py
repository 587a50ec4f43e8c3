import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.geometry import se3, jacobians
from stereovision_slam_tpu.slam.pose_solver import solve_pose
from tests import synthetic


def make_problem(seed=0, n=128, noise=0.0, outlier_frac=0.0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    left, _ = synthetic.make_stereo_rig()
    T_true = se3.se3_exp(jax.random.normal(k1, (6,)) * jnp.array(
        [0.5, 0.2, 0.5, 0.02, 0.05, 0.02]))
    pts = synthetic.random_landmarks(k2, n)
    # landmarks are in world coords; pts generated in rig frame of T_true
    pts_w = se3.se3_apply(se3.se3_inverse(T_true), pts)
    uv, _ = jacobians.project_points(left, T_true, pts_w)
    if noise > 0:
        uv = uv + jax.random.normal(k3, uv.shape) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        bad = jax.random.uniform(k4, (n_out, 2), minval=0.0, maxval=600.0)
        uv = uv.at[:n_out].set(bad)
    valid = jnp.ones(n, dtype=bool)
    return left, T_true, pts_w, uv, valid, n_out


def pose_err(Ta, Tb):
    return float(se3.se3_distance(Ta, Tb))


def test_exact_observations_recovers_pose():
    left, T_true, pts, uv, valid, _ = make_problem()
    T0 = se3.se3_compose(se3.se3_exp(jnp.array([0.3, -0.2, 0.4, 0.01, 0.03, -0.02])), T_true)
    T, inlier, n_in = solve_pose(left, T0, pts, uv, valid)
    assert pose_err(T, T_true) < 1e-3
    assert int(n_in) == pts.shape[0]


def test_noisy_observations():
    left, T_true, pts, uv, valid, _ = make_problem(seed=1, noise=0.5)
    T0 = se3.se3_compose(se3.se3_exp(jnp.array([0.2, 0.1, -0.3, 0.02, -0.01, 0.01])), T_true)
    T, inlier, n_in = solve_pose(left, T0, pts, uv, valid)
    assert pose_err(T, T_true) < 0.02
    assert int(n_in) > pts.shape[0] * 0.8


def test_outliers_rejected():
    left, T_true, pts, uv, valid, n_out = make_problem(seed=2, noise=0.3,
                                                       outlier_frac=0.25)
    T0 = se3.se3_compose(se3.se3_exp(jnp.array([0.2, 0.0, -0.2, 0.0, 0.02, 0.0])), T_true)
    T, inlier, n_in = solve_pose(left, T0, pts, uv, valid)
    assert pose_err(T, T_true) < 0.02
    # the planted outliers must be flagged
    assert not bool(jnp.any(inlier[:n_out]))
    assert int(n_in) >= (pts.shape[0] - n_out) * 0.9


def test_invalid_mask_respected():
    left, T_true, pts, uv, valid, _ = make_problem(seed=3)
    valid = valid.at[50:].set(False)  # only 50 usable
    T0 = se3.se3_compose(se3.se3_exp(jnp.array([0.1, 0.1, 0.1, 0.01, 0.0, 0.0])), T_true)
    T, inlier, n_in = solve_pose(left, T0, pts, uv, valid)
    assert pose_err(T, T_true) < 1e-2
    assert not bool(jnp.any(inlier[50:]))


def test_points_behind_camera_excluded():
    left, T_true, pts, uv, valid, _ = make_problem(seed=4)
    # plant points behind the camera with arbitrary observations
    pts = pts.at[:10].set(se3.se3_apply(se3.se3_inverse(T_true),
                                        jnp.tile(jnp.array([[0.0, 0.0, -5.0]]), (10, 1))))
    T, inlier, n_in = solve_pose(left, T_true, pts, uv, valid)
    assert not bool(jnp.any(inlier[:10]))
    assert pose_err(T, T_true) < 1e-2
