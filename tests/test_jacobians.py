import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.geometry import se3, jacobians
from stereovision_slam_tpu.geometry.camera import Camera


def setup_scene(n=32, ext_x=-0.3, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    cam = Camera.create(
        fx=400.0, fy=410.0, cx=320.0, cy=100.0, baseline=abs(ext_x),
        pose=se3.se3_from_Rt(jnp.eye(3), jnp.array([ext_x, 0.0, 0.0])))
    T = se3.se3_exp(jax.random.normal(k1, (6,)) * 0.1)
    p_w = jax.random.uniform(k2, (n, 3),
                             minval=jnp.array([-8.0, -4.0, 5.0]),
                             maxval=jnp.array([8.0, 4.0, 60.0]))
    uv_obs = jax.random.uniform(k3, (n, 2), minval=0.0, maxval=600.0)
    return cam, T, p_w, uv_obs


def test_pose_jacobian_vs_autodiff():
    cam, T, p_w, uv_obs = setup_scene()
    r, J_pose, J_point, _ = jacobians.reprojection_residual_jac(cam, T, p_w, uv_obs)

    def res_of_xi(xi, i):
        Tp = se3.se3_compose(se3.se3_exp(xi), T)
        rr, *_ = jacobians.reprojection_residual_jac(cam, Tp, p_w[i], uv_obs[i])
        return rr

    for i in [0, 7, 31]:
        J_auto = jax.jacfwd(res_of_xi)(jnp.zeros(6), i)
        np.testing.assert_allclose(np.asarray(J_pose[i]), np.asarray(J_auto),
                                   atol=1e-2, rtol=1e-3)


def test_point_jacobian_vs_autodiff():
    cam, T, p_w, uv_obs = setup_scene(seed=1)

    _, _, J_point, _ = jacobians.reprojection_residual_jac(cam, T, p_w, uv_obs)

    def res_of_p(p, i):
        rr, *_ = jacobians.reprojection_residual_jac(cam, T, p, uv_obs[i])
        return rr

    for i in [0, 5, 20]:
        J_auto = jax.jacfwd(res_of_p)(p_w[i], i)
        np.testing.assert_allclose(np.asarray(J_point[i]), np.asarray(J_auto),
                                   atol=1e-2, rtol=1e-3)


def test_residual_zero_at_true_projection():
    cam, T, p_w, _ = setup_scene(seed=2)
    uv, _ = jacobians.project_points(cam, T, p_w)
    r, *_ = jacobians.reprojection_residual_jac(cam, T, p_w, uv)
    np.testing.assert_allclose(np.asarray(r), np.zeros_like(np.asarray(r)), atol=1e-3)


def test_relative_pose_residual_zero_and_jac():
    key = jax.random.PRNGKey(3)
    k0, k1 = jax.random.split(key)
    T0 = se3.se3_exp(jax.random.normal(k0, (6,)) * 0.5)
    T1 = se3.se3_exp(jax.random.normal(k1, (6,)) * 0.5)
    T01 = se3.se3_compose(T0, se3.se3_inverse(T1))
    r = jacobians.relative_pose_residual(T0, T1, T01)
    np.testing.assert_allclose(np.asarray(r), np.zeros(6), atol=1e-5)


def test_huber_weight():
    d2 = jnp.asarray(5.991)
    w_in = jacobians.huber_weight(jnp.asarray(1.0), d2)
    w_out = jacobians.huber_weight(jnp.asarray(100.0), d2)
    assert float(w_in) == 1.0
    np.testing.assert_allclose(float(w_out), np.sqrt(5.991 / 100.0), rtol=1e-5)
