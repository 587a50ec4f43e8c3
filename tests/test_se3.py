import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereovision_slam_tpu.geometry import se3


def random_xi(key, n, scale=1.0):
    return jax.random.normal(key, (n, 6)) * scale


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    xi = random_xi(key, 64)
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=5e-4)


def test_exp_log_small_angle():
    xi = jnp.array([[1e-9, 2e-9, -1e-9, 1e-10, -1e-10, 1e-10],
                    [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]])
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    assert np.all(np.isfinite(np.asarray(xi2)))
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-7)


def test_log_near_pi():
    # rotation by nearly pi about an arbitrary axis
    axis = jnp.array([1.0, 2.0, -0.5])
    axis = axis / jnp.linalg.norm(axis)
    for theta in [np.pi - 1e-4, np.pi - 1e-7]:
        w = axis * theta
        R = se3.so3_exp(w)
        w2 = se3.so3_log(R)
        # log may return the antipodal representation; compare rotations
        R2 = se3.so3_exp(w2)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-3)


def test_compose_inverse_identity():
    key = jax.random.PRNGKey(1)
    T = se3.se3_exp(random_xi(key, 32))
    I = se3.se3_compose(T, se3.se3_inverse(T))
    eye = np.broadcast_to(np.asarray(se3.se3_identity()), I.shape)
    np.testing.assert_allclose(np.asarray(I), eye, atol=1e-5)


def test_compose_matches_matrix_product():
    key = jax.random.PRNGKey(2)
    ka, kb = jax.random.split(key)
    Ta = se3.se3_exp(random_xi(ka, 8))
    Tb = se3.se3_exp(random_xi(kb, 8))
    Tc = se3.se3_compose(Ta, Tb)
    Ma = np.asarray(se3.se3_matrix(Ta))
    Mb = np.asarray(se3.se3_matrix(Tb))
    Mc = np.asarray(se3.se3_matrix(Tc))
    np.testing.assert_allclose(Ma @ Mb, Mc, atol=1e-5)


def test_apply_matches_matrix():
    key = jax.random.PRNGKey(3)
    T = se3.se3_exp(random_xi(key, 4))
    p = jax.random.normal(jax.random.PRNGKey(4), (4, 3))
    out = se3.se3_apply(T, p)
    for i in range(4):
        M = np.asarray(se3.se3_matrix(T[i]))
        ph = np.concatenate([np.asarray(p[i]), [1.0]])
        np.testing.assert_allclose(np.asarray(out[i]), (M @ ph)[:3], atol=1e-5)


def test_rotation_orthonormal():
    key = jax.random.PRNGKey(5)
    T = se3.se3_exp(random_xi(key, 16, scale=3.0))
    R = np.asarray(se3.se3_R(T))
    RtR = np.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)


def test_distance_zero_and_symmetric_scale():
    key = jax.random.PRNGKey(6)
    T = se3.se3_exp(random_xi(key, 4))
    d = se3.se3_distance(T, T)
    np.testing.assert_allclose(np.asarray(d), np.zeros(4), atol=1e-5)


def test_exp_log_grads_finite():
    def f(xi):
        return jnp.sum(se3.se3_log(se3.se3_exp(xi)) ** 2)

    g = jax.grad(f)(jnp.array([0.1, -0.2, 0.3, 0.01, 0.02, -0.03]))
    assert np.all(np.isfinite(np.asarray(g)))
    g0 = jax.grad(f)(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(g0)))
