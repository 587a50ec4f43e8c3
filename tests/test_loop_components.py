"""Tests for loop-closure building blocks: embedder, descriptors, matching, PnP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereovision_slam_tpu.models import mobilenet_v2 as mnv2
from stereovision_slam_tpu.ops import descriptors, matching, gftt, image as imops
from stereovision_slam_tpu.slam.pnp import pnp_ransac
from stereovision_slam_tpu.geometry import se3, jacobians
from tests import synthetic


# ---------------------------- MobileNet-V2 ---------------------------- #

@pytest.fixture(scope="module")
def mnv2_params():
    return mnv2.init_params(seed=0)


def test_mnv2_output_shape(mnv2_params):
    x = jnp.zeros((2, 96, 96, 3))
    out = mnv2.forward(mnv2_params, x)
    assert out.shape == (2, mnv2.EMBED_DIM)


def test_mnv2_embedding_normalized_and_deterministic(mnv2_params):
    img = synthetic.smooth_texture(jax.random.PRNGKey(1), 100, 200)
    e1 = mnv2.embed_image(mnv2_params, img)
    e2 = mnv2.embed_image(mnv2_params, img)
    np.testing.assert_allclose(float(jnp.linalg.norm(e1)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)


def test_mnv2_similarity_ranking(mnv2_params):
    key = jax.random.PRNGKey(2)
    img_a = synthetic.smooth_texture(key, 100, 200)
    img_a_shift = synthetic.translate_image(img_a, 3.0, 1.0)  # same place
    img_b = synthetic.smooth_texture(jax.random.PRNGKey(99), 100, 200)
    ea = mnv2.embed_image(mnv2_params, img_a)
    eas = mnv2.embed_image(mnv2_params, img_a_shift)
    eb = mnv2.embed_image(mnv2_params, img_b)
    sim_same = float(jnp.dot(ea, eas))
    sim_diff = float(jnp.dot(ea, eb))
    assert sim_same > sim_diff, (sim_same, sim_diff)


# ------------------------------ descriptors --------------------------- #

def test_descriptors_shape_and_validity():
    img = synthetic.smooth_texture(jax.random.PRNGKey(3), 160, 200)
    pts = jnp.array([[100.0, 80.0], [50.0, 50.0], [5.0, 5.0]])  # last near edge
    desc, ok = descriptors.compute(img, pts)
    assert desc.shape == (3, descriptors.N_WORDS)
    assert bool(ok[0]) and bool(ok[1])
    assert not bool(ok[2])


def test_descriptors_match_same_point_translated():
    key = jax.random.PRNGKey(4)
    img0 = synthetic.smooth_texture(key, 160, 200)
    img1 = synthetic.translate_image(img0, 7.0, -4.0)
    pts0, v0, _ = gftt.detect(img0, max_corners=32, min_distance=12)
    pts1 = pts0 + jnp.array([7.0, -4.0])
    d0, ok0 = descriptors.compute(img0, pts0, v0)
    d1, ok1 = descriptors.compute(img1, pts1, v0)
    idx, dist, good = matching.match(d0, ok0, d1, ok1)
    # the correct correspondence is the identity permutation
    both = np.asarray(ok0 & ok1 & good)
    assert both.sum() >= 10
    correct = (np.asarray(idx) == np.arange(32))[both]
    assert correct.mean() > 0.8, f"only {correct.mean():.2f} correct"


def test_hamming_matrix_basics():
    a = jnp.array([[0, 0]], dtype=jnp.uint32)
    b = jnp.array([[0, 0], [0xFFFFFFFF, 0xFFFFFFFF], [1, 0]], dtype=jnp.uint32)
    d = matching.hamming_matrix(a, b)
    assert d.tolist() == [[0, 64, 1]]


# --------------------------------- PnP -------------------------------- #

def test_pnp_ransac_exact():
    key = jax.random.PRNGKey(5)
    left, _ = synthetic.make_stereo_rig()
    T_true = se3.se3_exp(jnp.array([1.0, -0.5, 3.0, 0.05, -0.1, 0.02]))
    pts_rig = synthetic.random_landmarks(key, 64)
    pts_w = se3.se3_apply(se3.se3_inverse(T_true), pts_rig)
    uv, _ = jacobians.project_points(left, T_true, pts_w)
    valid = jnp.ones(64, bool)
    T_est, inl, n_in = pnp_ransac(left, pts_w, uv, valid,
                                  jax.random.PRNGKey(0))
    assert float(se3.se3_distance(T_est, T_true)) < 1e-2
    assert int(n_in) >= 60


def test_pnp_ransac_with_outliers():
    key = jax.random.PRNGKey(6)
    left, _ = synthetic.make_stereo_rig()
    T_true = se3.se3_exp(jnp.array([-2.0, 0.3, 5.0, 0.02, 0.3, -0.05]))
    pts_rig = synthetic.random_landmarks(key, 96)
    pts_w = se3.se3_apply(se3.se3_inverse(T_true), pts_rig)
    uv, _ = jacobians.project_points(left, T_true, pts_w)
    # 30% gross outliers
    n_bad = 28
    uv = uv.at[:n_bad].add(jax.random.uniform(jax.random.PRNGKey(7),
                                              (n_bad, 2), minval=40.0,
                                              maxval=120.0))
    valid = jnp.ones(96, bool)
    T_est, inl, n_in = pnp_ransac(left, pts_w, uv, valid,
                                  jax.random.PRNGKey(1))
    assert float(se3.se3_distance(T_est, T_true)) < 2e-2
    assert not bool(jnp.any(inl[:n_bad]))
    assert int(n_in) >= (96 - n_bad) * 0.9


def test_pnp_ransac_insufficient_points():
    left, _ = synthetic.make_stereo_rig()
    pts_w = jnp.zeros((16, 3)).at[:, 2].set(10.0)
    uv = jnp.full((16, 2), 100.0)
    valid = jnp.zeros(16, bool).at[:3].set(True)  # < minimal set
    T_est, inl, n_in = pnp_ransac(left, pts_w, uv, valid,
                                  jax.random.PRNGKey(2))
    assert np.all(np.isfinite(np.asarray(T_est)))


def test_pnp_ransac_noisy_with_outliers():
    """Realistic operating point: 0.5 px measurement noise + 20% gross
    outliers. Guards the LO-RANSAC second stage (re-classification over all
    candidates after refinement) and the 10-point hypothesis size — a
    minimal 6-point DLT collapses here (measured: best consensus ~3/200)."""
    left, _ = synthetic.make_stereo_rig()
    rng = np.random.default_rng(3)
    pts_w = jnp.asarray(np.stack([rng.uniform(-5, 5, 200),
                                  rng.uniform(-3, 3, 200),
                                  rng.uniform(6, 40, 200)], 1), jnp.float32)
    T_true = se3.se3_exp(jnp.array([0.3, -0.1, 0.8, 0.0, 0.1, 0.0]))
    uv, _ = jacobians.project_points(left, T_true, pts_w)
    uv = uv + jnp.asarray(rng.normal(0.0, 0.5, (200, 2)), jnp.float32)
    uv = uv.at[:40].add(jnp.asarray(rng.uniform(30, 80, (40, 2)), jnp.float32))
    T_est, inl, n_in = pnp_ransac(left, pts_w, uv, jnp.ones((200,), bool),
                                  jax.random.PRNGKey(0))
    assert int(n_in) >= 140, int(n_in)
    assert float(se3.se3_distance(T_est, T_true)) < 2e-2
    assert not bool(jnp.any(inl[:40]))
