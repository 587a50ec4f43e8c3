"""Distributed BA on a virtual 8-device CPU mesh vs the single-chip solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereovision_slam_tpu.parallel.mesh import make_ba_mesh
from stereovision_slam_tpu.parallel.sharded_ba import build_sharded_ba
from stereovision_slam_tpu.slam.backend import optimize_window
from stereovision_slam_tpu.geometry import se3
from tests.test_backend_ba import build_window, reproj_rmse, K, F, L


@pytest.fixture(scope="module")
def window():
    return build_window(seed=5, pose_noise=0.03, lm_noise=0.2, px_noise=0.2)


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_ba_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["mp"] == 8
    assert mesh.shape["mp"] > 1  # 2-D split exercised


def test_sharded_ba_matches_single_chip(window):
    m, poses_gt, lms_gt, lm_slots, cams = window
    mesh = make_ba_mesh(8)
    run = build_sharded_ba(mesh, K, F, L, iters=10)
    kf_sharded, lm_sharded = run(m, cams[0], cams[1])

    m_single, _ = optimize_window(
        jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, m),
        cams[0], cams[1], iters=10, outlier_rounds=0)

    valid = np.asarray(m_single.kf_valid)
    np.testing.assert_allclose(
        np.asarray(kf_sharded)[valid], np.asarray(m_single.kf_pose)[valid],
        atol=5e-3)
    lmv = np.asarray(m_single.lm_valid)
    np.testing.assert_allclose(
        np.asarray(lm_sharded)[lmv], np.asarray(m_single.lm_pos)[lmv],
        atol=5e-2)


def test_sharded_ba_improves_geometry(window):
    m, poses_gt, lms_gt, lm_slots, cams = window
    mesh = make_ba_mesh(8)
    run = build_sharded_ba(mesh, K, F, L, iters=10)
    kf_new, lm_new = run(m, cams[0], cams[1])

    k_last = 4
    rel_est = se3.se3_compose(kf_new[k_last], se3.se3_inverse(kf_new[0]))
    rel_gt = se3.se3_compose(poses_gt[k_last], se3.se3_inverse(poses_gt[0]))
    err = float(se3.se3_distance(rel_est, rel_gt))
    assert err < 2e-2, f"relative pose error {err}"


def test_sharded_ba_compaction_matches_full(window):
    """Compacted sharded solve == full sharded solve (same semantics as the
    single-chip compaction, but the gather happens outside shard_map)."""
    m, poses_gt, lms_gt, lm_slots, cams = window
    mesh = make_ba_mesh(8)
    run_full = build_sharded_ba(mesh, K, F, L, iters=10)
    run_cmp = build_sharded_ba(mesh, K, F, L, iters=10,
                               max_active_landmarks=128)
    kf_f, lm_f = run_full(m, cams[0], cams[1])
    kf_c, lm_c = run_cmp(m, cams[0], cams[1])
    np.testing.assert_allclose(np.asarray(kf_f), np.asarray(kf_c), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lm_f), np.asarray(lm_c), atol=1e-4)


def test_sharded_ba_various_mesh_shapes(window):
    m, poses_gt, lms_gt, lm_slots, cams = window
    for dp, mp in [(8, 1), (2, 4)]:
        mesh = make_ba_mesh(8, dp=dp, mp=mp)
        run = build_sharded_ba(mesh, K, F, L, iters=5)
        kf_new, lm_new = run(m, cams[0], cams[1])
        assert np.all(np.isfinite(np.asarray(kf_new)))
        assert np.all(np.isfinite(np.asarray(lm_new)))
