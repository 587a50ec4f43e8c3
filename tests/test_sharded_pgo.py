"""Distributed PGO: mesh-sharded edges must match the single-device solver."""

import numpy as np

import jax.numpy as jnp

from stereovision_slam_tpu.parallel.mesh import make_ba_mesh
from stereovision_slam_tpu.parallel.sharded_pgo import build_sharded_pgo
from stereovision_slam_tpu.slam.pose_graph import (
    _linearize, optimize_pose_graph)

from tests.test_pose_graph import build_graph, centers


def chi2(g, poses):
    r, _, _ = _linearize(g._replace(poses=jnp.asarray(poses)))
    return float(jnp.sum(r * r))


def test_sharded_pgo_matches_single_device():
    # per-shard partial-sum order differs from the single full scatter, so
    # float32 non-associativity drifts through 22 accept/reject LM rounds;
    # the contract is equal optimization quality + same trajectory to the
    # tolerances the sharded-BA tests use (test_sharded_ba.py)
    g, gt, drifted = build_graph(n=40)
    mesh = make_ba_mesh(8)
    run = build_sharded_pgo(mesh, iters=22, cg_iters=100)
    out_sharded = np.asarray(run(g))
    out_single = np.asarray(optimize_pose_graph(g, iters=22, cg_iters=100))
    np.testing.assert_allclose(out_sharded, out_single, atol=5e-2)
    assert chi2(g, out_sharded) <= chi2(g, out_single) * 1.05 + 1e-8


def test_sharded_pgo_closes_the_loop():
    g, gt, drifted = build_graph(n=40)
    mesh = make_ba_mesh(8)
    run = build_sharded_pgo(mesh)
    out = np.asarray(run(g))
    err_before = np.linalg.norm(centers(drifted) - centers(gt), axis=1)
    err_after = np.linalg.norm(centers(out) - centers(gt), axis=1)
    assert err_after.max() < err_before.max() * 0.7
    assert err_after[-1] < 0.05


def test_sharded_pgo_odd_edge_count_pads():
    # 20 keyframes + loop edge = 20 edges... build with n=21 so E=21, which
    # does not divide the 8-device mesh -> exercises the padding path
    g, gt, drifted = build_graph(n=21)
    assert g.edge_i.shape[0] % 8 != 0
    mesh = make_ba_mesh(8)
    run = build_sharded_pgo(mesh, iters=10)
    out_sharded = np.asarray(run(g))
    out_single = np.asarray(optimize_pose_graph(g, iters=10))
    np.testing.assert_allclose(out_sharded, out_single, atol=5e-2)
    assert chi2(g, out_sharded) <= chi2(g, out_single) * 1.05 + 1e-8
