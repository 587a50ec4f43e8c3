"""Pallas ring all-reduce (interpret mode, race detection on) vs lax.psum,
and the distributed BA built on it vs the XLA-collective build."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from stereovision_slam_tpu.parallel.mesh import make_ba_mesh
from stereovision_slam_tpu.parallel.ring_reduce import ring_psum
from stereovision_slam_tpu.parallel.sharded_ba import build_sharded_ba
from tests.test_backend_ba import build_window, K, F, L


def _mesh_2d(dp, mp):
    return Mesh(np.array(jax.devices()).reshape(dp, mp), ("dp", "mp"))


@pytest.mark.parametrize("axis,dp,mp", [("dp", 8, 1), ("dp", 4, 2),
                                        ("mp", 2, 4)])
def test_ring_psum_matches_lax_psum(axis, dp, mp):
    """Pytree of odd shapes, reduced along one axis of a 2-D mesh (exercises
    logical-id linearization, padding, and flattening)."""
    mesh = _mesh_2d(dp, mp)
    mesh_axes = tuple((n, mesh.shape[n]) for n in mesh.axis_names)
    rng = np.random.default_rng(0)
    tree = {
        "a": rng.normal(size=(8, 5, 7)).astype(np.float32),
        "b": rng.normal(size=(13,)).astype(np.float32),
        "c": rng.normal(size=(3, 3)).astype(np.float32),
    }
    n_ring = mesh.shape[axis]

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=P(),
                       out_specs=(P(), P()), check_vma=False)
    def f(t):
        # per-device distinct contribution so the sum is non-trivial
        scale = 1.0 + jax.lax.axis_index("dp") * 2.0 + jax.lax.axis_index("mp")
        local = jax.tree.map(lambda x: x * scale, t)
        ring = ring_psum(local, axis, mesh_axes, interpret=True)
        ref = jax.tree.map(lambda x: jax.lax.psum(x, axis), local)
        return ring, ref

    ring, ref = f(tree)
    for k in tree:
        np.testing.assert_allclose(np.asarray(ring[k]), np.asarray(ref[k]),
                                   rtol=1e-6)
        assert ring[k].shape == tree[k].shape


def test_sharded_ba_ring_matches_xla():
    m, poses_gt, lms_gt, lm_slots, cams = build_window(
        seed=5, pose_noise=0.03, lm_noise=0.2, px_noise=0.2)
    mesh = make_ba_mesh(8, dp=4, mp=2)
    run_ring = build_sharded_ba(mesh, K, F, L, iters=4, reduce_impl="ring")
    run_xla = build_sharded_ba(mesh, K, F, L, iters=4, reduce_impl="xla")
    kf_r, lm_r = run_ring(m, cams[0], cams[1])
    kf_x, lm_x = run_xla(m, cams[0], cams[1])
    np.testing.assert_allclose(np.asarray(kf_r), np.asarray(kf_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lm_r), np.asarray(lm_x), atol=1e-4)


def test_ring_psum_singleton_axis_is_identity():
    """dp=1 must not enter the kernel (zero hops would deadlock on the
    credit drain) — the reduction over a singleton axis is the identity."""
    mesh = _mesh_2d(1, 8)
    mesh_axes = tuple((n, mesh.shape[n]) for n in mesh.axis_names)
    x = np.arange(40, dtype=np.float32).reshape(8, 5)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=P(), out_specs=P(),
                       check_vma=False)
    def f(t):
        return ring_psum(t, "dp", mesh_axes, interpret=True)

    np.testing.assert_array_equal(np.asarray(f(x)), x)
