"""Distributed global pose-graph optimization over a device mesh.

The reference runs its shutdown PGO single-threaded through g2o and logs
"Takes seconds to minutes" (/root/reference/src/loopclosure.cpp:655,641-799).
The single-chip redesign (slam/pose_graph.py) already makes it a matrix-free
PCG; this module scales it across a mesh for city-scale maps:

  - **edges sharded** over every mesh axis (flattened): each device
    linearizes its edge shard and contributes partial gradient / diagonal /
    Hessian-vector scatters;
  - **vertices replicated**: pose state and the CG vectors (x, r, p) live on
    every device, so each PCG step is one `psum` over ICI (the edge-scatter
    completion) and zero gathers — the SLAM analogue of data-parallel
    gradient all-reduce;
  - LM damping/accept logic is identical to the single-chip path (shared
    `_optimize` body), so results match to float tolerance; tests assert it.

Edge shards are load-balanced by construction (contiguous equal chunks of
the padded edge list); invalid padding edges carry zero weight.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from stereovision_slam_tpu.slam.pose_graph import PoseGraph, _optimize


def _pad_edges(g: PoseGraph, n: int) -> PoseGraph:
    """Pad the edge list to a multiple of n with zero-weight self edges."""
    E = g.edge_i.shape[0]
    pad = (-E) % n
    if pad == 0:
        return g
    ident = jnp.tile(jnp.eye(3, 4, dtype=g.edge_meas.dtype)[None],
                     (pad, 1, 1))
    return g._replace(
        edge_i=jnp.concatenate([g.edge_i, jnp.zeros(pad, g.edge_i.dtype)]),
        edge_j=jnp.concatenate([g.edge_j, jnp.zeros(pad, g.edge_j.dtype)]),
        edge_meas=jnp.concatenate([g.edge_meas, ident]),
        edge_valid=jnp.concatenate([g.edge_valid, jnp.zeros(pad, bool)]),
    )


def build_sharded_pgo(mesh: Mesh, iters: int = 22, cg_iters: int = 100):
    """Build a jitted distributed PGO: (PoseGraph) -> refined (T, 3, 4) poses.

    Shards edges over all axes of `mesh`; poses replicate. Semantics match
    `optimize_pose_graph(g, iters, cg_iters)` exactly (same LM/PCG body).
    """
    axes = tuple(mesh.axis_names)
    n = 1
    for name in axes:
        n *= mesh.shape[name]

    edge_sharded = PoseGraph(
        poses=P(), pose_valid=P(),
        edge_i=P(axes), edge_j=P(axes), edge_meas=P(axes), edge_valid=P(axes),
    )

    @partial(shard_map, mesh=mesh, in_specs=(edge_sharded,),
             out_specs=P(), check_vma=False)
    def pgo(g_local: PoseGraph):
        return _optimize(g_local, iters, cg_iters,
                         reduce_fn=lambda x: lax.psum(x, axes))

    @jax.jit
    def run(g: PoseGraph):
        return pgo(_pad_edges(g, n))

    return run
