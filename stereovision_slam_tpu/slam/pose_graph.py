"""Global SE(3) pose-graph optimization.

TPU-native replacement for the reference's shutdown PGO
(/root/reference/src/loopclosure.cpp:641-799): all keyframes as pose
vertices (keyframe 0 fixed), unit-information SE(3) edges between consecutive
keyframes (measurement = relative_pose_pkf_) and between loop pairs
(measurement = loop_relative_pose_), Levenberg-Marquardt x 22 iterations,
then landmark re-anchoring through each landmark's first observing keyframe.

Redesign: instead of a g2o sparse Cholesky, the normal equations are solved
matrix-free — the Gauss-Newton matrix-vector product is an edge-wise
gather/scatter (two 6x6 block multiplies per edge), wrapped in a
block-Jacobi-preconditioned conjugate-gradient loop. Memory is O(T + E)
rather than O(T^2), so windows of thousands of keyframes fit easily, and
every step is batched VPU/MXU work. Edge Jacobians come from `jax.jacfwd`
of the exact residual (the reference linearizes the same error numerically
via g2o).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from stereovision_slam_tpu.geometry import se3, jacobians

_PREC = jax.lax.Precision.HIGHEST


class PoseGraph(NamedTuple):
    poses: jax.Array      # (T, 3, 4) initial T_c_w per keyframe slot
    pose_valid: jax.Array # (T,)
    edge_i: jax.Array     # (E,) first vertex index
    edge_j: jax.Array     # (E,) second vertex index
    edge_meas: jax.Array  # (E, 3, 4) measured T_i * T_j^-1
    edge_valid: jax.Array # (E,)
    edge_info: jax.Array | None = None  # (E, 6, 6) information matrices;
    #   None = identity everywhere (the reference's setting,
    #   loopclosure.cpp:728/748). Loop edges carry the PnP solve's
    #   NORMALIZED Hessian instead: a PnP pose from few, distant
    #   correspondences is near-unobservable along some tangent directions
    #   (measured: 19 inliers fitting <=1.5 px while the pose is 0.21 m off
    #   along the weak direction), and an identity-weighted edge pushes the
    #   whole trajectory into exactly that null space — the round-3 post-PGO
    #   ATE degradation. With info = H_pnp / lambda_max, the edge constrains
    #   the measured directions at odometry weight and the blind ones at ~0.


def _edge_residual(Ti, Tj, meas):
    return jacobians.relative_pose_residual(Ti, Tj, meas)


def _edge_jacobians(Ti, Tj, meas):
    """Analytic-quality Jacobians via forward-mode AD of the exact residual
    w.r.t. left-multiplicative perturbations of each endpoint."""
    def ri(xi):
        return _edge_residual(se3.se3_compose(se3.se3_exp(xi), Ti), Tj, meas)

    def rj(xj):
        return _edge_residual(Ti, se3.se3_compose(se3.se3_exp(xj), Tj), meas)

    z = jnp.zeros(6, Ti.dtype)
    return jax.jacfwd(ri)(z), jax.jacfwd(rj)(z)


def _info_sqrt(edge_info: jax.Array) -> jax.Array:
    """Per-edge whitening transform W (E, 6, 6) with W^T W = info.

    Computed via eigh, NOT Cholesky: loop edges carry exactly-rank-deficient
    information (a PnP Hessian's null space), and float32 Cholesky of a dense
    rank-deficient 6x6 + tiny jitter produces NaN pivots (rounding drives the
    blind-direction Schur pivot negative). The NaN then poisoned chi2 and the
    LM accept test silently rejected EVERY step — the optimizer returned its
    input unchanged whenever a loop edge's info was dense (the round-5 root
    cause behind tests/test_pose_graph.py frame-correctness cases). eigh of a
    symmetric PSD matrix is unconditionally stable; negative rounding noise
    in the spectrum is clamped to 0.
    """
    info = 0.5 * (edge_info + jnp.swapaxes(edge_info, -1, -2))
    S, U = jnp.linalg.eigh(info)
    # W = sqrt(S) U^T  =>  W^T W = U S U^T = info
    return jnp.sqrt(jnp.maximum(S, 0.0))[..., :, None] \
        * jnp.swapaxes(U, -1, -2)


def _linearize(g: PoseGraph, info_sqrt: jax.Array | None = None):
    Ti = g.poses[g.edge_i]
    Tj = g.poses[g.edge_j]
    r = jax.vmap(_edge_residual)(Ti, Tj, g.edge_meas)          # (E, 6)
    Ji, Jj = jax.vmap(_edge_jacobians)(Ti, Tj, g.edge_meas)    # (E, 6, 6)
    if info_sqrt is None and g.edge_info is not None:
        info_sqrt = _info_sqrt(g.edge_info)
    if info_sqrt is not None:
        # whiten per edge: r' = W r, J' = W J with W^T W = info, so the
        # unweighted normal equations below realize sum J^T info J / r^T
        # info r exactly; identity info rows pass through unchanged.
        # info must be expressed in the RESIDUAL tangent frame of
        # relative_pose_residual — pose-tangent quadratic forms (the PnP
        # Hessian) are transported there by Adj(meas) first (fused_loop.py).
        r = jnp.einsum("eab,eb->ea", info_sqrt, r, precision=_PREC)
        Ji = jnp.einsum("eab,ebc->eac", info_sqrt, Ji, precision=_PREC)
        Jj = jnp.einsum("eab,ebc->eac", info_sqrt, Jj, precision=_PREC)
    w = g.edge_valid.astype(r.dtype)
    return r * w[:, None], Ji * w[:, None, None], Jj * w[:, None, None]


def _no_reduce(x):
    """Identity cross-device reduction (single-device PGO).

    The distributed PGO (parallel/sharded_pgo.py) shards edges over the mesh
    and passes a `lax.psum` here: every edge-scatter / chi2 sum below is a
    partial sum over the local edge shard that the psum completes. Vertex
    state (poses, CG vectors) stays replicated, so nothing else changes.
    """
    return x


def _edge_onehots(g: PoseGraph, T: int, dtype):
    """(E, T) one-hot incidence matrices for the two edge endpoints, masked
    by edge validity. Built ONCE per solve: every CG iteration's
    vertex->edge gather and edge->vertex scatter-add then ride MXU matmuls
    instead of `gather`/`scatter` ops — on the TPU runtime a scatter at
    SLAM sizes costs ~1-4 ms while the equivalent (T, E) x (E, 6) matmul is
    microseconds, and CG runs iters x cg_iters of them (measured: the whole
    of a 4+ s run_pgo)."""
    ids = jnp.arange(T)
    w = g.edge_valid.astype(dtype)
    oi = (g.edge_i[:, None] == ids[None, :]).astype(dtype) * w[:, None]
    oj = (g.edge_j[:, None] == ids[None, :]).astype(dtype) * w[:, None]
    return oi, oj


def _hvp(g: PoseGraph, Ji, Jj, lam, diag_blocks, free, x, reduce_fn=_no_reduce,
         onehots=None):
    """(H + lam*diag) @ x, edge-wise and matrix-free. x: (T, 6)."""
    if onehots is not None:
        oi, oj = onehots
        xi = jnp.einsum("et,tb->eb", oi, x, precision=_PREC)
        xj = jnp.einsum("et,tb->eb", oj, x, precision=_PREC)
    else:
        xi = x[g.edge_i]
        xj = x[g.edge_j]
    # per-edge residual-space product: Ji xi + Jj xj
    y = jnp.einsum("eab,eb->ea", Ji, xi, precision=_PREC) \
        + jnp.einsum("eab,eb->ea", Jj, xj, precision=_PREC)
    # back to vertex space
    ci = jnp.einsum("eab,ea->eb", Ji, y, precision=_PREC)
    cj = jnp.einsum("eab,ea->eb", Jj, y, precision=_PREC)
    T = x.shape[0]
    if onehots is not None:
        out = reduce_fn(jnp.einsum("et,eb->tb", oi, ci, precision=_PREC)
                        + jnp.einsum("et,eb->tb", oj, cj, precision=_PREC))
    else:
        out = reduce_fn(
            jnp.zeros_like(x).at[g.edge_i].add(ci).at[g.edge_j].add(cj))
    damp = lam * jnp.einsum("tab,tb->ta",
                            diag_blocks * jnp.eye(6, dtype=x.dtype), x,
                            precision=_PREC)
    out = out + damp
    return jnp.where(free[:, None], out, x)  # fixed/invalid rows: identity


def _diag_blocks(g: PoseGraph, Ji, Jj, T, reduce_fn=_no_reduce, onehots=None):
    Hi = jnp.einsum("eab,eac->ebc", Ji, Ji, precision=_PREC)
    Hj = jnp.einsum("eab,eac->ebc", Jj, Jj, precision=_PREC)
    if onehots is not None:
        oi, oj = onehots
        D = (jnp.einsum("et,ebc->tbc", oi, Hi, precision=_PREC)
             + jnp.einsum("et,ebc->tbc", oj, Hj, precision=_PREC))
    else:
        D = jnp.zeros((T, 6, 6), Ji.dtype).at[g.edge_i].add(Hi) \
                                          .at[g.edge_j].add(Hj)
    return reduce_fn(D)


def _pcg(g, Ji, Jj, b, lam, diag_blocks, free, iters=100, tol=1e-8,
         reduce_fn=_no_reduce, onehots=None):
    """Block-Jacobi preconditioned CG for (H + lam diag) dx = b."""
    T = b.shape[0]
    eye = jnp.eye(6, dtype=b.dtype)
    Minv = jnp.linalg.inv(
        diag_blocks + (lam * jnp.diagonal(diag_blocks, axis1=-2, axis2=-1)
                       [..., None] + 1e-8) * eye)
    Minv = jnp.where(free[:, None, None], Minv, eye)

    def apply_M(v):
        return jnp.einsum("tab,tb->ta", Minv, v, precision=_PREC)

    b = jnp.where(free[:, None], b, 0.0)
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def body(_, carry):
        x, r, p, rz = carry
        Ap = _hvp(g, Ji, Jj, lam, diag_blocks, free, p, reduce_fn, onehots)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
        converged = rz < tol
        alpha = jnp.where(converged, 0.0, alpha)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_M(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = lax.fori_loop(0, iters, body, (x0, r0, p0, rz0))
    return x


def _optimize(g: PoseGraph, iters: int, cg_iters: int,
              reduce_fn=_no_reduce):
    """LM loop shared by the single-device and mesh-sharded PGO.

    With the default identity `reduce_fn` this sees the full edge set; under
    `shard_map` (parallel/sharded_pgo.py) `g` holds only the local edge shard
    and `reduce_fn` is a psum over the mesh axes.
    """
    T = g.poses.shape[0]
    # pose_valid is replicated either way, so argmax agrees across devices
    first = jnp.argmax(g.pose_valid)  # first valid slot
    free = g.pose_valid & (jnp.arange(T) != first)
    onehots = _edge_onehots(g, T, g.poses.dtype)
    oi, oj = onehots
    # whitening transform is pose-independent: factor the info matrices once
    W = _info_sqrt(g.edge_info) if g.edge_info is not None else None

    def total_chi2(poses):
        gg = g._replace(poses=poses)
        r, _, _ = _linearize(gg, W)
        return reduce_fn(jnp.sum(r * r))

    def lm_step(_, carry):
        poses, lam = carry
        gg = g._replace(poses=poses)
        r, Ji, Jj = _linearize(gg, W)
        b = -reduce_fn(
            jnp.einsum("et,eb->tb", oi,
                       jnp.einsum("eab,ea->eb", Ji, r, precision=_PREC),
                       precision=_PREC)
            + jnp.einsum("et,eb->tb", oj,
                         jnp.einsum("eab,ea->eb", Jj, r, precision=_PREC),
                         precision=_PREC))
        D = _diag_blocks(gg, Ji, Jj, T, reduce_fn, onehots)
        dx = _pcg(gg, Ji, Jj, b, lam, D, free, iters=cg_iters,
                  reduce_fn=reduce_fn, onehots=onehots)
        poses_new = se3.se3_compose(se3.se3_exp(dx), poses)
        better = total_chi2(poses_new) < total_chi2(poses)
        poses_out = jnp.where(better, poses_new, poses)
        lam_out = jnp.where(better, jnp.maximum(lam * 0.5, 1e-9),
                            jnp.minimum(lam * 4.0, 1e6))
        return poses_out, lam_out

    poses, _ = lax.fori_loop(0, iters, lm_step,
                             (g.poses, jnp.asarray(1e-6, g.poses.dtype)))
    return poses


@partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize_pose_graph(g: PoseGraph, iters: int = 22, cg_iters: int = 100):
    """LM on the pose graph; returns refined (T, 3, 4) poses.

    Keyframe slot with the smallest valid index is held fixed (the reference
    fixes keyframe id 0, loopclosure.cpp:699-703).
    """
    return _optimize(g, iters, cg_iters)


@jax.jit
def reanchor_landmarks(lm_pos: jax.Array, lm_first_kf: jax.Array,
                       old_poses: jax.Array, new_poses: jax.Array,
                       pose_valid: jax.Array):
    """Re-anchor landmarks through their first observing keyframe
    (loopclosure.cpp:762-785): p_new = T_new^-1 * (T_old * p_old).

    Jitted: unjitted this is ~20 separate dispatches, which on the tunnel
    runtime costs ~0.4 s of pure RTT inside run_pgo (round-5 trace).

    Args:
      lm_pos: (L, 3); lm_first_kf: (L,) keyframe slot index into the pose
        arrays (-1 or invalid slots leave the landmark untouched).
    """
    L = lm_pos.shape[0]
    safe = jnp.clip(lm_first_kf, 0, old_poses.shape[0] - 1)
    ok = (lm_first_kf >= 0) & pose_valid[safe]
    p_s = se3.se3_apply(old_poses[safe], lm_pos)
    p_w = se3.se3_apply(se3.se3_inverse(new_poses[safe]), p_s)
    return jnp.where(ok[:, None], p_w, lm_pos)
