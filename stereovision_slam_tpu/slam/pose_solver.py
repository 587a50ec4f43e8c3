"""Pose-only Levenberg-Marquardt solver (frame tracking).

TPU-native equivalent of the reference's `Frontend::EstimateCurrentPose`
(/root/reference/src/frontend.cpp:394-558) which builds a single-vertex g2o
graph and runs 4 rounds of (LM x10 + chi-square outlier re-leveling), with the
Huber kernel dropped after round 3.

Redesign: the whole schedule is one jitted program over fixed-size masked
observation arrays — residual+Jacobian for all N observations batched
(analytic 2x6), normal equations by one einsum (6x6), LM damping with
accept/reject inside `lax.fori_loop`, outlier re-classification as a mask
update between rounds. Matches the reference's semantics:

  * each round restarts from the same initial pose (frontend.cpp:487) with
    the refined inlier set;
  * classification uses the *raw* chi2 (g2o edge->chi2()) vs chi2_th = 5.991;
  * Huber weighting active for rounds 0-2 only (frontend.cpp:515-521);
  * outlier features are unlinked by the caller (frontend.cpp:544-553).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from stereovision_slam_tpu.geometry import se3, jacobians
from stereovision_slam_tpu.geometry.camera import Camera

_PREC = jax.lax.Precision.HIGHEST


def _solve_damped(H: jax.Array, b: jax.Array, lam: jax.Array) -> jax.Array:
    """Solve (H + lam * diag(H)) dx = -b (LM with multiplicative damping)."""
    damped = H + lam * jnp.diag(jnp.diag(H)) + 1e-10 * jnp.eye(6, dtype=H.dtype)
    return jnp.linalg.solve(damped, -b)


def _chi2(cam: Camera, T: jax.Array, points: jax.Array, obs: jax.Array) -> jax.Array:
    r, _, _, p_cam = jacobians.reprojection_residual_jac(cam, T, points, obs)
    c = jnp.sum(r * r, axis=-1)
    # points behind the camera are infinitely wrong, never inliers
    return jnp.where(p_cam[..., 2] > 1e-6, c, 1e12)


def _lm_rounds(cam: Camera, T_init: jax.Array, points: jax.Array, obs: jax.Array,
               valid: jax.Array, chi2_th: float, rounds: int, iters: int):
    dtype = T_init.dtype
    inlier = valid

    for rnd in range(rounds):
        use_huber = rnd < rounds - 1

        def lm_iter(_, carry):
            T, lam = carry
            r, J, _, p_cam = jacobians.reprojection_residual_jac(cam, T, points, obs)
            w = jnp.where(inlier & (p_cam[..., 2] > 1e-6), 1.0, 0.0)
            if use_huber:
                w = w * jacobians.huber_weight(jnp.sum(r * r, axis=-1),
                                               jnp.asarray(chi2_th, dtype))
            # normal equations: H = sum w J^T J, b = sum w J^T r
            H = jnp.einsum("nab,nac,n->bc", J, J, w, precision=_PREC)
            b = jnp.einsum("nab,na,n->b", J, r, w, precision=_PREC)
            dx = _solve_damped(H, b, lam)
            T_new = se3.se3_compose(se3.se3_exp(dx), T)

            # accept iff weighted chi2 decreased; adapt damping
            def wchi2(Tx):
                rr, _, _, pc = jacobians.reprojection_residual_jac(cam, Tx, points, obs)
                c = jnp.sum(rr * rr, axis=-1)
                if use_huber:
                    d2 = jnp.asarray(chi2_th, dtype)
                    c = jnp.where(c <= d2, c, 2.0 * jnp.sqrt(d2 * c) - d2)
                m = inlier & (pc[..., 2] > 1e-6)
                return jnp.sum(jnp.where(m, c, 0.0))

            better = wchi2(T_new) < wchi2(T)
            T_out = jnp.where(better, T_new, T)
            lam_out = jnp.where(better, jnp.maximum(lam * 0.5, 1e-9),
                                jnp.minimum(lam * 4.0, 1e6))
            return T_out, lam_out

        T, _ = lax.fori_loop(0, iters, lm_iter,
                             (T_init, jnp.asarray(1e-4, dtype)))
        # re-classify on raw chi2 at the refined pose
        inlier = valid & (_chi2(cam, T, points, obs) <= chi2_th)

    return T, inlier


@partial(jax.jit, static_argnames=("rounds", "iters"))
def solve_pose(cam: Camera, T_init: jax.Array, points: jax.Array,
               obs_uv: jax.Array, valid: jax.Array, chi2_th: float = 5.991,
               rounds: int = 4, iters: int = 10):
    """Estimate the rig pose from 2-D/3-D correspondences in the left camera.

    Args:
      cam: left camera (its extrinsic participates in the projection chain).
      T_init: (3, 4) initial pose (constant-velocity model, frontend.cpp:650).
      points: (N, 3) landmark positions (fixed).
      obs_uv: (N, 2) observed pixels in the left image.
      valid: (N,) mask of usable correspondences.
      chi2_th: outlier threshold on squared pixel error (5.991 = chi2(2, 95%)).

    Returns:
      T_opt: (3, 4) refined pose.
      inlier: (N,) final inlier mask (subset of `valid`).
      num_inliers: () int32.
    """
    T, inlier = _lm_rounds(cam, T_init, points, obs_uv, valid,
                           chi2_th, rounds, iters)
    return T, inlier, jnp.sum(inlier).astype(jnp.int32)
