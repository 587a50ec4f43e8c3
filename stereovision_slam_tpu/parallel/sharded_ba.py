"""Distributed sliding-window bundle adjustment over a device mesh.

The multi-chip BA design (BASELINE.json configs[4]; no reference analogue —
the reference's backend is a single pthread around g2o, backend.cpp:250-345):

  mesh axes (dp, mp):
    dp — observations sharded: each device linearizes its observation chunk
         and scatter-adds partial normal-equation blocks; `psum` over dp
         reduces them (this rides ICI, the SLAM analogue of gradient
         all-reduce in data-parallel training);
    mp — landmark blocks sharded: each device inverts its slice of the 3x3
         landmark Hessians and computes its partial Schur contribution
         S_partial = sum_{l in shard} G_l Hll_l^-1 G_l^T; `psum` over mp
         completes the Schur complement (the map-shard / tensor-parallel
         analogue). Landmark updates are back-substituted per shard and
         `all_gather`ed.

  The reduced camera system (<= 96x96) is solved replicated on every device —
  cheaper than communicating factor panels at this size.

Semantics match the single-chip solver in slam/backend.py (same LM damping,
Huber, accept/reject), so tests assert bit-comparable results between the two.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from stereovision_slam_tpu.geometry import se3, jacobians
from stereovision_slam_tpu.geometry.camera import Camera
from stereovision_slam_tpu.slam import map_state as mapmod
from stereovision_slam_tpu.slam.backend import (
    BAObservations, flatten_observations, _blend_cameras, _residuals,
)

_PREC = jax.lax.Precision.HIGHEST


def _local_blocks(cam_obs, kf_pose, lm_pos, obs, huber_d2, K, L):
    """Normal-equation blocks from this device's observation chunk."""
    r, J_pose, J_point, in_front = _residuals(cam_obs, kf_pose, lm_pos, obs)
    c = jnp.sum(r * r, axis=-1)
    w = jacobians.huber_weight(c, huber_d2)
    w = jnp.where(obs.valid & in_front, w, 0.0)

    wJp = J_pose * w[:, None, None]
    wJl = J_point * w[:, None, None]
    Hpp_e = jnp.einsum("nab,nac->nbc", wJp, J_pose, precision=_PREC)
    Hll_e = jnp.einsum("nab,nac->nbc", wJl, J_point, precision=_PREC)
    G_e = jnp.einsum("nab,nac->nbc", wJp, J_point, precision=_PREC)
    bp_e = jnp.einsum("nab,na->nb", wJp, r, precision=_PREC)
    bl_e = jnp.einsum("nab,na->nb", wJl, r, precision=_PREC)

    kf_i = jnp.where(obs.valid, obs.kf, K)
    lm_i = jnp.where(obs.valid, obs.lm, L)
    H_pp = jnp.zeros((K, 6, 6), r.dtype).at[kf_i].add(Hpp_e, mode="drop")
    b_p = jnp.zeros((K, 6), r.dtype).at[kf_i].add(bp_e, mode="drop")
    H_ll = jnp.zeros((L, 3, 3), r.dtype).at[lm_i].add(Hll_e, mode="drop")
    b_l = jnp.zeros((L, 3), r.dtype).at[lm_i].add(bl_e, mode="drop")
    G = jnp.zeros((L, K, 6, 3), r.dtype).at[lm_i, kf_i].add(G_e, mode="drop")
    return H_pp, b_p, H_ll, b_l, G


def _robust_chi2_local(cam_obs, kf_pose, lm_pos, obs, huber_d2):
    r, _, _, in_front = _residuals(cam_obs, kf_pose, lm_pos, obs)
    c = jnp.sum(r * r, axis=-1)
    rho = jnp.where(c <= huber_d2, c, 2.0 * jnp.sqrt(huber_d2 * c) - huber_d2)
    return jnp.sum(jnp.where(obs.valid & in_front, rho, 0.0))


def build_sharded_ba(mesh: Mesh, K: int, F: int, L: int,
                     chi2_th: float = 5.991, iters: int = 10,
                     reduce_impl: str = "xla",
                     max_active_landmarks: int | None = None):
    """Build a jitted distributed BA step for the given mesh and capacities.

    Returns a function (map_state, cam_left, cam_right) -> (kf_pose, lm_pos)
    of refined poses/landmarks. M = 2*K*F observations are padded to a
    multiple of the dp axis; the solved landmark axis must divide by mp.

    `max_active_landmarks` (La) enables the same landmark-axis compaction as
    the single-chip solver (slam/backend.py optimize_window): landmarks with
    active observations are gathered into a dense (La,) sub-table before the
    sharded solve and scattered back after — the replicated H_ll/G blocks and
    the per-device mp slices shrink L/La-fold. Results are identical while
    the active count fits within La.

    reduce_impl selects the dp-axis Schur reduction:
      'xla'  — lax.psum per block (XLA's fused ICI collective, default);
      'ring' — one fused Pallas ring all-reduce over RDMA for all five
               normal-equation blocks (parallel/ring_reduce.py); runs in the
               Pallas TPU interpreter on non-TPU backends. The small mp-axis
               Schur psum stays XLA either way (latency-bound tiny payload).
    """
    n_dp = mesh.shape["dp"]
    n_mp = mesh.shape["mp"]
    mesh_axes = tuple((name, mesh.shape[name]) for name in mesh.axis_names)
    ring_interpret = jax.default_backend() != "tpu"
    M = 2 * K * F
    compact = max_active_landmarks is not None and max_active_landmarks < L
    L_solve = max_active_landmarks if compact else L
    assert M % n_dp == 0, f"obs count {M} not divisible by dp={n_dp}"
    assert L_solve % n_mp == 0, \
        f"landmark solve axis {L_solve} not divisible by mp={n_mp}"
    Ls = L_solve // n_mp
    huber_d2 = chi2_th * chi2_th

    obs_spec = BAObservations(kf=P("dp"), lm=P("dp"), uv=P("dp"),
                              is_right=P("dp"), valid=P("dp"))
    # the blended camera is per-observation (one row per obs) -> dp-sharded
    cam_spec = Camera(fx=P("dp"), fy=P("dp"), cx=P("dp"), cy=P("dp"),
                      baseline=P("dp"), pose=P("dp"), pose_inv=P("dp"))

    @partial(shard_map, mesh=mesh,
             in_specs=(obs_spec, cam_spec, P(), P(), P()),
             out_specs=(P(), P()),
             check_vma=False)
    def ba_step(obs, cam_obs, kf_pose0, lm_pos0, kf_free):

        def lm_iter(_, carry):
            kf_pose, lm_pos, lam = carry
            H_pp, b_p, H_ll, b_l, G = _local_blocks(
                cam_obs, kf_pose, lm_pos, obs, huber_d2, K, L_solve)
            # --- Schur reduction over ICI ---
            if reduce_impl == "ring":
                from stereovision_slam_tpu.parallel.ring_reduce import ring_psum
                H_pp, b_p, H_ll, b_l, G = ring_psum(
                    (H_pp, b_p, H_ll, b_l, G), "dp", mesh_axes,
                    interpret=ring_interpret)
            else:
                H_pp = lax.psum(H_pp, "dp")
                b_p = lax.psum(b_p, "dp")
                H_ll = lax.psum(H_ll, "dp")
                b_l = lax.psum(b_l, "dp")
                G = lax.psum(G, "dp")

            # free poses: active (nonzero Hessian) minus the gauge-fixed
            # oldest keyframe (mask supplied by the caller)
            kf_active = (jnp.diagonal(H_pp, axis1=-2, axis2=-1).sum(-1) > 0) & kf_free
            lm_diag = jnp.diagonal(H_ll, axis1=-2, axis2=-1)
            lm_active = lm_diag.sum(-1) > 0

            # --- landmark marginalization, sharded over mp ---
            mi = lax.axis_index("mp")
            sl = mi * Ls
            Hll_s = lax.dynamic_slice_in_dim(H_ll, sl, Ls, 0)
            bl_s = lax.dynamic_slice_in_dim(b_l, sl, Ls, 0)
            G_s = lax.dynamic_slice_in_dim(G, sl, Ls, 0)
            act_s = lax.dynamic_slice_in_dim(lm_active, sl, Ls, 0)
            diag_s = lax.dynamic_slice_in_dim(lm_diag, sl, Ls, 0)

            eye3 = jnp.eye(3, dtype=kf_pose.dtype)
            Hll_d = Hll_s + lam * eye3 * jnp.maximum(diag_s, 1e-6)[..., None] * eye3
            Hll_d = jnp.where(act_s[:, None, None], Hll_d, eye3)
            Hll_inv_s = jnp.linalg.inv(Hll_d)
            Hll_inv_s = jnp.where(act_s[:, None, None], Hll_inv_s, 0.0)

            GH_s = jnp.einsum("lkac,lcd->lkad", G_s, Hll_inv_s, precision=_PREC)
            S_partial = -jnp.einsum("lkad,ljbd->kjab", GH_s, G_s, precision=_PREC)
            bs_partial = -jnp.einsum("lkad,ld->ka", GH_s, bl_s, precision=_PREC)
            S = lax.psum(S_partial, "mp")
            b_s = b_p + lax.psum(bs_partial, "mp")

            eye6 = jnp.eye(6, dtype=kf_pose.dtype)
            diag_damp = H_pp + lam * eye6 * jnp.maximum(
                jnp.diagonal(H_pp, axis1=-2, axis2=-1), 1e-6)[..., None] * eye6
            S = S.at[jnp.arange(K), jnp.arange(K)].add(diag_damp)
            act2 = kf_active[:, None] & kf_active[None, :]
            S = jnp.where(act2[:, :, None, None], S, 0.0)
            S = S.at[jnp.arange(K), jnp.arange(K)].add(
                jnp.where(kf_active, 0.0, 1.0)[:, None, None] * eye6)
            b_s = jnp.where(kf_active[:, None], b_s, 0.0)

            # --- replicated reduced solve ---
            S_mat = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
            dx_p = jnp.linalg.solve(S_mat, -b_s.reshape(-1)).reshape(K, 6)
            dx_p = jnp.where(kf_active[:, None], dx_p, 0.0)

            # --- back-substitution, sharded over mp, then all-gather ---
            Gt_dx_s = jnp.einsum("lkab,ka->lb", G_s, dx_p, precision=_PREC)
            dx_l_s = jnp.einsum("lab,lb->la", Hll_inv_s, -bl_s - Gt_dx_s,
                                precision=_PREC)
            dx_l_s = jnp.where(act_s[:, None], dx_l_s, 0.0)
            dx_l = lax.all_gather(dx_l_s, "mp", axis=0, tiled=True)

            kf_new = se3.se3_compose(se3.se3_exp(dx_p), kf_pose)
            lm_new = lm_pos + dx_l

            chi_new = lax.psum(_robust_chi2_local(
                cam_obs, kf_new, lm_new, obs, huber_d2), "dp")
            chi_old = lax.psum(_robust_chi2_local(
                cam_obs, kf_pose, lm_pos, obs, huber_d2), "dp")
            better = chi_new < chi_old
            kf_out = jnp.where(better, kf_new, kf_pose)
            lm_out = jnp.where(better, lm_new, lm_pos)
            lam_out = jnp.where(better, jnp.maximum(lam * 0.5, 1e-9),
                                jnp.minimum(lam * 4.0, 1e4))
            return kf_out, lm_out, lam_out

        kf_pose, lm_pos, _ = lax.fori_loop(
            0, iters, lm_iter,
            (kf_pose0, lm_pos0, jnp.asarray(1e-4, kf_pose0.dtype)))
        return kf_pose, lm_pos

    @jax.jit
    def _run(m: mapmod.MapState, cam_left: Camera, cam_right: Camera,
             is_right: jax.Array):
        obs = flatten_observations(m)._replace(is_right=is_right)
        cam_obs = _blend_cameras(cam_left, cam_right, is_right)
        oldest = jnp.min(jnp.where(m.kf_valid, m.kf_id,
                                   jnp.iinfo(jnp.int32).max))
        kf_free = m.kf_valid & (m.kf_id != oldest)
        if not compact:
            return ba_step(obs, cam_obs, m.kf_pose, m.lm_pos, kf_free)
        # gather observed landmarks into the compact (La,) solve table
        La = L_solve
        lm_active = m.lm_valid & (m.lm_obs_count > 0)
        sel = jnp.nonzero(lm_active, size=La, fill_value=L)[0]
        sel_on = sel < L
        inv = jnp.full((L + 1,), -1, jnp.int32).at[
            jnp.where(sel_on, sel, L + 1)].set(
            jnp.arange(La, dtype=jnp.int32), mode="drop")
        lm_pos0 = jnp.where(sel_on[:, None],
                            m.lm_pos[jnp.clip(sel, 0, L - 1)], 0.0)
        lm_c = inv[jnp.where(obs.lm >= 0, obs.lm, L)]
        obs_c = obs._replace(lm=lm_c, valid=obs.valid & (lm_c >= 0))
        kf_pose, lm_pos_c = ba_step(obs_c, cam_obs, m.kf_pose, lm_pos0,
                                    kf_free)
        lm_pos = m.lm_pos.at[jnp.where(sel_on, sel, L)].set(
            lm_pos_c, mode="drop")
        return kf_pose, lm_pos

    # is_right is passed as a RUNTIME argument (not closed over): a
    # trace-time-constant selector would constant-fold the blended camera
    # into dense array constants in the executable, which the axon runtime
    # executes ~100x slower (docs/PERFORMANCE.md "array-constant cliff").
    import numpy as _np
    _is_right = jax.device_put(_np.arange(M) >= K * F)

    def run(m: mapmod.MapState, cam_left: Camera, cam_right: Camera):
        return _run(m, cam_left, cam_right, _is_right)

    return run
