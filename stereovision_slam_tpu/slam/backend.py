"""Sliding-window bundle adjustment with a Schur-complement solver.

TPU-native replacement for the reference's g2o backend
(/root/reference/src/backend.cpp:9-248): VertexPose per active keyframe,
marginalized VertexXYZ per landmark (backend.cpp:125 — the Schur trick),
EdgeProjection per observation with per-camera intrinsics+extrinsics
(left and right both contribute, backend.cpp:132-158), Huber delta = chi2_th
(backend.cpp:150-152), LM x ba_lm_iters (backend.cpp:162-164), then the
adaptive outlier loop doubling chi2_th until inlier ratio > 0.5
(backend.cpp:166-193) and unlinking of outlier observations
(backend.cpp:195-213).

Redesign, not a port — there is no sparse graph: observations are already
dense masked arrays in MapState, so the whole normal-equation assembly is a
handful of scatter-adds and einsums that map directly onto the MXU:

  H_pp (K,6,6)   per-keyframe pose blocks         scatter-add of J_p^T W J_p
  H_ll (L,3,3)   per-landmark blocks              scatter-add of J_l^T W J_l
  G    (L,K,6,3) cross blocks                     scatter-add of J_p^T W J_l
  S    (6K,6K)   reduced camera system            S = H_pp - G H_ll^-1 G^T
                                                  (one einsum), Cholesky-solved
  dx_l           back-substitution                H_ll^-1 (-b_l - G^T dx_p)

K is the padded window (16): the reduced system is at most 96x96 — the Schur
complement turns the reference's sparse solve into a tiny dense one, which is
exactly what TPUs want. The distributed variant (parallel/sharded_ba.py)
shards the observation scatter phase over a mesh and psums the blocks.

Gauge: the oldest active keyframe is held fixed. (The reference fixes no
vertex and relies on LM damping; at this window size that lets the whole
window drift rigidly ~1 m per BA pass — measured during verification — so the
window is anchored here. Its observations still constrain landmarks.)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from stereovision_slam_tpu.geometry import se3, jacobians
from stereovision_slam_tpu.geometry.camera import Camera
from stereovision_slam_tpu.slam import map_state as mapmod

_PREC = jax.lax.Precision.HIGHEST


class BAObservations(NamedTuple):
    """Flattened observation arrays (static size M = K*F*2)."""
    kf: jax.Array      # (M,) keyframe slot
    lm: jax.Array      # (M,) landmark slot
    uv: jax.Array      # (M, 2) measured pixels
    is_right: jax.Array  # (M,) bool camera selector
    valid: jax.Array   # (M,) bool


def flatten_observations(m: mapmod.MapState) -> BAObservations:
    """MapState's (K, F) observation block -> flat (M,) arrays, left camera
    first then right (mirrors the reference adding one edge per camera per
    feature, backend.cpp:132-158)."""
    K, F = m.obs_lm.shape
    kf_idx = jnp.broadcast_to(jnp.arange(K)[:, None], (K, F)).reshape(-1)
    lm_idx = m.obs_lm.reshape(-1)
    base_valid = (m.obs_valid & (m.obs_lm >= 0)
                  & m.kf_valid[:, None]).reshape(-1)
    uv_l = m.obs_uv_l.reshape(-1, 2)
    uv_r = m.obs_uv_r.reshape(-1, 2)
    has_r = (m.obs_has_r & m.obs_valid & (m.obs_lm >= 0)
             & m.kf_valid[:, None]).reshape(-1)
    return BAObservations(
        kf=jnp.concatenate([kf_idx, kf_idx]),
        lm=jnp.concatenate([lm_idx, lm_idx]),
        uv=jnp.concatenate([uv_l, uv_r]),
        is_right=jnp.concatenate([jnp.zeros_like(base_valid),
                                  jnp.ones_like(has_r)]),
        valid=jnp.concatenate([base_valid, has_r]),
    )


def _blend_cameras(cam_left: Camera, cam_right: Camera, is_right: jax.Array) -> Camera:
    """Per-observation camera parameters selected by the left/right flag.

    `is_right` MUST be a traced argument, never a trace-time-known value: a
    compile-time-constant selector constant-folds the blended fields into
    dense array constants in the executable, which the axon runtime executes
    ~100x slower (docs/PERFORMANCE.md "array-constant cliff"). The single-chip
    solver therefore avoids this entirely (`_residuals_lr` processes the two
    static halves with scalar cameras); only the dp-sharded distributed BA
    uses it, with is_right passed in as a runtime argument.
    """
    s = is_right
    sf = s.astype(cam_left.pose.dtype)
    return Camera(
        fx=jnp.where(s, cam_right.fx, cam_left.fx),
        fy=jnp.where(s, cam_right.fy, cam_left.fy),
        cx=jnp.where(s, cam_right.cx, cam_left.cx),
        cy=jnp.where(s, cam_right.cy, cam_left.cy),
        baseline=jnp.where(s, cam_right.baseline, cam_left.baseline),
        pose=(1.0 - sf)[:, None, None] * cam_left.pose
             + sf[:, None, None] * cam_right.pose,
        pose_inv=(1.0 - sf)[:, None, None] * cam_left.pose_inv
                 + sf[:, None, None] * cam_right.pose_inv,
    )


def _residuals(cam_obs: Camera, kf_pose: jax.Array, lm_pos: jax.Array,
               obs: BAObservations):
    """Residual + Jacobians for all observations at the current state."""
    T = kf_pose[obs.kf]                       # (M, 3, 4)
    P = lm_pos[jnp.clip(obs.lm, 0)]           # (M, 3)
    r, J_pose, J_point, p_cam = jacobians.reprojection_residual_jac(
        cam_obs, T, P, obs.uv)
    in_front = p_cam[..., 2] > 1e-6
    return r, J_pose, J_point, in_front


def _residuals_lr(cam_left: Camera, cam_right: Camera, kf_pose: jax.Array,
                  lm_pos: jax.Array, obs: BAObservations,
                  lm_onehot: jax.Array | None = None):
    """Residual + Jacobians, processing the static left/right halves with the
    two scalar cameras directly (flatten_observations lays out left-camera
    rows first, then right). Equivalent to `_residuals` with a blended
    per-observation camera, but emits no per-observation camera arrays — and
    therefore no constant-folded selector buffers (see `_blend_cameras`).

    `lm_onehot` (M, L): when supplied, the per-observation poses/points come
    from a structural broadcast (the kf layout is [left(K,F); right(K,F)])
    and a one-hot MXU matmul instead of row gathers — the in-loop fast path
    (see `_assemble_onehot`). Invalid observations get P=0 (the world
    origin); such rows are masked by `obs.valid` (weight 0) in every
    consumer — NOT by cheirality, since the origin can legitimately sit in
    front of a moved camera."""
    M = obs.kf.shape[0]
    h = M // 2

    if lm_onehot is not None:
        K = kf_pose.shape[0]
        F = h // K
        T_all = jnp.broadcast_to(kf_pose[None, :, None], (2, K, F, 3, 4)
                                 ).reshape(M, 3, 4)
        P_all = jnp.einsum("ml,lc->mc", lm_onehot, lm_pos, precision=_PREC)
    else:
        T_all = kf_pose[obs.kf]
        P_all = lm_pos[jnp.clip(obs.lm, 0)]

    def half(cam, sl):
        r, J_pose, J_point, p_cam = jacobians.reprojection_residual_jac(
            cam, T_all[sl], P_all[sl], obs.uv[sl])
        return r, J_pose, J_point, p_cam[..., 2] > 1e-6

    left = half(cam_left, slice(0, h))
    right = half(cam_right, slice(h, M))
    return tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(left, right))


def _assemble(r, J_pose, J_point, w, obs: BAObservations, K: int, L: int):
    """Scatter-add the weighted normal-equation blocks."""
    wJp = J_pose * w[:, None, None]
    wJl = J_point * w[:, None, None]
    Hpp_e = jnp.einsum("nab,nac->nbc", wJp, J_pose, precision=_PREC)
    Hll_e = jnp.einsum("nab,nac->nbc", wJl, J_point, precision=_PREC)
    G_e = jnp.einsum("nab,nac->nbc", wJp, J_point, precision=_PREC)  # (M,6,3)
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


def _assemble_onehot(r, J_pose, J_point, w, O: jax.Array, K: int):
    """`_assemble` without scatters, for the single-chip LM loop.

    Device traces of the LM while-loop (benchmarks/profile_step.py) showed
    the three `.at[].add` scatters costing ~1.5 ms per iteration on the
    real chip. The kf axis of the flattened observations is STRUCTURAL
    (flatten_observations lays rows out as [left(K,F); right(K,F)]), so the
    pose blocks reduce by reshape+sum; the landmark axis reduces through
    the observation->landmark one-hot `O` (M, L) as MXU matmuls — exact
    (each row selects one landmark with weight 1.0; only the f32 summation
    ORDER differs from the scatter, a sub-ulp-per-term reassociation).
    Weights `w` are zero for invalid observations, so no drop-index
    handling is needed.
    """
    M = r.shape[0]
    F = M // (2 * K)
    L = O.shape[1]
    wJp = J_pose * w[:, None, None]
    wJl = J_point * w[:, None, None]
    Hpp_e = jnp.einsum("nab,nac->nbc", wJp, J_pose, precision=_PREC)
    Hll_e = jnp.einsum("nab,nac->nbc", wJl, J_point, precision=_PREC)
    G_e = jnp.einsum("nab,nac->nbc", wJp, J_point, precision=_PREC)
    bp_e = jnp.einsum("nab,na->nb", wJp, r, precision=_PREC)
    bl_e = jnp.einsum("nab,na->nb", wJl, r, precision=_PREC)

    H_pp = Hpp_e.reshape(2, K, F, 6, 6).sum(axis=(0, 2))
    b_p = bp_e.reshape(2, K, F, 6).sum(axis=(0, 2))
    H_ll = jnp.einsum("ml,mbc->lbc", O, Hll_e, precision=_PREC)
    b_l = jnp.einsum("ml,mb->lb", O, bl_e, precision=_PREC)
    G = jnp.einsum("ckfl,ckfab->lkab", O.reshape(2, K, F, L),
                   G_e.reshape(2, K, F, 6, 3), precision=_PREC)
    return H_pp, b_p, H_ll, b_l, G


def _dot3(coeffs, cols):
    """Sum of coeff*col over 3 terms, skipping structural zeros (None)."""
    out = None
    for c, v in zip(coeffs, cols):
        if c is None or v is None:
            continue
        term = c * v
        out = term if out is None else out + term
    return out


def _residual_jac_cols(cam: Camera, T_all: jax.Array, P_all: jax.Array,
                       uv_obs: jax.Array):
    """Column-major reprojection residual + Jacobians for the BA fast path.

    Identical math to `jacobians.reprojection_residual_jac` (same contraction
    order, validated bit-close in tests/test_backend_ba.py), but every
    Jacobian entry is produced as a separate (M,) column instead of stacked
    (M, 2, 6)/(M, 2, 3) blocks: the stacked blocks tile as T(2, 128) — the
    trailing 6/3 lane-pads to 128 — so the per-observation Jacobians and the
    outer-product blocks built from them cost ~0.8 ms/LM-iteration of pure
    HBM traffic + layout copies at M=8192 (benchmarks/probe_ba_trace.py,
    fusion.398/387/389 + copy.563-570). Columns keep the entire
    residual->Jacobian->outer-product chain in fused (M,)-elementwise
    kernels whose only materialized outputs are the flat block arrays.

    Returns (r (M, 2), Jp_cols [12 x (M,)] row-major (a, i) -> a*6+i,
    Jl_cols [6 x (M,)] (a, j) -> a*3+j, p_cam (M, 3)).
    """
    q = se3.se3_apply(T_all, P_all)
    p_cam = se3.se3_apply(cam.pose, q)
    X, Y, Z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    Zsafe = jnp.where(jnp.abs(Z) < 1e-8, 1e-8, Z)
    inv_z = 1.0 / Zsafe
    inv_z2 = inv_z * inv_z
    u = cam.fx * X * inv_z + cam.cx
    v = cam.fy * Y * inv_z + cam.cy
    r = jnp.stack([u, v], axis=-1) - uv_obs

    R_ext = se3.se3_R(cam.pose)            # (3, 3) scalar entries
    qx, qy, qz = q[..., 0], q[..., 1], q[..., 2]
    # Rdq columns: [R_ext | R_ext @ -hat(q)]  (d p_cam / d xi, 3 x 6)
    rdq = [[R_ext[r_, i] for r_ in range(3)] for i in range(3)]
    for col in ((None, -qz, qy), (qz, None, -qx), (-qy, qx, None)):
        rdq.append([_dot3([R_ext[r_, 0], R_ext[r_, 1], R_ext[r_, 2]], col)
                    for r_ in range(3)])
    # J_proj rows (2 x 3); None marks structural zeros
    jrow = [(cam.fx * inv_z, None, -cam.fx * X * inv_z2),
            (None, cam.fy * inv_z, -cam.fy * Y * inv_z2)]
    ones = jnp.ones_like(X)
    Jp_cols = []
    for a in range(2):
        for i in range(6):
            col = _dot3(jrow[a], rdq[i])
            Jp_cols.append(col * ones if col.ndim < X.ndim else col)
    # RT = R_ext @ R(T)  (d p_cam / d p_w), per-observation 3x3
    R_T = T_all[..., :3, :3]
    Jl_cols = []
    rt = [[_dot3([R_ext[r_, 0], R_ext[r_, 1], R_ext[r_, 2]],
                 [R_T[..., 0, c], R_T[..., 1, c], R_T[..., 2, c]])
           for r_ in range(3)] for c in range(3)]
    for a in range(2):
        for c in range(3):
            Jl_cols.append(_dot3(jrow[a], rt[c]))
    return r, Jp_cols, Jl_cols, p_cam


def _residuals_lr_cols(cam_left: Camera, cam_right: Camera,
                       kf_pose: jax.Array, lm_pos: jax.Array,
                       obs: BAObservations, lm_onehot: jax.Array,
                       P_all: jax.Array | None = None):
    """`_residuals_lr` in column form (flat Jacobians). Same [left; right]
    static-half layout and one-hot landmark gather. `P_all` short-circuits
    the per-observation position gather when the caller already carries it
    (the LM loop below: each O-sized einsum streams the full ~L*M one-hot
    from HBM, and those streams dominate the flat-assembly iteration)."""
    M = obs.kf.shape[0]
    h = M // 2
    K = kf_pose.shape[0]
    F = h // K
    T_all = jnp.broadcast_to(kf_pose[None, :, None], (2, K, F, 3, 4)
                             ).reshape(M, 3, 4)
    if P_all is None:
        P_all = jnp.einsum("ml,lc->mc", lm_onehot, lm_pos, precision=_PREC)

    halves = []
    for cam, sl in ((cam_left, slice(0, h)), (cam_right, slice(h, M))):
        r, Jp, Jl, p_cam = _residual_jac_cols(cam, T_all[sl], P_all[sl],
                                              obs.uv[sl])
        halves.append((r, Jp, Jl, p_cam[..., 2] > 1e-6))
    (rl, Jpl, Jll, fl), (rr, Jpr, Jlr, fr) = halves
    r = jnp.concatenate([rl, rr], axis=0)
    Jp_cols = [jnp.concatenate([a, b], axis=0) for a, b in zip(Jpl, Jpr)]
    Jl_cols = [jnp.concatenate([a, b], axis=0) for a, b in zip(Jll, Jlr)]
    return r, Jp_cols, Jl_cols, jnp.concatenate([fl, fr], axis=0)


def _assemble_flat(r, Jp_cols, Jl_cols, w, O: jax.Array, K: int):
    """`_assemble_onehot` on flat column Jacobians: the per-observation
    outer-product blocks are built as column stacks — (M, 36)/(M, 18)/(M, 9)
    in native (8, 128) tiling — instead of (M, 6, 6)-style tensors whose
    trailing dims lane-pad ~6x (the three dominant fusions of the round-3 LM
    iteration, ~0.5 ms/iteration; benchmarks/probe_ba_trace.py). Outputs are
    identical shapes/values to `_assemble_onehot` (same contraction order
    per element; only the layout of the intermediate differs)."""
    M = r.shape[0]
    F = M // (2 * K)
    L = O.shape[1]
    wJp = [w * c for c in Jp_cols]
    wJl = [w * c for c in Jl_cols]
    r0, r1 = r[:, 0], r[:, 1]

    hpp = jnp.stack([wJp[b] * Jp_cols[c] + wJp[6 + b] * Jp_cols[6 + c]
                     for b in range(6) for c in range(6)], axis=-1)
    hll = jnp.stack([wJl[b] * Jl_cols[c] + wJl[3 + b] * Jl_cols[3 + c]
                     for b in range(3) for c in range(3)], axis=-1)
    g = jnp.stack([wJp[b] * Jl_cols[c] + wJp[6 + b] * Jl_cols[3 + c]
                   for b in range(6) for c in range(3)], axis=-1)
    bp = jnp.stack([wJp[b] * r0 + wJp[6 + b] * r1 for b in range(6)], axis=-1)
    bl = jnp.stack([wJl[b] * r0 + wJl[3 + b] * r1 for b in range(3)], axis=-1)

    H_pp = hpp.reshape(2, K, F, 36).sum(axis=(0, 2)).reshape(K, 6, 6)
    b_p = bp.reshape(2, K, F, 6).sum(axis=(0, 2))
    # ONE one-hot contraction for G, H_ll and b_l: the (M, L) one-hot is
    # ~32 MB at bench scale and each einsum that touches it pays a full
    # HBM stream — packing the 18+9+3 per-observation columns into one
    # (2, K, F, 30) operand reads it once. H_ll/b_l then reduce the k axis
    # of the (L, K, 30) product (same per-element sums, k-major order).
    packed = jnp.concatenate([g, hll, bl], axis=-1)       # (M, 30)
    out = jnp.einsum("ckfl,ckfq->lkq", O.reshape(2, K, F, L),
                     packed.reshape(2, K, F, 30), precision=_PREC)
    G = out[:, :, :18].reshape(L, K, 6, 3)
    H_ll = out[:, :, 18:27].sum(axis=1).reshape(L, 3, 3)
    b_l = out[:, :, 27:30].sum(axis=1)
    return H_pp, b_p, H_ll, b_l, G


def _inv3x3(A: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse (adjugate / det).

    `jnp.linalg.inv` on (L, 3, 3) lowers to a batched LuDecompositionBlock
    custom call costing ~0.8 ms per LM iteration on the chip
    (benchmarks/profile_step.py); the adjugate form is a handful of fused
    elementwise ops. Singular blocks return 0 (callers mask inactive
    landmarks anyway; damped active blocks are PD by construction).
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A21 = f * g - d * i
    A31 = d * h - e * g
    det = a * A11 + b * A21 + c * A31
    inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
    adj = jnp.stack([
        jnp.stack([A11, c * h - b * i, b * f - c * e], axis=-1),
        jnp.stack([A21, a * i - c * g, c * d - a * f], axis=-1),
        jnp.stack([A31, b * g - a * h, a * e - b * d], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def schur_solve(H_pp, b_p, H_ll, b_l, G, lam, kf_active, lm_active):
    """Marginalize landmarks, solve the reduced camera system, back-substitute.

    `kf_active` marks the poses that receive updates — pass the free (active
    minus gauge-fixed) mask; fixed keyframes' observations still contribute
    to the assembled blocks and therefore to landmark updates.

    Returns (dx_pose (K, 6), dx_point (L, 3)).
    """
    K = H_pp.shape[0]
    L = H_ll.shape[0]
    dtype = H_pp.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)

    # damped landmark blocks; inactive landmarks get identity (dx = 0)
    Hll_d = H_ll + lam * eye3 * jnp.maximum(
        jnp.diagonal(H_ll, axis1=-2, axis2=-1), 1e-6)[..., None] * eye3
    Hll_d = jnp.where(lm_active[:, None, None], Hll_d, eye3)
    Hll_inv = _inv3x3(Hll_d)
    Hll_inv = jnp.where(lm_active[:, None, None], Hll_inv, 0.0)

    # reduced camera system S = H_pp - G Hll^-1 G^T  (K,K,6,6)
    GH = jnp.einsum("lkac,lcd->lkad", G, Hll_inv, precision=_PREC)
    S_off = jnp.einsum("lkad,ljbd->kjab", GH, G, precision=_PREC)
    S = -S_off
    diag_damp = H_pp + lam * eye6 * jnp.maximum(
        jnp.diagonal(H_pp, axis1=-2, axis2=-1), 1e-6)[..., None] * eye6
    S = S.at[jnp.arange(K), jnp.arange(K)].add(diag_damp)
    # inactive keyframes: identity row/col -> dx = 0
    act2 = kf_active[:, None] & kf_active[None, :]
    S = jnp.where(act2[:, :, None, None], S, 0.0)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        jnp.where(kf_active, 0.0, 1.0)[:, None, None] * eye6)

    b_s = b_p - jnp.einsum("lkad,ld->ka", GH, b_l, precision=_PREC)
    b_s = jnp.where(kf_active[:, None], b_s, 0.0)

    S_mat = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    dx_p = jnp.linalg.solve(S_mat, -b_s.reshape(-1)).reshape(K, 6)

    # back-substitute landmarks: dx_l = Hll^-1 (-b_l - G^T dx_p)
    Gt_dx = jnp.einsum("lkab,ka->lb", G, dx_p, precision=_PREC)
    dx_l = jnp.einsum("lab,lb->la", Hll_inv, -b_l - Gt_dx, precision=_PREC)
    dx_p = jnp.where(kf_active[:, None], dx_p, 0.0)
    dx_l = jnp.where(lm_active[:, None], dx_l, 0.0)
    return dx_p, dx_l


@partial(jax.jit, static_argnames=("iters", "outlier_rounds",
                                   "max_active_landmarks"),
         donate_argnums=(0,))
def optimize_window(m: mapmod.MapState, cam_left: Camera, cam_right: Camera,
                    chi2_th: float = 5.991, iters: int = 10,
                    outlier_rounds: int = 5,
                    max_active_landmarks: int | None = None):
    """One BA pass over the active window; writes refined poses/landmarks back
    into the map and unlinks outlier observations.

    `max_active_landmarks` (La) compacts the landmark axis before assembly:
    only landmarks with active observations can receive BA updates, and at
    most min(K*F, L) such landmarks exist (each must occupy an observation
    slot), typically far fewer — so the solver gathers them into a dense
    (La,) sub-table, runs the normal-equation assembly / Schur complement /
    back-substitution at La instead of L, and scatters the refined positions
    back. The dominant cross-block G drops from (L, K, 6, 3) to
    (La, K, 6, 3) — 4x memory/time at the defaults (L=4096, La=1024) — with
    bit-identical results while the active count fits (overflowing landmarks
    keep their positions for this pass and are NOT unlinked; the overflow
    count is returned in stats). None disables compaction.

    Returns (new_map, stats) with
    stats = (num_obs, num_outliers, final_chi2_th, lm_overflow).
    """
    K, F = m.obs_lm.shape
    L = m.lm_valid.shape[0]
    dtype = m.kf_pose.dtype
    obs = flatten_observations(m)
    # g2o Huber delta = chi2_th (backend.cpp:150-152) acts on the error norm,
    # i.e. robustification starts at squared error chi2_th^2
    huber_d2 = jnp.asarray(chi2_th * chi2_th, dtype)

    kf_active = m.kf_valid
    # gauge anchor: hold the oldest active keyframe fixed
    oldest_id = jnp.min(jnp.where(m.kf_valid, m.kf_id, jnp.iinfo(jnp.int32).max))
    kf_free = kf_active & (m.kf_id != oldest_id)
    lm_active = m.lm_valid & (m.lm_obs_count > 0)

    # ---- landmark-axis compaction (gather -> solve at La -> scatter) ----
    compact = max_active_landmarks is not None and max_active_landmarks < L
    if compact:
        La = max_active_landmarks
        sel = jnp.nonzero(lm_active, size=La, fill_value=L)[0]     # (La,)
        sel_on = sel < L
        # inverse permutation: full slot -> compact slot (-1 not selected);
        # unused fill entries scatter to the OOB index L+1 and are dropped
        inv = jnp.full((L + 1,), -1, jnp.int32).at[
            jnp.where(sel_on, sel, L + 1)].set(
            jnp.arange(La, dtype=jnp.int32), mode="drop")
        lm_overflow = jnp.sum(lm_active) - jnp.sum(sel_on)
        lm_pos0 = m.lm_pos[jnp.clip(sel, 0, L - 1)]
        lm_pos0 = jnp.where(sel_on[:, None], lm_pos0, 0.0)
        lm_active_c = sel_on
        obs_lm_c = inv[jnp.where(obs.lm >= 0, obs.lm, L)]
        obs_c = obs._replace(lm=obs_lm_c, valid=obs.valid & (obs_lm_c >= 0))
        L_solve = La
    else:
        lm_overflow = jnp.asarray(0, jnp.int32)
        lm_pos0 = m.lm_pos
        lm_active_c = lm_active
        obs_c = obs
        L_solve = L

    # observation->landmark one-hot, shared by every gather/assembly in the
    # LM loop below (obs_c.lm is loop-invariant; see _assemble_onehot)
    O = ((obs_c.lm[:, None] == jnp.arange(L_solve, dtype=jnp.int32)[None, :])
         & obs_c.valid[:, None]).astype(dtype)

    def chi2_fn(kf_pose, lm_pos, o, lm_onehot=None):
        if lm_onehot is not None:
            r, _, _, in_front = _residuals_lr_cols(
                cam_left, cam_right, kf_pose, lm_pos, o, lm_onehot)
        else:
            r, _, _, in_front = _residuals_lr(cam_left, cam_right, kf_pose,
                                              lm_pos, o, lm_onehot=lm_onehot)
        c = jnp.sum(r * r, axis=-1)
        return jnp.where(o.valid & in_front, c, 0.0), in_front

    def robust_at(kf_pose, P_all):
        """Robust cost from a carried per-observation position table."""
        rr, _, _, inf2 = _residuals_lr_cols(cam_left, cam_right, kf_pose,
                                            lm_pos0, obs_c, O, P_all=P_all)
        cc = jnp.sum(rr * rr, axis=-1)
        rho = jnp.where(cc <= huber_d2, cc,
                        2.0 * jnp.sqrt(huber_d2 * cc) - huber_d2)
        return jnp.sum(jnp.where(obs_c.valid & inf2, rho, 0.0))

    def lm_step(_, carry):
        # P_all (the per-observation landmark positions) is CARRIED and
        # updated incrementally (P + O @ dx_l): together with the packed
        # assembly contraction this holds the O streams at two per
        # iteration (position delta + assembly) instead of five
        kf_pose, lm_pos, P_all, lam = carry
        r, Jp_cols, Jl_cols, in_front = _residuals_lr_cols(
            cam_left, cam_right, kf_pose, lm_pos, obs_c, O, P_all=P_all)
        c = jnp.sum(r * r, axis=-1)
        w = jacobians.huber_weight(c, huber_d2)
        w = jnp.where(obs_c.valid & in_front, w, 0.0)
        H_pp, b_p, H_ll, b_l, G = _assemble_flat(r, Jp_cols, Jl_cols, w,
                                                 O, K)
        dx_p, dx_l = schur_solve(H_pp, b_p, H_ll, b_l, G, lam,
                                 kf_free, lm_active_c)
        kf_new = se3.se3_compose(se3.se3_exp(dx_p), kf_pose)
        lm_new = lm_pos + dx_l
        P_new = P_all + jnp.einsum("ml,lc->mc", O, dx_l, precision=_PREC)
        # incumbent cost from the residuals already evaluated above (equals
        # robust_total(kf_pose, lm_pos)) — saves a full residual pass/iter
        rho_inc = jnp.where(c <= huber_d2, c,
                            2.0 * jnp.sqrt(huber_d2 * c) - huber_d2)
        cost_inc = jnp.sum(jnp.where(obs_c.valid & in_front, rho_inc, 0.0))
        better = robust_at(kf_new, P_new) < cost_inc
        kf_out = jnp.where(better, kf_new, kf_pose)
        lm_out = jnp.where(better, lm_new, lm_pos)
        P_out = jnp.where(better, P_new, P_all)
        lam_out = jnp.where(better, jnp.maximum(lam * 0.5, 1e-9),
                            jnp.minimum(lam * 4.0, 1e4))
        return kf_out, lm_out, P_out, lam_out

    P0 = jnp.einsum("ml,lc->mc", O, lm_pos0, precision=_PREC)
    kf_pose, lm_pos_c, _, _ = lax.fori_loop(
        0, iters, lm_step,
        (m.kf_pose, lm_pos0, P0, jnp.asarray(1e-4, dtype)))

    if compact:  # scatter the refined compact positions back to full slots
        lm_pos = m.lm_pos.at[jnp.where(lm_active_c, sel, L)].set(
            lm_pos_c, mode="drop")
    else:
        lm_pos = lm_pos_c

    # adaptive outlier threshold: double until inlier ratio > 0.5
    # (backend.cpp:166-193). With compaction the final chi2 rides the same
    # one-hot as the LM loop (the full-set evaluation's 2x(K*F)-row gathers
    # cost more than a whole LM iteration on the TPU runtime); observations
    # of OVERFLOWED landmarks — absent from the compact set — are simply
    # never unlinked this pass, consistent with the compaction contract
    # above (their landmarks also receive no update).
    if compact:
        c_final, in_front = chi2_fn(kf_pose, lm_pos_c, obs_c, lm_onehot=O)
        obs_eval = obs_c
    else:
        c_final, in_front = chi2_fn(kf_pose, lm_pos, obs)
        obs_eval = obs
    total = jnp.maximum(jnp.sum(obs_eval.valid), 1)

    # run at most outlier_rounds doublings
    th = jnp.asarray(chi2_th, dtype)
    ratio = jnp.sum(obs_eval.valid & (c_final <= th) & in_front) / total
    for _ in range(outlier_rounds):
        do = ratio <= 0.5
        th = jnp.where(do, th * 2.0, th)
        ratio = jnp.sum(obs_eval.valid & (c_final <= th) & in_front) / total

    outlier = obs_eval.valid & ((c_final > th) | ~in_front)
    num_outliers = jnp.sum(outlier)

    # unlink outlier observations (left+right flattened halves -> (K, F));
    # an outlier in either camera severs the feature->landmark link
    # (backend.cpp:195-213)
    out_l = outlier[: K * F].reshape(K, F)
    out_r = outlier[K * F:].reshape(K, F)
    sever = out_l | out_r
    linked = m.obs_valid & (m.obs_lm >= 0)
    if compact:
        # observation-count decrements via the one-hot (MXU) + a compact-
        # sized scatter instead of a (2*K*F)-element scatter-add over L
        dec_flat = jnp.concatenate([
            (sever & linked).reshape(-1),
            (sever & linked & m.obs_has_r).reshape(-1)]).astype(dtype)
        dec_c = jnp.einsum("ml,m->l", O, dec_flat,
                           precision=_PREC).astype(jnp.int32)
        new_count = m.lm_obs_count.at[
            jnp.where(lm_active_c, sel, L)].add(-dec_c, mode="drop")
        new_count = jnp.maximum(new_count, 0)
    else:
        dec = jnp.where(sever & linked,
                        1 + (m.obs_has_r & sever & linked), 0)
        safe_lm = jnp.where(linked, m.obs_lm, L)
        new_count = jnp.zeros((L,), jnp.int32).at[safe_lm.reshape(-1)].add(
            -dec.reshape(-1).astype(jnp.int32), mode="drop") + m.lm_obs_count
        new_count = jnp.maximum(new_count, 0)

    m = m._replace(
        kf_pose=kf_pose,
        lm_pos=lm_pos,
        obs_lm=jnp.where(sever, -1, m.obs_lm),
        obs_has_r=m.obs_has_r & ~sever,
        lm_obs_count=new_count,
    )
    return m, (jnp.sum(obs.valid), num_outliers, th, lm_overflow)


class Backend:
    """Pipeline-facing wrapper (the reference's Backend thread object,
    backend.cpp:250-345, minus the thread — the schedule is deterministic:
    one BA pass per keyframe insertion, device-async)."""

    def __init__(self, chi2_th: float = 5.991, iters: int = 10,
                 outlier_rounds: int = 5,
                 max_active_landmarks: int | None = 1024):
        self.chi2_th = chi2_th
        self.iters = iters
        self.outlier_rounds = outlier_rounds
        self.max_active_landmarks = max_active_landmarks
        self.last_stats = None

    def optimize(self, m: mapmod.MapState, cam_left: Camera,
                 cam_right: Camera) -> mapmod.MapState:
        m, stats = optimize_window(
            m, cam_left, cam_right, chi2_th=self.chi2_th, iters=self.iters,
            outlier_rounds=self.outlier_rounds,
            max_active_landmarks=self.max_active_landmarks)
        self.last_stats = stats
        return m
