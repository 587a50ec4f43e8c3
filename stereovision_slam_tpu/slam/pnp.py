"""Batched PnP RANSAC: camera pose from 2D-3D correspondences.

TPU-native replacement for the reference's cv::solvePnPRansac call in loop
closure (/root/reference/src/loopclosure.cpp:376-383: 100 iterations,
reprojection threshold 5.991 px, confidence 0.99). RANSAC is branchy and
sequential in OpenCV; here all hypotheses run as one batched program:

  * H minimal 6-point sets sampled at once (Gumbel top-k, no replacement);
  * each hypothesis solved by normalized DLT — the 12x12 normal matrix's
    null vector via batched eigh, orthonormalized to SE(3) by SVD;
  * inliers counted for all hypotheses against all points in one broadcast;
  * the best hypothesis is GN-refined on its inliers with the existing
    pose solver (the reference refines inside solvePnPRansac's final LM).

Returns the rig pose (the caller folds in the camera extrinsic as the
reference does at loopclosure.cpp:394-396).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.geometry.camera import Camera, pixel2camera
from stereovision_slam_tpu.geometry.symeig import symeig_small
from stereovision_slam_tpu.slam.pose_solver import solve_pose

_PREC = jax.lax.Precision.HIGHEST
# Hypothesis sample size: 6 is the DLT minimum, but a minimal 6-point pose
# DLT amplifies pixel noise catastrophically in f32 (measured: 0.5 px noise
# -> median 1.7 m translation error). 10-point sets cut that ~5x while a
# 128-256 hypothesis batch still contains plenty of outlier-free samples at
# realistic inlier rates (0.8^10 ~ 11%).
MIN_SET = 10


def _smallest_eigvec(AtA: jax.Array, iters: int = 12) -> jax.Array:
    """Smallest-eigenvalue eigenvector of a PSD (d, d) matrix by shifted
    inverse iteration (LU solves). ``jnp.linalg.eigh`` is avoided on purpose:
    its lowering embeds coefficient-table array constants, which the axon
    runtime executes pathologically (docs/PERFORMANCE.md "array-constant
    cliff"). Inverse iteration converges geometrically with ratio
    lam_min/lam_2 — for DLT normal matrices of non-degenerate minimal sets
    the gap is large; near-degenerate sets yield poor hypotheses that RANSAC
    scoring discards anyway."""
    d = AtA.shape[-1]
    dtype = AtA.dtype
    eps = 1e-6 * (jnp.trace(AtA) / d + 1e-30)
    Ad = AtA + eps * jnp.eye(d, dtype=dtype)
    v0 = jnp.full((d,), 1.0, dtype) / jnp.sqrt(jnp.asarray(float(d), dtype))

    def body(_, v):
        w = jnp.linalg.solve(Ad, v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    return lax.fori_loop(0, iters, body, v0)


def _dlt_pose(pts3d: jax.Array, xy_norm: jax.Array):
    """DLT camera pose from >=6 correspondences (one minimal set).

    Args:
      pts3d: (S, 3) world points.
      xy_norm: (S, 2) normalized image coords.

    Returns (3, 4) world->camera transform (approximately SE(3))."""
    S = pts3d.shape[0]
    # Hartley normalization of the world points (center + RMS-sqrt(3) scale):
    # without it the DLT normal matrix's eigenvalue spread swallows the
    # null-space gap and the inverse iteration in _smallest_eigvec (and f32
    # generally) cannot separate the null vector on wide-depth-range scenes
    c = jnp.mean(pts3d, axis=0)
    centered = pts3d - c
    s = jnp.maximum(jnp.sqrt(jnp.mean(jnp.sum(centered * centered, axis=1))
                             / 3.0), 1e-9)
    Xn = centered / s
    X = jnp.concatenate([Xn, jnp.ones((S, 1), pts3d.dtype)], axis=1)  # (S,4)
    zeros = jnp.zeros_like(X)
    x = xy_norm[:, 0:1]
    y = xy_norm[:, 1:2]
    rows_x = jnp.concatenate([X, zeros, -x * X], axis=1)   # (S, 12)
    rows_y = jnp.concatenate([zeros, X, -y * X], axis=1)
    A = jnp.concatenate([rows_x, rows_y], axis=0)          # (2S, 12)
    AtA = A.T @ A
    p = _smallest_eigvec(AtA)                              # null vector
    Pn = p.reshape(3, 4)
    # denormalize: Pn acts on (X - c)/s, so M = Mn/s, t = tn - Mn c / s
    Mn = Pn[:, :3]
    P = jnp.concatenate([Mn / s, (Pn[:, 3] - Mn @ c / s)[:, None]], axis=1)

    def orthonormalize(Pm):
        """Project [M|t] onto SE(3) via the polar decomposition, computed
        with the constant-free Jacobi eigensolver: M^T M = V S^2 V^T gives
        the SVD factors (U = M V S^-1), so R = U diag(1,1,s) V^T with
        s = sign(det) — same result as the SVD route without jnp.linalg.svd
        (whose qdwh tables would poison the executable)."""
        M = Pm[:, :3]
        lam, V = symeig_small((M.T @ M)[None])             # ascending
        lam = jnp.maximum(lam[0], 0.0)
        V = V[0]
        sv = jnp.sqrt(lam)                                 # ascending sing.values
        sv_safe = jnp.maximum(sv, 1e-12)
        U = M @ V / sv_safe[None, :]
        detM = jnp.linalg.det(M)
        s = jnp.where(detM >= 0.0, 1.0, -1.0)
        # flip the column of U paired with the SMALLEST singular value
        # (index 0 in ascending order) when det < 0
        flip = jnp.where(jnp.arange(3) == 0, s, 1.0).astype(M.dtype)
        R = (U * flip[None, :]) @ V.T
        scale = jnp.mean(sv) * s
        t = Pm[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
        return se3.se3_from_Rt(R, t)

    # the null vector's sign is arbitrary: build both candidates and keep the
    # one with more points in front of the camera
    Ta = orthonormalize(P)
    Tb = orthonormalize(-P)

    def front_count(T):
        z = pts3d @ T[2, :3] + T[2, 3]
        return jnp.sum(z > 0)

    return jnp.where(front_count(Ta) >= front_count(Tb), Ta, Tb)


@partial(jax.jit, static_argnames=("num_hypotheses", "refine_rounds"))
def pnp_ransac(cam: Camera, pts3d: jax.Array, uv: jax.Array, valid: jax.Array,
               key: jax.Array, reproj_threshold: float = 5.991,
               num_hypotheses: int = 128, refine_rounds: int = 2):
    """Robust rig pose from 2D(left image)-3D correspondences.

    Args:
      cam: left camera (extrinsic folded into the returned rig pose).
      pts3d: (N, 3) world landmarks.
      uv: (N, 2) observed pixels in the current left image.
      valid: (N,) usable correspondences.
      key: PRNG key (callers derive it from the keyframe id, deterministic).

    Returns:
      T_rig: (3, 4) corrected rig pose (T_c_w).
      inliers: (N,) final inlier mask.
      num_inliers: () int32.
    """
    N = pts3d.shape[0]
    dtype = pts3d.dtype

    # normalized coords through K only (PnP ignores the rig extrinsic)
    xy = pixel2camera(cam, uv)[:, :2]

    # sample H minimal sets without replacement (Gumbel top-k over valid)
    logits = jnp.where(valid, 0.0, -1e9)
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, (num_hypotheses, N), dtype, 1e-9, 1.0) ))
    _, sel = jax.lax.top_k(logits[None, :] + gumbel, MIN_SET)  # (H, 6)

    hyp_pts = pts3d[sel]       # (H, 6, 3)
    hyp_xy = xy[sel]           # (H, 6, 2)
    T_cam_h = jax.vmap(_dlt_pose)(hyp_pts, hyp_xy)             # (H, 3, 4)

    # score all hypotheses: reprojection error of every point
    p_cam = jnp.einsum("hij,nj->hni", T_cam_h[:, :, :3], pts3d,
                       precision=_PREC) + T_cam_h[:, None, :, 3]
    z = p_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * p_cam[..., 0] / zs + cam.cx
    v = cam.fy * p_cam[..., 1] / zs + cam.cy
    err = jnp.sqrt((u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2)
    inl = valid[None, :] & (err <= reproj_threshold) & (z > 0)
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    T_cam = T_cam_h[best]
    inliers0 = inl[best]

    # GN refinement on the best inlier set, in rig-pose parameterization
    th2 = reproj_threshold * reproj_threshold
    T_rig0 = se3.se3_compose(se3.se3_inverse(cam.pose), T_cam)
    T_rig1, _, _ = solve_pose(cam, T_rig0, pts3d, uv, inliers0,
                              chi2_th=th2, rounds=refine_rounds, iters=10)
    # LO-RANSAC-style second stage: the refined pose is far better than the
    # raw hypothesis, so RE-CLASSIFY over ALL candidates (the first stage's
    # inlier set is capped by the hypothesis's own consensus) and solve once
    # more — this recovers the full inlier set the way solvePnPRansac's
    # final LM does (loopclosure.cpp:376-383)
    from stereovision_slam_tpu.slam.pose_solver import _chi2
    c1 = _chi2(cam, T_rig1, pts3d, uv)
    inliers1 = valid & (c1 <= th2)
    T_rig, inliers, n_in = solve_pose(cam, T_rig1, pts3d, uv, inliers1,
                                      chi2_th=th2,
                                      rounds=refine_rounds, iters=10)
    return T_rig, inliers, n_in
