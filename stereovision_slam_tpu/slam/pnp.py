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

from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.geometry.camera import Camera, pixel2camera
from stereovision_slam_tpu.slam.pose_solver import solve_pose

_PREC = jax.lax.Precision.HIGHEST
MIN_SET = 6


def _dlt_pose(pts3d: jax.Array, xy_norm: jax.Array):
    """DLT camera pose from >=6 correspondences (one minimal set).

    Args:
      pts3d: (S, 3) world points.
      xy_norm: (S, 2) normalized image coords.

    Returns (3, 4) world->camera transform (approximately SE(3))."""
    S = pts3d.shape[0]
    X = jnp.concatenate([pts3d, jnp.ones((S, 1), pts3d.dtype)], axis=1)  # (S,4)
    zeros = jnp.zeros_like(X)
    x = xy_norm[:, 0:1]
    y = xy_norm[:, 1:2]
    rows_x = jnp.concatenate([X, zeros, -x * X], axis=1)   # (S, 12)
    rows_y = jnp.concatenate([zeros, X, -y * X], axis=1)
    A = jnp.concatenate([rows_x, rows_y], axis=0)          # (2S, 12)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0]                                         # smallest eigvec
    P = p.reshape(3, 4)

    def orthonormalize(Pm):
        """Project [M|t] onto SE(3): R from M's SVD, t rescaled to match."""
        M = Pm[:, :3]
        U, sv, Vt = jnp.linalg.svd(M)
        detUV = jnp.linalg.det(U @ Vt)
        D = jnp.diag(jnp.array([1.0, 1.0, 1.0], M.dtype)).at[2, 2].set(
            jnp.sign(detUV))
        R = U @ D @ Vt
        scale = jnp.mean(sv) * jnp.sign(detUV)
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
    T_rig0 = se3.se3_compose(se3.se3_inverse(cam.pose), T_cam)
    T_rig, inliers, n_in = solve_pose(
        cam, T_rig0, pts3d, uv, inliers0,
        chi2_th=reproj_threshold * reproj_threshold,
        rounds=refine_rounds, iters=10)
    return T_rig, inliers, n_in
