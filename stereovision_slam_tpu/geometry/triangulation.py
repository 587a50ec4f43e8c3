"""Batched linear (DLT) triangulation.

TPU-native equivalent of the reference's ``triangulation()``
(/root/reference/include/StereoVisionSLAM/algorithm.h:10-87): for each
correspondence pair on the two camera normal planes, build the 4x4 homogeneous
system A w = 0 and take the null vector. Instead of a per-point dynamic-shape
SVD loop, all points are solved in one batch — the null vector is the
smallest-eigenvalue eigenvector of the Gram matrix A^T A, computed by the
constant-free batched Jacobi eigensolver (geometry/symeig.py; using
``jnp.linalg.svd`` here would embed qdwh coefficient tables as array
constants, which the axon runtime executes ~100x slower — see
docs/PERFORMANCE.md "array-constant cliff").

Quality gate matches the reference: sigma_4 / sigma_3 < 1e-2 keeps the point
(algorithm.h:79-86) with sigma_i(A) = sqrt(eig_i(A^T A)), plus the caller
applies the depth gate 0 < z <= max_depth (frontend.cpp:186-189).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stereovision_slam_tpu.geometry.symeig import symeig_small


def triangulate(poses: jax.Array, points: jax.Array, sv_ratio_thresh: float = 1e-2):
    """Triangulate N points seen by C cameras.

    Args:
      poses: (C, 3, 4) camera poses (rig->camera extrinsics, as in the
        reference where triangulation happens in the rig frame).
      points: (N, C, 2) normalized-plane coordinates per camera.
      sv_ratio_thresh: singular-value ratio gate.

    Returns:
      xyz: (N, 3) triangulated points (in the frame the poses map from).
      ok:  (N,) bool quality mask.
    """
    # Rows of A: x * P[2] - P[0]  and  y * P[2] - P[1], per camera.
    # A has shape (N, 2C, 4).
    p0 = poses[:, 0, :]  # (C, 4)
    p1 = poses[:, 1, :]
    p2 = poses[:, 2, :]
    x = points[..., 0][..., None]  # (N, C, 1)
    y = points[..., 1][..., None]
    rows_x = x * p2[None] - p0[None]          # (N, C, 4)
    rows_y = y * p2[None] - p1[None]
    A = jnp.concatenate([rows_x, rows_y], axis=1)  # (N, 2C, 4)

    # Null vector = eigenvector of the smallest eigenvalue of A^T A (4x4 PSD);
    # eig_i(A^T A) = sigma_i(A)^2. symeig_small returns ascending order.
    B = jnp.einsum("nri,nrj->nij", A, A)
    # 4 cyclic-Jacobi sweeps: measured indistinguishable from 8 for these
    # 4x4 PSD Gram matrices (triangulated-point error identical to the
    # observation-noise floor from 3 sweeps up), and the sweep stack is a
    # top per-keyframe cost on the TPU profile (benchmarks/profile_lc_step)
    lam, V = symeig_small(B, sweeps=4)
    lam = jnp.maximum(lam, 0.0)               # PSD: clamp tiny negatives
    s = jnp.sqrt(lam[:, ::-1])                # descending singular values of A
    w = V[:, :, 0]                            # (N, 4) smallest-eig eigenvector
    wh = w[:, 3]
    safe_wh = jnp.where(jnp.abs(wh) < 1e-12, 1.0, wh)
    xyz = w[:, :3] / safe_wh[:, None]

    ok = (s[:, 3] / jnp.maximum(s[:, 2], 1e-20)) < sv_ratio_thresh
    # Reference gate assumes rank >= 3; a (near-)rank-deficient A means the
    # point is unconstrained (no parallax) — reject those too.
    ok = ok & (s[:, 2] > 1e-6 * jnp.maximum(s[:, 0], 1e-20))
    ok = ok & (jnp.abs(wh) >= 1e-12)
    return xyz, ok


def triangulate_stereo(baseline: jax.Array, points_l: jax.Array, points_r: jax.Array,
                       sv_ratio_thresh: float = 1e-2):
    """Two-view special case for a rectified stereo rig.

    The reference calls the generic solver with the left/right extrinsics
    (frontend.cpp:173-185); for KITTI those are pure x-translations, so this
    helper builds the two poses from the baselines and dispatches to
    :func:`triangulate`.

    Args:
      baseline: (2,) x-offsets of (left, right) cameras in the rig frame
        (i.e. the translation column of each extrinsic).
      points_l/points_r: (N, 2) normalized-plane coords.
    """
    eye = jnp.eye(3, dtype=points_l.dtype)
    t = jnp.stack([
        jnp.stack([baseline[0], 0.0, 0.0]),
        jnp.stack([baseline[1], 0.0, 0.0]),
    ]).astype(points_l.dtype)
    poses = jnp.concatenate([jnp.broadcast_to(eye, (2, 3, 3)), t[:, :, None]], axis=-1)
    pts = jnp.stack([points_l, points_r], axis=1)  # (N, 2, 2)
    return triangulate(poses, pts, sv_ratio_thresh)
