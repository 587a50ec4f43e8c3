"""Analytic projection residuals + Jacobians for GN/LM solvers.

Replaces the reference's g2o edge linearizations: the analytic 2x6 pose-only
Jacobian (/root/reference/include/StereoVisionSLAM/g2o_types.h:132-163), the
binary pose x landmark edge (g2o_types.h:176-229, numeric there — analytic
here), and the SE(3) relative-pose edge used by pose-graph optimization
(g2o_types.h:231-267).

Conventions:
  * residual r = project(point) - measurement (note: the reference uses
    measurement - prediction; normal equations are identical, the update step
    here solves H dx = -J^T r);
  * pose updates are left-multiplicative, ``T <- se3_exp(dx) @ T`` with
    tangent ordering [v, w] (translation first), matching g2o_types.h:40-60;
  * everything is batched over the leading observation axis.

Validated against ``jax.jacfwd`` in tests/test_jacobians.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST

from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.geometry.camera import Camera


def project_points(cam: Camera, T_c_w: jax.Array, p_w: jax.Array):
    """Project world points through rig pose + camera extrinsic.

    Args:
      cam: camera (with rig->camera extrinsic ``cam.pose``).
      T_c_w: (..., 3, 4) rig pose(s).
      p_w: (..., 3) world points.

    Returns:
      uv: (..., 2) pixels; p_cam: (..., 3) camera-frame points (for gating).
    """
    q = se3.se3_apply(T_c_w, p_w)          # rig frame
    p_cam = se3.se3_apply(cam.pose, q)     # camera frame
    z = p_cam[..., 2]
    uv = jnp.stack(
        [
            cam.fx * p_cam[..., 0] / z + cam.cx,
            cam.fy * p_cam[..., 1] / z + cam.cy,
        ],
        axis=-1,
    )
    return uv, p_cam


def reprojection_residual_jac(cam: Camera, T_c_w: jax.Array, p_w: jax.Array,
                              uv_obs: jax.Array):
    """Residual + analytic Jacobians of the reprojection error.

    Args:
      cam: camera.
      T_c_w: (3, 4) or broadcastable (..., 3, 4) rig pose.
      p_w: (..., 3) world points.
      uv_obs: (..., 2) observed pixels.

    Returns:
      r: (..., 2) residual (prediction - observation).
      J_pose: (..., 2, 6) d r / d xi for the left-mult update exp(xi) @ T.
      J_point: (..., 2, 3) d r / d p_w.
      p_cam: (..., 3) camera-frame point (for depth gating / cheirality).
    """
    q = se3.se3_apply(T_c_w, p_w)          # rig-frame point (the update acts here)
    p_cam = se3.se3_apply(cam.pose, q)
    X, Y, Z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    Zsafe = jnp.where(jnp.abs(Z) < 1e-8, 1e-8, Z)
    inv_z = 1.0 / Zsafe
    inv_z2 = inv_z * inv_z

    u = cam.fx * X * inv_z + cam.cx
    v = cam.fy * Y * inv_z + cam.cy
    r = jnp.stack([u, v], axis=-1) - uv_obs

    # d uv / d p_cam : (..., 2, 3)
    zero = jnp.zeros_like(X)
    J_proj = jnp.stack(
        [
            jnp.stack([cam.fx * inv_z, zero, -cam.fx * X * inv_z2], axis=-1),
            jnp.stack([zero, cam.fy * inv_z, -cam.fy * Y * inv_z2], axis=-1),
        ],
        axis=-2,
    )

    R_ext = se3.se3_R(cam.pose)            # (3, 3)
    # d p_cam / d xi = R_ext @ [I | -hat(q)] : (..., 3, 6)
    dq_dxi = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), q.shape[:-1] + (3, 3)),
            -se3.so3_hat(q),
        ],
        axis=-1,
    )
    J_pose = jnp.matmul(J_proj, jnp.matmul(R_ext, dq_dxi, precision=_PREC), precision=_PREC)

    # d p_cam / d p_w = R_ext @ R(T) : (..., 3, 3)
    J_point = jnp.matmul(J_proj, jnp.matmul(R_ext, se3.se3_R(T_c_w), precision=_PREC), precision=_PREC)
    return r, J_pose, J_point, p_cam


def relative_pose_residual(T0: jax.Array, T1: jax.Array, T01_meas: jax.Array):
    """SE(3) relative-pose residual for pose-graph edges.

    r = log(T01_meas^-1 * T0 * T1^-1), the reference's EdgePoseGraph error
    (g2o_types.h:231-267). Batched over leading dims.
    """
    return se3.se3_log(
        se3.se3_compose(
            se3.se3_inverse(T01_meas), se3.se3_compose(T0, se3.se3_inverse(T1))
        )
    )


def huber_weight(r2: jax.Array, delta2: jax.Array) -> jax.Array:
    """IRLS weight of the Huber kernel on squared error r2 with threshold
    delta2 (the reference uses g2o RobustKernelHuber with delta = sqrt(chi2_th),
    backend.cpp:150-152)."""
    return jnp.where(r2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(r2, 1e-20)))
