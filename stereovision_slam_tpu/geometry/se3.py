"""SO(3)/SE(3) Lie-group operations as batched JAX functions.

Replaces the Sophus dependency of the reference system (used throughout, e.g.
/root/reference/include/StereoVisionSLAM/camera.h and g2o_types.h): exp/log
maps, composition, inverse and group actions, all vmap/jit-friendly with
small-angle Taylor guards so gradients stay finite.

Conventions (chosen to match Sophus semantics relied on by the reference):
  * an SE(3) element is stored as a (..., 3, 4) array ``T = [R | t]``;
  * the tangent vector is ``xi = [v(3), w(3)]`` — translation part first,
    rotation part last (Sophus SE3d::exp ordering, used by the reference's
    left-multiplicative vertex update, g2o_types.h:40-60);
  * ``se3_exp(xi) @ T`` is therefore the same update rule as the reference's
    ``_estimate = Sophus::SE3d::exp(update) * _estimate``.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8

# Tiny 3x3 geometry matmuls must NOT drop to bf16 MXU precision on TPU —
# pose chains accumulate over thousands of frames. Always request full f32.
_PREC = jax.lax.Precision.HIGHEST


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched matmul at full precision."""
    return jnp.matmul(a, b, precision=_PREC)


def _mv(a: jax.Array, v: jax.Array) -> jax.Array:
    """Batched matrix-vector product at full precision."""
    return jnp.einsum("...ij,...j->...i", a, v, precision=_PREC)


def so3_hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of w: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    rows = [
        jnp.stack([zero, -wz, wy], axis=-1),
        jnp.stack([wz, zero, -wx], axis=-1),
        jnp.stack([-wy, wx, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def so3_vee(W: jax.Array) -> jax.Array:
    """Inverse of so3_hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _rot_coeffs(w: jax.Array):
    """Grad-safe Rodrigues coefficients from the tangent w.

    Returns (a, b, c) with a = sin(t)/t, b = (1-cos t)/t^2,
    c = (t - sin t)/t^3, each branch-guarded so gradients stay finite at
    t = 0 (the sqrt never sees 0; small branches are polynomials in t^2).
    """
    t2 = jnp.sum(w * w, axis=-1)
    small = t2 < 1e-8
    t2s = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(t2s)
    sin_t, cos_t = jnp.sin(t), jnp.cos(t)
    a = jnp.where(small, 1.0 - t2 / 6.0, sin_t / t)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - cos_t) / t2s)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (t - sin_t) / (t2s * t))
    return a, b, c


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues formula: (..., 3) tangent -> (..., 3, 3) rotation."""
    W = so3_hat(w)
    W2 = _mm(W, W)
    a, b, _ = _rot_coeffs(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle tangent, (..., 3, 3) -> (..., 3).

    Uses the trace formula with guards near theta = 0 and theta = pi.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # clip away from +-1 so arccos' infinite slope never enters the grad; the
    # resulting theta floor (~4.5e-4) is harmless: near identity the Taylor
    # scale is ~0.5 regardless, and the near-pi branch has its own guard.
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0 + 1e-7, 1.0 - 1e-7))
    # vee of the antisymmetric part: 2 sin(theta) * axis
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # generic branch: w = theta / (2 sin theta) * v
    sin_theta = jnp.sin(theta)
    near_pi = cos_theta < -1.0 + 1e-5
    small = theta < 1e-5
    generic_scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,  # Taylor of theta/(2 sin theta)
        theta / jnp.where(jnp.abs(sin_theta) < _EPS, 1.0, 2.0 * sin_theta),
    )
    w_generic = generic_scale[..., None] * v

    # near-pi branch: axis from the dominant diagonal of (R + I)/2
    B = (R + jnp.eye(3, dtype=R.dtype)) * 0.5
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    axis_unnorm = jnp.sqrt(jnp.maximum(diag, 0.0))
    # fix signs using off-diagonals relative to the largest component
    k = jnp.argmax(diag, axis=-1)

    def _signed_axis(Bm, km, axm):
        s01 = jnp.sign(Bm[0, 1] + _EPS)
        s02 = jnp.sign(Bm[0, 2] + _EPS)
        s12 = jnp.sign(Bm[1, 2] + _EPS)
        ax0 = jnp.array([axm[0], s01 * axm[1], s02 * axm[2]])
        ax1 = jnp.array([s01 * axm[0], axm[1], s12 * axm[2]])
        ax2 = jnp.array([s02 * axm[0], s12 * axm[1], axm[2]])
        return jnp.where(km == 0, ax0, jnp.where(km == 1, ax1, ax2))

    flat_B = B.reshape((-1, 3, 3))
    flat_k = k.reshape((-1,))
    flat_ax = axis_unnorm.reshape((-1, 3))
    signed = jax.vmap(_signed_axis)(flat_B, flat_k, flat_ax)
    signed = signed.reshape(axis_unnorm.shape)
    norm = jnp.linalg.norm(signed, axis=-1, keepdims=True)
    axis = signed / jnp.where(norm < _EPS, 1.0, norm)
    w_pi = theta[..., None] * axis

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def _so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian V of SO(3): t = V(w) v in se3_exp."""
    W = so3_hat(w)
    W2 = _mm(W, W)
    _, b, c = _rot_coeffs(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def _so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    """Inverse of the left Jacobian, used in se3_log."""
    W = so3_hat(w)
    W2 = _mm(W, W)
    t2 = jnp.sum(w * w, axis=-1)
    small = t2 < 1e-8
    t2s = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(t2s)
    half = 0.5 * t
    sin_half = jnp.sin(half)
    sin_half_safe = jnp.where(jnp.abs(sin_half) < _EPS, 1.0, sin_half)
    # coefficient: (1 - (t/2) cot(t/2)) / t^2, Taylor 1/12 + t^2/720 near 0
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        (1.0 - half * jnp.cos(half) / sin_half_safe) / t2s,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


def se3_identity(dtype=jnp.float32) -> jax.Array:
    """Identity transform as a (3, 4) [R|t] array."""
    return jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype=dtype)], axis=-1)


def se3_from_Rt(R: jax.Array, t: jax.Array) -> jax.Array:
    """Pack rotation (..., 3, 3) + translation (..., 3) into (..., 3, 4)."""
    return jnp.concatenate([R, t[..., None]], axis=-1)


def se3_R(T: jax.Array) -> jax.Array:
    return T[..., :3, :3]


def se3_t(T: jax.Array) -> jax.Array:
    return T[..., :3, 3]


def se3_matrix(T: jax.Array) -> jax.Array:
    """(..., 3, 4) -> homogeneous (..., 4, 4)."""
    bottom = jnp.zeros(T.shape[:-2] + (1, 4), dtype=T.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([T, bottom], axis=-2)


def se3_exp(xi: jax.Array) -> jax.Array:
    """Tangent [v, w] (..., 6) -> (..., 3, 4) transform."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = _so3_left_jacobian(w)
    t = _mv(V, v)
    return se3_from_Rt(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """(..., 3, 4) transform -> tangent [v, w] (..., 6)."""
    R, t = se3_R(T), se3_t(T)
    w = so3_log(R)
    Vinv = _so3_left_jacobian_inv(w)
    v = _mv(Vinv, t)
    return jnp.concatenate([v, w], axis=-1)


def se3_compose(Ta: jax.Array, Tb: jax.Array) -> jax.Array:
    """Group product Ta * Tb for (..., 3, 4) transforms."""
    Ra, ta = se3_R(Ta), se3_t(Ta)
    Rb, tb = se3_R(Tb), se3_t(Tb)
    R = _mm(Ra, Rb)
    t = _mv(Ra, tb) + ta
    return se3_from_Rt(R, t)


def se3_inverse(T: jax.Array) -> jax.Array:
    """Group inverse for (..., 3, 4) transforms."""
    R, t = se3_R(T), se3_t(T)
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -_mv(Rinv, t)
    return se3_from_Rt(Rinv, tinv)


def se3_apply(T: jax.Array, p: jax.Array) -> jax.Array:
    """Apply transform to points: (..., 3, 4) x (..., 3) -> (..., 3)."""
    return _mv(se3_R(T), p) + se3_t(T)


def se3_distance(Ta: jax.Array, Tb: jax.Array) -> jax.Array:
    """Tangent-space distance ||log(Ta * Tb^-1)||, as used by the reference
    for keyframe eviction (map.cpp:76-181) and loop-pose gating
    (loopclosure.cpp:408-424)."""
    return jnp.linalg.norm(se3_log(se3_compose(Ta, se3_inverse(Tb))), axis=-1)


def se3_adjoint(T: jax.Array) -> jax.Array:
    """SE(3) adjoint (..., 6, 6) for the [v, w] tangent ordering:

        T * exp(xi) * T^-1 = exp(Adj(T) @ xi),   Adj = [[R, hat(t) R],
                                                        [0,       R]].

    Used to transport tangent-frame quadratic forms between frames — e.g.
    the loop-closure PnP Hessian (built in the left tangent of the corrected
    pose, fused_loop.py) into the pose-graph edge-residual tangent
    (pose_graph._linearize): info_resid = Adj(meas)^T H_pose Adj(meas).
    """
    R, t = se3_R(T), se3_t(T)
    tR = _mm(so3_hat(t), R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
