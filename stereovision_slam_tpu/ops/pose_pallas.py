"""Pallas TPU kernel: the entire multi-start LM pose solve, fused.

The XLA pose solver (slam/pose_solver.py `_lm_rounds`) runs rounds x iters
sequential LM iterations, each ~80 small ops (residual+Jacobian build, 6x6
normal equations, damped solve, se3_exp/compose, acceptance pass) on (F,)-
sized data — ~2.6 ms per frame of pure sequential-op latency on the v5e
runtime while the chip is >99% idle (benchmarks/probe_components.py). This
kernel runs the WHOLE schedule — all rounds, all iterations, the per-round
chi-square re-leveling, and the per-start robust cost — inside ONE
`pallas_call` with a grid over the S starts, reproducing `_lm_rounds`'s
semantics (graduated Huber thresholds, incumbent-cost acceptance, damping
schedule; pose_solver.py:49-114). The damped 6x6 solve uses an unrolled
Cholesky instead of XLA's LU custom call (the system is PD by construction:
J^T W J + lam*diag + 1e-10 I), so step values match to float rounding, not
bitwise; tests assert equal-or-better final robust cost and matching inlier
sets on healthy problems (tests/test_pose_pallas.py).

Observation layout matches the frontend's stereo solve (frontend.py:209-215):
two static halves [left F; right F], each half projecting through its own
scalar camera — the kernel keeps every per-point array as a (2, F) tile
(row 0 left, row 1 right) and per-camera scalars as (2, 1) columns, so all
half-dependent math stays vectorized. Scalars (pose entries, normal
equations, LM bookkeeping) ride as (1, 1) 2-D tiles — 1-D/0-D values in
Mosaic carries trip layout inference (see ops/lk_pallas.py notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pose_kernel(camp_ref, pts_ref, uvo_ref, val_ref, T0_ref,
                 T_out, inlier_out, cost_out, nin_out, *,
                 chi2_th: float, rounds: int, iters: int):
    f32 = jnp.float32
    Fp = pts_ref.shape[1]
    camp = camp_ref[:]                     # (2, 16)

    def cc(i):                             # per-camera scalar column (2, 1)
        return camp[:, i:i + 1]

    fx, fy, cx, cy = cc(0), cc(1), cc(2), cc(3)
    Re = [[cc(4 + 3 * r + c) for c in range(3)] for r in range(3)]
    te = [cc(13), cc(14), cc(15)]

    px = pts_ref[0:1, :]                   # (1, Fp)
    py = pts_ref[1:2, :]
    pz = pts_ref[2:3, :]
    u_obs = jnp.concatenate([uvo_ref[0:1, :], uvo_ref[2:3, :]], axis=0)
    v_obs = jnp.concatenate([uvo_ref[1:2, :], uvo_ref[3:4, :]], axis=0)
    valid = val_ref[:] > 0.5               # (2, Fp)

    def s11(x):                            # scalar reduce -> (1, 1)
        return jnp.sum(x, axis=(0, 1), keepdims=True)

    def project(T):
        """T (3, 4) -> per-observation residual pieces, all (2, Fp)."""
        def Tij(i, j):
            return T[i:i + 1, j:j + 1]
        qx = Tij(0, 0) * px + Tij(0, 1) * py + Tij(0, 2) * pz + Tij(0, 3)
        qy = Tij(1, 0) * px + Tij(1, 1) * py + Tij(1, 2) * pz + Tij(1, 3)
        qz = Tij(2, 0) * px + Tij(2, 1) * py + Tij(2, 2) * pz + Tij(2, 3)
        X = Re[0][0] * qx + Re[0][1] * qy + Re[0][2] * qz + te[0]
        Y = Re[1][0] * qx + Re[1][1] * qy + Re[1][2] * qz + te[1]
        Z = Re[2][0] * qx + Re[2][1] * qy + Re[2][2] * qz + te[2]
        Zs = jnp.where(jnp.abs(Z) < 1e-8, 1e-8, Z)
        iz = 1.0 / Zs
        ru = fx * X * iz + cx - u_obs
        rv = fy * Y * iz + cy - v_obs
        return qx, qy, qz, X, Y, iz, Z, ru, rv

    def chi2_at(T):
        """Raw chi2 with behind-camera -> 1e12 (pose_solver._chi2)."""
        _, _, _, _, _, _, Z, ru, rv = project(T)
        c = ru * ru + rv * rv
        return jnp.where(Z > 1e-6, c, 1e12)

    def jac_cols(qx, qy, qz, X, Y, iz):
        """12 pose-Jacobian columns, each (2, Fp), (a, i) -> a*6+i — the
        same contraction order as jacobians.reprojection_residual_jac."""
        iz2 = iz * iz
        jrow = [(fx * iz, None, -fx * X * iz2),
                (None, fy * iz, -fy * Y * iz2)]
        # Rdq = [R_ext | R_ext @ -hat(q)]
        rdq = [[Re[r][i] for r in range(3)] for i in range(3)]
        for col in ((None, -qz, qy), (qz, None, -qx), (-qy, qx, None)):
            rdq.append([
                sum((Re[r][k] * col[k] for k in range(3) if col[k] is not None),
                    start=jnp.zeros((1, 1), f32)) for r in range(3)])
        cols = []
        for a in range(2):
            for i in range(6):
                acc = None
                for k in range(3):
                    if jrow[a][k] is None:
                        continue
                    t = jrow[a][k] * rdq[i][k]
                    acc = t if acc is None else acc + t
                cols.append(acc)
        return cols

    def chol_solve(H, b):
        """Solve (6x6 PD) H x = -b; H list-of-lists / b list of (1, 1)s."""
        L = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(i + 1):
                s = H[i][j]
                for k in range(j):
                    s = s - L[i][k] * L[j][k]
                if i == j:
                    L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
                else:
                    L[i][j] = s / L[j][j]
        y = [None] * 6
        for i in range(6):
            s = -b[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        x = [None] * 6
        for i in range(5, -1, -1):
            s = y[i]
            for k in range(i + 1, 6):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        return x

    def se3_exp_compose(dx, T):
        """exp([v, w]) @ T with dx = 6 x (1, 1), T (3, 4) -> (3, 4).

        Same Rodrigues/left-Jacobian forms and small-angle guards as
        geometry/se3.se3_exp (coefficients a, b, c of _rot_coeffs)."""
        v = dx[:3]
        w = dx[3:]
        t2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
        small = t2 < 1e-8
        t2s = jnp.where(small, 1.0, t2)
        th = jnp.sqrt(t2s)
        sin_t = jnp.sin(th)
        cos_t = jnp.cos(th)
        a = jnp.where(small, 1.0 - t2 / 6.0, sin_t / th)
        b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - cos_t) / t2s)
        c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (th - sin_t) / (t2s * th))
        wx, wy, wz = w
        W = [[None, -wz, wy], [wz, None, -wx], [-wy, wx, None]]

        def matsq(A):
            return [[sum((A[i][k] * A[k][j] for k in range(3)
                          if A[i][k] is not None and A[k][j] is not None),
                         start=jnp.zeros((1, 1), f32)) for j in range(3)]
                    for i in range(3)]

        W2 = matsq(W)
        eye = [[1.0 if i == j else 0.0 for j in range(3)] for i in range(3)]
        R = [[eye[i][j] + (a * W[i][j] if W[i][j] is not None else 0.0)
              + b * W2[i][j] for j in range(3)] for i in range(3)]
        V = [[eye[i][j] + (b * W[i][j] if W[i][j] is not None else 0.0)
              + c * W2[i][j] for j in range(3)] for i in range(3)]
        tr = [sum(V[i][k] * v[k] for k in range(3)) for i in range(3)]
        # compose: [R|tr] @ T
        rows = []
        for i in range(3):
            row = []
            for j in range(4):
                s = sum(R[i][k] * T[k:k + 1, j:j + 1] for k in range(3))
                if j == 3:
                    s = s + tr[i]
                row.append(s)
            rows.append(jnp.concatenate(row, axis=1))
        return jnp.concatenate(rows, axis=0)

    T = T0_ref[0]                          # (3, 4)
    inlier = valid

    for rnd in range(rounds):
        use_huber = rnd < rounds - 1
        round_th = jnp.asarray(chi2_th * float(2 ** (rounds - 1 - rnd)), f32)

        inl_f = inlier.astype(f32)

        def lm_iter(_, carry):
            T, lam = carry
            qx, qy, qz, X, Y, iz, Z, ru, rv = project(T)
            w = inl_f * (Z > 1e-6).astype(f32)
            c = ru * ru + rv * rv
            if use_huber:
                w = w * jnp.where(
                    c <= round_th, 1.0,
                    jnp.sqrt(round_th / jnp.maximum(c, 1e-20)))
            J = jac_cols(qx, qy, qz, X, Y, iz)
            wJ = [w * col for col in J]
            H = [[None] * 6 for _ in range(6)]
            for i in range(6):
                for j in range(i + 1):
                    H[i][j] = s11(wJ[i] * J[j] + wJ[6 + i] * J[6 + j])
                    H[j][i] = H[i][j]
            bvec = [s11(wJ[i] * ru + wJ[6 + i] * rv) for i in range(6)]
            # damping: H + lam*diag(H) + 1e-10 I  (pose_solver._solve_damped)
            Hd = [[H[i][j] + lam * H[i][i] + 1e-10 if i == j else H[i][j]
                   for j in range(6)] for i in range(6)]
            dx = chol_solve(Hd, bvec)
            T_new = se3_exp_compose(dx, T)

            # incumbent cost from the residuals above; candidate cost from a
            # fresh pass (pose_solver.py:78-97)
            def robust(cq, mask):
                if use_huber:
                    cq = jnp.where(cq <= round_th, cq,
                                   2.0 * jnp.sqrt(round_th * cq) - round_th)
                return s11(jnp.where(mask, cq, 0.0))

            m_top = inlier & (Z > 1e-6)
            cost_T = robust(c, m_top)
            _, _, _, _, _, _, Zn, run, rvn = project(T_new)
            cost_N = robust(run * run + rvn * rvn, inlier & (Zn > 1e-6))
            better = cost_N < cost_T
            T_out_ = jnp.where(jnp.broadcast_to(better, (3, 4)), T_new, T)
            lam_out = jnp.where(better, jnp.maximum(lam * 0.3, 1e-9),
                                jnp.minimum(lam * 5.0, 1e5))
            return T_out_, lam_out

        T, _ = lax.fori_loop(0, iters, lm_iter,
                             (T, jnp.full((1, 1), 1e-6, f32)))
        next_scale = float(2 ** max(rounds - 2 - rnd, 0))
        inlier = valid & (chi2_at(T) <= chi2_th * next_scale)

    c_fin = chi2_at(T)
    cost = s11(jnp.where(valid, jnp.minimum(c_fin, chi2_th), chi2_th))
    T_out[0] = T
    inlier_out[0] = inlier.astype(f32)
    cost_out[0] = cost
    nin_out[0] = s11(inlier.astype(f32))


def _cam_params(cam) -> jax.Array:
    R = cam.pose[..., :3, :3].reshape(9)
    t = cam.pose[..., :3, 3]
    return jnp.concatenate([
        jnp.stack([cam.fx, cam.fy, cam.cx, cam.cy]).reshape(4), R, t]
    ).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("chi2_th", "rounds", "iters",
                                             "interpret"))
def solve_pose_multi_lr(cam_left, cam_right, T_inits, points, uv_l, uv_r,
                        valid_l, valid_r, *, chi2_th: float = 5.991,
                        rounds: int = 4, iters: int = 10,
                        interpret: bool = False):
    """Fused multi-start stereo pose solve (drop-in for the frontend's
    `solve_pose_multi(_blend_obs_cameras(L, R, F, F), T_inits,
    [pts; pts], [uv_l; uv_r], [valid_l; valid_r])` call, frontend.py:209-215).

    Args:
      T_inits: (S, 3, 4) starts. points: (F, 3). uv_l/uv_r: (F, 2).
      valid_l/valid_r: (F,) bool.

    Returns (T (3, 4), inlier (2F,) bool, num_inliers int32) — num_inliers
    counts the LEFT half (the frontend's n_inliers counts left-camera
    inliers via inlier2[:F]).
    """
    S = T_inits.shape[0]
    F = points.shape[0]
    Fp = ((F + 127) // 128) * 128
    pad = Fp - F

    def p2(x):
        return jnp.pad(x, ((0, 0), (0, pad))) if pad else x

    camp = jnp.stack([_cam_params(cam_left), _cam_params(cam_right)])
    pts = p2(points.astype(jnp.float32).T)             # (3, Fp)
    uvo = p2(jnp.concatenate([uv_l.astype(jnp.float32).T,
                              uv_r.astype(jnp.float32).T]))  # (4, Fp)
    val = p2(jnp.stack([valid_l, valid_r]).astype(jnp.float32))

    kern = functools.partial(_pose_kernel, chi2_th=float(chi2_th),
                             rounds=rounds, iters=iters)
    T_all, inl_all, cost_all, nin_all = pl.pallas_call(
        kern,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((2, 16), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Fp), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Fp), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Fp), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 4), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, 4), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, Fp), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, 3, 4), jnp.float32),
            jax.ShapeDtypeStruct((S, 2, Fp), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((S, 1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(camp, pts, uvo, val, T_inits.astype(jnp.float32))

    best = jnp.argmin(cost_all[:, 0, 0])
    inl = inl_all[best] > 0.5                          # (2, Fp)
    inlier = jnp.concatenate([inl[0, :F], inl[1, :F]])
    return T_all[best], inlier, jnp.sum(inl[0, :F]).astype(jnp.int32)
