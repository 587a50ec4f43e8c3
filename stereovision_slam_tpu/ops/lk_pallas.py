"""Pallas TPU kernel: the windowed Lucas-Kanade iteration loop, fused.

The XLA windowed path (ops/lk.py `_track_level`) runs the Gauss-Newton
iteration as a `lax.while_loop` whose body issues ~20 small ops (one-hot
selects, two batched matmuls, bilinear combine, reductions, the 2x2 solve);
on the TPU runtime each fine pyramid level costs ~0.1 ms PER ITERATION in
sequential small-op latency even though the arithmetic is a few MFLOP.
This kernel runs the ENTIRE iteration loop for a tile of points inside one
`pallas_call`: the per-point window stack lives in VMEM, each iteration's
dynamic sub-window read is a mask-select + axis reduction on the VPU (exact:
one selected element per output, so the sums add a single value to zeros —
bit-identical to the XLA path's HIGHEST-precision one-hot matmuls), and the
Gauss-Newton update, convergence freeze, window-exit and bounds bookkeeping
reproduce `_track_level`'s carry semantics exactly (tests force both paths
and assert equality; the Pallas interpreter covers CPU).

Layout: points are tiled along the grid (TILE points per program); the
(P, P) windows ride as (TILE, P, P) VMEM blocks (P = 32: win 11 + bilinear
apron + 2x10 px travel margin -> 512 KB per tile, comfortably in VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 64


def _iterate_kernel(win_ref, tmpl_ref, gx_ref, gy_ref, coef_ref, pts_ref,
                    flags_ref, corner_ref, pts_out, state_out, *,
                    S: int, P: int, max_iters: int, eps: float,
                    W: int, H: int):
    """One tile of points: run the full GN iteration loop.

    coef_ref: (TILE, 4) = [gxx, gxy, gyy, det_safe]
    flags_ref: (TILE, 2) = [solvable, frozen0] (as float 0/1)
    corner_ref: (TILE, 2) = window corner (cx, cy) as float
    state_out: (TILE, 2) = [frozen, left_win] (as float 0/1)
    """
    # Mosaic layout note: every per-point quantity is kept 2-D (TILE, 1) —
    # 1-D vectors in the loop carry trip VectorLayout inference (observed
    # `layout.h Check failed: arr.size() >= layout_rank` SIGABRT).
    win = win_ref[:]            # (TILE, P, P)
    tmpl = tmpl_ref[:]          # (TILE, S-1, S-1)
    gx = gx_ref[:]
    gy = gy_ref[:]
    gxx = coef_ref[:, 0:1]
    gxy = coef_ref[:, 1:2]
    gyy = coef_ref[:, 2:3]
    det_safe = coef_ref[:, 3:4]
    solvable = flags_ref[:, 0:1] > 0.5
    frozen0 = flags_ref[:, 1:2] > 0.5
    cx = corner_ref[:, 0:1]
    cy = corner_ref[:, 1:2]
    half = (S - 2) / 2.0        # (win_size - 1) / 2 with win_size = S - 1

    u_iota = lax.broadcasted_iota(jnp.int32, (_TILE, P), 1)   # window rows
    eps2 = jnp.float32(eps * eps)

    def body(_, carry):
        # frozen/left_win ride the scf.for carry as f32 0/1 masks — i1
        # vectors in the loop carry fail Mosaic's scf.for legalization
        px, py, frozen_f, left_f = carry           # all (TILE, 1) f32
        frozen = frozen_f > 0.5
        left_win = left_f > 0.5
        # window-relative top-left of the sampled patch
        tlx = px - half
        tly = py - half
        g_ok = ((tlx >= 0.0) & (tly >= 0.0)
                & (tlx + (S - 1) < W) & (tly + (S - 1) < H))
        locx = tlx - cx
        locy = tly - cy
        in_win = ((locx >= 0.0) & (locy >= 0.0)
                  & (locx + S <= P) & (locy + S <= P))
        bx0 = jnp.floor(locx)
        by0 = jnp.floor(locy)
        fx = (locx - bx0)[:, :, None]              # (TILE, 1, 1)
        fy = (locy - by0)[:, :, None]
        x0 = jnp.clip(bx0.astype(jnp.int32), 0, P - S)   # (TILE, 1)
        y0 = jnp.clip(by0.astype(jnp.int32), 0, P - S)

        # raw[n, s, q] = win[n, y0[n] + s, x0[n] + q] via mask-select +
        # reduce (exactly one selected element per output -> exact
        # arithmetic). Row-at-a-time keeps peak VMEM at ONE (TILE, P, P)
        # product so the whole point batch fits a single grid step.
        colsel = []
        for q in range(S):
            colsel.append((u_iota == x0 + q).astype(win.dtype))  # (TILE, P)
        rawrows = []
        for s in range(S):
            sel = (u_iota == y0 + s).astype(win.dtype)           # (TILE, P)
            row_s = jnp.sum(win * sel[:, :, None], axis=1)       # (TILE, P)
            rawrows.append(jnp.stack(
                [jnp.sum(row_s * c, axis=1) for c in colsel], axis=1))
        raw = jnp.stack(rawrows, axis=1)                         # (TILE, S, S)

        cur = ((1 - fy) * (1 - fx) * raw[:, :-1, :-1]
               + (1 - fy) * fx * raw[:, :-1, 1:]
               + fy * (1 - fx) * raw[:, 1:, :-1]
               + fy * fx * raw[:, 1:, 1:])                       # (TILE, S-1, S-1)

        diff = cur - tmpl
        bx = jnp.sum(diff * gx, axis=2).sum(axis=1, keepdims=True)
        by = jnp.sum(diff * gy, axis=2).sum(axis=1, keepdims=True)
        dx = (gyy * bx - gxy * by) / det_safe      # (TILE, 1)
        dy = (gxx * by - gxy * bx) / det_safe

        inb = g_ok & in_win
        step_ok = solvable & inb & ~frozen
        px_new = jnp.where(step_ok, px - dx, px)
        py_new = jnp.where(step_ok, py - dy, py)
        converged = dx * dx + dy * dy < eps2
        left_win = left_win | (~in_win & ~frozen)
        frozen = frozen | (converged & step_ok) | ~(solvable & inb)
        return (px_new, py_new, frozen.astype(jnp.float32),
                left_win.astype(jnp.float32))

    px0 = pts_ref[:, 0:1]
    py0 = pts_ref[:, 1:2]

    def w_cond(carry):
        it = carry[0]
        frozen_f = carry[3]
        return (it < max_iters) & (jnp.min(frozen_f) < 0.5)

    def w_body(carry):
        it = carry[0]
        out = body(it, carry[1:])
        return (it + 1,) + out

    _, px, py, frozen_f, left_f = lax.while_loop(
        w_cond, w_body,
        (jnp.asarray(0, jnp.int32), px0, py0, frozen0.astype(jnp.float32),
         jnp.zeros((_TILE, 1), jnp.float32)))
    pts_out[:, 0:1] = px
    pts_out[:, 1:2] = py
    state_out[:, 0:1] = frozen_f
    state_out[:, 1:2] = left_f


@functools.partial(jax.jit, static_argnames=("S", "P", "max_iters", "eps",
                                             "W", "H", "interpret"))
def lk_iterate_window(win, tmpl, gx, gy, gxx, gxy, gyy, det_safe, solvable,
                      guesses, frozen0, corner, *, S: int, P: int,
                      max_iters: int, eps: float, W: int, H: int,
                      interpret: bool = False):
    """Run the windowed LK iteration loop for N points in one fused kernel.

    Args match `_track_level`'s loop state: `guesses` (N, 2) float patch
    centers in (padded-)image coordinates, `corner` (N, 2) float window
    top-left, `win` (N, P, P) pre-gathered windows, `tmpl`/`gx`/`gy`
    (N, S-1, S-1) template and gradient patches, per-point normal-equation
    coefficients, `frozen0` the initial freeze mask (dead slots).

    Returns (pts (N, 2), frozen (N,), left_win (N,)).
    """
    N = win.shape[0]
    pad = (-N) % _TILE
    if pad:
        win = jnp.pad(win, ((0, pad), (0, 0), (0, 0)))
        tmpl = jnp.pad(tmpl, ((0, pad), (0, 0), (0, 0)))
        gx = jnp.pad(gx, ((0, pad), (0, 0), (0, 0)))
        gy = jnp.pad(gy, ((0, pad), (0, 0), (0, 0)))
        gxx = jnp.pad(gxx, (0, pad))
        gxy = jnp.pad(gxy, (0, pad))
        gyy = jnp.pad(gyy, (0, pad))
        det_safe = jnp.pad(det_safe, (0, pad), constant_values=1.0)
        solvable = jnp.pad(solvable, (0, pad))
        guesses = jnp.pad(guesses, ((0, pad), (0, 0)))
        frozen0 = jnp.pad(frozen0, (0, pad), constant_values=True)
        corner = jnp.pad(corner, ((0, pad), (0, 0)))
    Np = N + pad
    coef = jnp.stack([gxx, gxy, gyy, det_safe], axis=1).astype(jnp.float32)
    flags = jnp.stack([solvable.astype(jnp.float32),
                       frozen0.astype(jnp.float32)], axis=1)

    grid = (Np // _TILE,)

    def ix3(i):
        return (i, 0, 0)

    def ix2(i):
        return (i, 0)

    kernel = functools.partial(_iterate_kernel, S=S, P=P,
                               max_iters=max_iters, eps=eps, W=W, H=H)
    pts, state = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, P, P), ix3, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, S - 1, S - 1), ix3, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, S - 1, S - 1), ix3, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, S - 1, S - 1), ix3, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 4), ix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 2), ix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 2), ix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 2), ix2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TILE, 2), ix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 2), ix2, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Np, 2), jnp.float32),
            jax.ShapeDtypeStruct((Np, 2), jnp.float32),
        ),
        interpret=interpret,
    )(win.astype(jnp.float32), tmpl.astype(jnp.float32),
      gx.astype(jnp.float32), gy.astype(jnp.float32), coef,
      guesses.astype(jnp.float32), flags, corner.astype(jnp.float32))
    return (pts[:N], state[:N, 0] > 0.5, state[:N, 1] > 0.5)
