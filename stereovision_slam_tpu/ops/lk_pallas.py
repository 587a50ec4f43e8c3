"""Pallas TPU kernel: the windowed Lucas-Kanade iteration loop, fused.

The XLA windowed path (ops/lk.py `_track_level`) runs the Gauss-Newton
iteration as a `lax.while_loop` whose body issues ~20 small ops (one-hot
selects, two batched matmuls, bilinear combine, reductions, the 2x2 solve);
on the TPU runtime each fine pyramid level costs ~0.1 ms PER ITERATION in
sequential small-op latency even though the arithmetic is a few MFLOP.
This kernel runs the ENTIRE iteration loop for a tile of points inside one
`pallas_call`: the per-point window stack lives in VMEM, each iteration's
dynamic sub-window read is a mask-select + axis reduction on the VPU (exact:
one selected element per output, so the sums add a single value to zeros),
and the Gauss-Newton update, convergence freeze, window-exit and bounds
bookkeeping reproduce `_track_level`'s carry semantics (tests force both
paths and assert status equality + position agreement; the Pallas
interpreter covers CPU).

Layout notes (hard-won against Mosaic):
  * every per-point scalar is a (TILE, 1) 2-D tensor -- 1-D vectors in the
    loop carry trip VectorLayout inference (SIGABRT in layout.h);
  * boolean masks ride the scf.for/while carry as f32 0/1 -- i1 vectors in
    the carry fail scf legalization;
  * NO (TILE, S, S) patch tensors are materialized: Mosaic lane-pads the
    last dimension to 128, so a (N, 12, 12) tensor costs ~10x its logical
    bytes and six of them blew the 16 MB VMEM budget at useful tile sizes.
    The template/gradient patches are stored FLAT (TILE, 121) (lanes pad
    121 -> 128, ~6% waste) and the iteration streams the sampled window
    ROW BY ROW, accumulating the two normal-equation dot products with
    only (TILE, P)/(TILE, S) 2-D intermediates. This fits TILE = 128
    points per grid step -- half the sequential grid steps of the naive
    3-D formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128


def _iterate_kernel(win_ref, tmpl_ref, gx_ref, gy_ref, coef_ref, pts_ref,
                    flags_ref, corner_ref, pts_out, state_out, *,
                    S: int, P: int, max_iters: int, eps: float,
                    W: int, H: int):
    """One tile of points: run the full GN iteration loop.

    tmpl_ref/gx_ref/gy_ref: (TILE, (S-1)*(S-1)) FLAT patches, row-major.
    coef_ref: (TILE, 4) = [gxx, gxy, gyy, det_safe]
    flags_ref: (TILE, 2) = [solvable, frozen0] (as float 0/1)
    corner_ref: (TILE, 2) = window corner (cx, cy) as float
    state_out: (TILE, 2) = [frozen, left_win] (as float 0/1)
    """
    win = win_ref[:]            # (TILE, P, P)
    tmpl = tmpl_ref[:]          # (TILE, R*R) flat
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
    R = S - 1                   # patch side (11)

    u_iota = lax.broadcasted_iota(jnp.int32, (_TILE, P), 1)   # window rows
    s_iota = lax.broadcasted_iota(jnp.int32, (_TILE, S, P), 1)
    v_iota = lax.broadcasted_iota(jnp.int32, (_TILE, S, P), 2)
    eps2 = jnp.float32(eps * eps)

    def body(_, carry):
        px, py, frozen_f, left_f = carry           # all (TILE, 1) f32
        frozen = frozen_f > 0.5
        left_win = left_f > 0.5
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
        fx = locx - bx0                            # (TILE, 1)
        fy = locy - by0
        x0 = jnp.clip(bx0.astype(jnp.int32), 0, P - S)   # (TILE, 1)
        y0 = jnp.clip(by0.astype(jnp.int32), 0, P - S)

        # column-select mask, shared by every row: csel[n, q, v] = 1 iff
        # v == x0[n] + q  (TILE, S, P)
        csel = (v_iota == (x0[:, :, None] + s_iota)).astype(win.dtype)

        w00 = (1 - fy) * (1 - fx)                  # (TILE, 1)
        w01 = (1 - fy) * fx
        w10 = fy * (1 - fx)
        w11 = fy * fx

        bx = jnp.zeros_like(px)
        by = jnp.zeros_like(px)
        prev_raw = None
        # stream the S sampled window rows; patch row i combines raw rows
        # i and i+1 with the same 4-term order as imops._bilinear_combine
        for s in range(S):
            rsel = (u_iota == y0 + s).astype(win.dtype)      # (TILE, P)
            row_s = jnp.sum(win * rsel[:, :, None], axis=1)  # (TILE, P)
            raw_s = jnp.sum(row_s[:, None, :] * csel, axis=2)  # (TILE, S)
            if prev_raw is not None:
                i = s - 1
                cur_i = (w00 * prev_raw[:, :R] + w01 * prev_raw[:, 1:]
                         + w10 * raw_s[:, :R] + w11 * raw_s[:, 1:])
                diff = cur_i - tmpl[:, i * R:(i + 1) * R]    # (TILE, R)
                bx = bx + jnp.sum(diff * gx[:, i * R:(i + 1) * R], axis=1,
                                  keepdims=True)
                by = by + jnp.sum(diff * gy[:, i * R:(i + 1) * R], axis=1,
                                  keepdims=True)
            prev_raw = raw_s

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

    NOTE on numerics: positions agree with the XLA while_loop to float
    rounding (the row-streamed bilinear/accumulation orders differ from
    the 3-D reduction), statuses are checked for equality under test.
    """
    N = win.shape[0]
    R = S - 1
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
            pl.BlockSpec((_TILE, R * R), ix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, R * R), ix2, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, R * R), ix2, memory_space=pltpu.VMEM),
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
    )(win.astype(jnp.float32),
      tmpl.reshape(Np, R * R).astype(jnp.float32),
      gx.reshape(Np, R * R).astype(jnp.float32),
      gy.reshape(Np, R * R).astype(jnp.float32), coef,
      guesses.astype(jnp.float32), flags, corner.astype(jnp.float32))
    return (pts[:N], state[:N, 0] > 0.5, state[:N, 1] > 0.5)
