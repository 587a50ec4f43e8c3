"""Pallas TPU kernel: pyramidal LK with POINTS IN THE LANE DIMENSION.

TPU-native rework of the LK hot loop (reference: the two
cv::calcOpticalFlowPyrLK calls, /root/reference/src/frontend.cpp:105-109 and
:353-357). The XLA windowed path (ops/lk.py `_track_level`) and the first
Pallas kernel (ops/lk_pallas.py) both lay points along the SUBLANE axis and
patch pixels along the lanes, so every per-iteration operand is lane-padded:
an (N, 12, 12) patch tensor tiles as (N, 16, 128) — ~10x its logical bytes —
and under `vmap` (multi-stream serving) the waste multiplies by the batch.

This kernel transposes the world: the point index lives in the LANE axis and
patch pixels live in sublanes, so every operand is lane-DENSE at any point
count that is a multiple of 128, and batched streams simply fold into more
lanes (round-4 VERDICT's "B-fold leverage"):

  * per-point windows ride as (Py, Px, n) — tile (Px, n) is dense;
  * every per-point scalar is a (1, n) row;
  * the per-iteration integer window select is Ky+Kx masked multiply-adds
    over (Px, n)/(S, n) operands (pure lane-dense VPU work — a per-lane
    gather does not exist on the VPU, but a K-term select is cheap when
    every term is a dense row block);
  * the whole Gauss-Newton loop runs INSIDE one kernel per pyramid level —
    one XLA op instead of ~25 small ops per iteration (the sequential-
    dispatch floor of ~1.3 us/op made the XLA loop latency-bound);
  * TEMPLATE patches, their Scharr gradients, and the normal-equation
    coefficients are ALSO computed in-kernel from a small (16, 16, n)
    template window: the XLA prep this replaces (`sample_patches_multi`
    over 3 channels + whole-image Scharr per level) measured ~0.1 ms/level
    — ~25x the cost of the two rectangular window gathers that remain.

Numerics: the bilinear combine uses the same 4-term order as
`imops._bilinear_combine`; reductions accumulate per patch row, so positions
agree with the XLA path to float rounding and statuses are asserted equal
under test (tests/test_lk_lanes.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TW = 16              # template-window side: 12 sample ints + Scharr halo
                      # of 1 each side (14 used), rounded to 8
# Lanes per grid step are sized to a VMEM budget rather than fixed: grid
# steps run SEQUENTIALLY, and at 256 lanes the per-iteration (S, n) row ops
# are issue-bound (measured round 5: the vmapped per-lane kernel cost B x
# single-lane time — no batching win at all). Wider chunks amortize the
# fixed per-op issue cost over more lanes. The budget is on the (Py, Px, ch)
# current-image window BLOCK; peak scoped VMEM is ~3.5x that (input pipeline
# double-buffering, the in-kernel `big` value, bilinear row temporaries,
# template/gradient patches) — a 6 MB block budget measured 16.17M scoped
# (just over the 16M limit), 3.5 MB leaves headroom.
_BLOCK_BUDGET = 3_500_000
_CHUNK_MAX = 1024


def _chunk_for(Py: int, Px: int) -> int:
    ch = (_BLOCK_BUDGET // (Py * Px * 4)) // 128 * 128
    return int(max(256, min(_CHUNK_MAX, ch)))


def _sample_template(X, tfx, tfy, win: int):
    """Bilinear template patch + Scharr gradient patches from the (16,16,C)
    template window, all lane-major.

    X: (16, 16, C) raw window gathered at corner floor(tl) - 1, so the
    integer sample start is the CONSTANT offset 1 and the Scharr halo is
    in-window. The corner is NOT clipped at the right/bottom image edge:
    the one-hot gather zero-fills the overhang, which reproduces the
    whole-image filter's zero padding exactly (ops/image._sep_filter pads
    with zeros), so border gradients match the XLA path. tf*: (1, C)
    bilinear fractions.

    Matches the XLA path to float rounding: template = bilinear(prev),
    gradients = bilinear(Scharr(prev)) sampled at the same integer grid
    (ops/lk.py samples the ix/iy images with the same selectors), with the
    filter-tap association of imops._sep_filter and the 4-term order of
    imops._bilinear_combine. Returns (tmpl, gx, gy) each (win, win, C).
    """
    S = win + 1                   # raw sample span (12): ints 1 + [0, S)
    c0 = jnp.float32(3.0 / 32.0)
    c1 = jnp.float32(10.0 / 32.0)
    # Scharr, same separable association as imops._sep_filter: the value at
    # window cell (r, c) lands at index (r-1, c-1) of the 14x14 grids
    d = X[:, 2:] - X[:, :-2]                                   # (16, 14, C)
    ix = d[:-2] * c0 + d[1:-1] * c1 + d[2:] * c0               # (14, 14, C)
    s = X[:, :-2] * c0 + X[:, 1:-1] * c1 + X[:, 2:] * c0       # (16, 14, C)
    iy = s[2:] - s[:-2]                                        # (14, 14, C)

    w00 = (1 - tfy) * (1 - tfx)
    w01 = (1 - tfy) * tfx
    w10 = tfy * (1 - tfx)
    w11 = tfy * tfx

    def bil(raw):
        # raw: (S, S, C) integer samples -> (win, win, C), the 4-term order
        # of imops._bilinear_combine
        return (w00 * raw[:-1, :-1] + w01 * raw[:-1, 1:]
                + w10 * raw[1:, :-1] + w11 * raw[1:, 1:])

    tmpl = bil(X[1:1 + S, 1:1 + S])
    gx = bil(ix[0:S, 0:S])          # gradient grids absorb the halo offset
    gy = bil(iy[0:S, 0:S])
    return tmpl, gx, gy


def _level_kernel(big_ref, prev_ref, meta_ref, out_ref, *,
                  S: int, Py: int, Px: int, win: int, max_iters: int,
                  eps: float, min_eig_threshold: float, W: int, H: int):
    """One lane-chunk of points: template prep + the full GN loop.

    big_ref: (Py, Px, C) per-point cur-image windows, point index in lanes.
    prev_ref: (16, 16, C) per-point template windows (prev image).
    meta_ref: (16, C) rows [x, y, cx, cy, frozen0, tfx, tfy].
    out_ref: (8, C) rows [x, y, frozen, left_win, solvable, -, -, -].
    """
    C = big_ref.shape[-1]
    big = big_ref[:]
    px0 = meta_ref[0:1, :]
    py0 = meta_ref[1:2, :]
    cxv = meta_ref[2:3, :]
    cyv = meta_ref[3:4, :]
    frozen0 = meta_ref[4:5, :]
    tfx = meta_ref[5:6, :]
    tfy = meta_ref[6:7, :]
    half = (win - 1) / 2.0
    R = win
    Ky = Py - S + 1
    Kx = Px - S + 1
    eps2 = jnp.float32(eps * eps)

    tmpl3, gx3, gy3 = _sample_template(prev_ref[:], tfx, tfy,
                                       win)                   # (R, R, C)

    # one-time normal-equation coefficients
    gxx = jnp.sum(gx3 * gx3, axis=(0, 1), keepdims=True)[0]   # (1, C)
    gxy = jnp.sum(gx3 * gy3, axis=(0, 1), keepdims=True)[0]
    gyy = jnp.sum(gy3 * gy3, axis=(0, 1), keepdims=True)[0]
    det = gxx * gyy - gxy * gxy
    tr_half = 0.5 * (gxx + gyy)
    min_eig = (tr_half - jnp.sqrt(jnp.maximum(tr_half * tr_half - det, 0.0)))
    min_eig = min_eig / (win * win)
    solvable = (min_eig > min_eig_threshold) & (det > 1e-12)
    det_safe = jnp.where(det > 1e-12, det, 1.0)

    def body(carry):
        it, px, py, fz, lw = carry                       # (1, C) f32
        frozen = fz > 0.5
        tlx = px - half
        tly = py - half
        g_ok = ((tlx >= 0.0) & (tly >= 0.0)
                & (tlx + win < W) & (tly + win < H))
        locx = tlx - cxv
        locy = tly - cyv
        in_win = ((locx >= 0.0) & (locy >= 0.0)
                  & (locx + S <= Px) & (locy + S <= Py))
        bx0 = jnp.floor(locx)
        by0 = jnp.floor(locy)
        fx = locx - bx0
        fy = locy - by0
        x0 = jnp.clip(bx0.astype(jnp.int32), 0, Px - S)  # (1, C)
        y0 = jnp.clip(by0.astype(jnp.int32), 0, Py - S)

        w00 = (1 - fy) * (1 - fx)
        w01 = (1 - fy) * fx
        w10 = fy * (1 - fx)
        w11 = fy * fx

        my = [(y0 == k).astype(jnp.float32) for k in range(Ky)]   # (1, C)
        mx = [(x0 == m).astype(jnp.float32) for m in range(Kx)]

        bxv = jnp.zeros_like(px)
        byv = jnp.zeros_like(px)
        prev_row = None
        # stream the S sampled window rows; patch row i combines window
        # rows i and i+1 in imops._bilinear_combine's 4-term order
        for i in range(S):
            raw_i = my[0] * big[i]                       # (Px, C)
            for k in range(1, Ky):
                raw_i = raw_i + my[k] * big[k + i]
            rawc_i = mx[0] * raw_i[0:S]                  # (S, C)
            for m in range(1, Kx):
                rawc_i = rawc_i + mx[m] * raw_i[m:m + S]
            if prev_row is not None:
                io = i - 1
                cur_i = (w00 * prev_row[:R] + w01 * prev_row[1:S]
                         + w10 * rawc_i[:R] + w11 * rawc_i[1:S])  # (R, C)
                diff = cur_i - tmpl3[io]
                bxv = bxv + jnp.sum(diff * gx3[io], axis=0, keepdims=True)
                byv = byv + jnp.sum(diff * gy3[io], axis=0, keepdims=True)
            prev_row = rawc_i

        dx = (gyy * bxv - gxy * byv) / det_safe
        dy = (gxx * byv - gxy * bxv) / det_safe

        inb = g_ok & in_win
        step_ok = solvable & inb & ~frozen
        px_new = jnp.where(step_ok, px - dx, px)
        py_new = jnp.where(step_ok, py - dy, py)
        converged = dx * dx + dy * dy < eps2
        lw_new = jnp.maximum(lw, ((~in_win) & (~frozen)).astype(jnp.float32))
        fz_new = jnp.maximum(
            fz, ((converged & step_ok) | ~(solvable & inb))
            .astype(jnp.float32))
        return it + 1, px_new, py_new, fz_new, lw_new

    def cond(carry):
        it, _, _, fz, _ = carry
        return (it < max_iters) & (jnp.min(fz) < 0.5)

    _, px, py, fz, lw = lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), px0, py0, frozen0,
         jnp.zeros((1, C), jnp.float32)))
    out_ref[0:1, :] = px
    out_ref[1:2, :] = py
    out_ref[2:3, :] = fz
    out_ref[3:4, :] = lw
    out_ref[4:5, :] = solvable.astype(jnp.float32)
    out_ref[5:8, :] = jnp.zeros((3, C), jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "S", "Py", "Px", "win", "max_iters", "eps", "min_eig_threshold",
    "W", "H", "interpret"))
def lk_level_lanes(bigT, prevT, meta, *, S: int, Py: int, Px: int,
                   win: int, max_iters: int, eps: float,
                   min_eig_threshold: float, W: int, H: int,
                   interpret: bool = False):
    """Run one level's template prep + LK iteration loop for n lane-major
    points.

    Args:
      bigT: (Py, Px, n) per-point cur-image windows (integer corners).
      prevT: (16, 16, n) per-point template windows (prev image).
      meta: (16, n) rows [x, y, cx, cy, frozen0, tfx, tfy, basex, basey].

    n must be a multiple of 128. Returns the (8, n) state block
    [x, y, frozen, left_win, solvable, ...].
    """
    n = bigT.shape[-1]
    ch = min(_chunk_for(Py, Px), n)
    assert n % ch == 0, (n, ch)
    grid = (n // ch,)

    kernel = functools.partial(
        _level_kernel, S=S, Py=Py, Px=Px, win=win, max_iters=max_iters,
        eps=eps, min_eig_threshold=min_eig_threshold, W=W, H=H)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Py, Px, ch), lambda c: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TW, _TW, ch), lambda c: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, ch), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, ch), lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        interpret=interpret,
    )(bigT.astype(jnp.float32), prevT.astype(jnp.float32),
      meta.astype(jnp.float32))


# --------------------------------------------------------------------------
# Per-level prep (XLA) + multi-level driver
# --------------------------------------------------------------------------

# Per-level x-margins (pixels each side a point may travel within one level).
# Coarse levels carry the large motions (a 100 px stereo disparity is 12.5 px
# at level 3), so margins grow with depth; at level-0 scale these cover
# [20, 28, 72, 208] px of per-level correction. A point that travels past its
# margin freezes with status False — at these margins that is a failed track
# by any measure (ops/lk.py `_track_level` windowing note).
_MARGINS_X = (10, 14, 18, 26)
_MARGINS_Y = (10, 10, 12, 14)


def _round_up(v, m):
    return -(-v // m) * m


def level_window_shape(level: int, Hp: int, Wp: int, win: int):
    """(Py, Px) window shape for a pyramid level with padded image (Hp, Wp)."""
    S = win + 1
    mx = _MARGINS_X[min(level, len(_MARGINS_X) - 1)]
    my = _MARGINS_Y[min(level, len(_MARGINS_Y) - 1)]
    Py = min(_round_up(S + 2 * my, 8), (Hp // 8) * 8)
    Px = min(_round_up(S + 2 * mx, 8), (Wp // 8) * 8)
    Py = max(Py, _round_up(S, 8))
    Px = max(Px, _round_up(S, 8))
    return Py, Px


def gather_windows_rect_T(img, y0, x0, Py: int, Px: int):
    """(Py, Px, N) integer-corner windows via one-hot MXU matmuls,
    transposed so the point index lands in the lane dimension."""
    H, W = img.shape
    N = y0.shape[0]
    hh = lax.broadcasted_iota(jnp.int32, (N, Py, H), 2)
    rr = lax.broadcasted_iota(jnp.int32, (N, Py, H), 1)
    rsel = (hh == y0[:, None, None] + rr).astype(img.dtype)
    rows = jnp.einsum("nsh,hw->nsw", rsel, img,
                      precision=lax.Precision.HIGHEST)
    ww = lax.broadcasted_iota(jnp.int32, (N, W, Px), 1)
    cc = lax.broadcasted_iota(jnp.int32, (N, W, Px), 2)
    csel = (ww == x0[:, None, None] + cc).astype(img.dtype)
    return jnp.einsum("nsw,nwq->sqn", rows, csel,
                      precision=lax.Precision.HIGHEST)


def _prep_level(prev_img, cur_img, prev_pts, guesses, win: int,
                Py: int, Px: int):
    """Window gathers + meta rows for one level; vmap-able over a leading
    group axis. Returns (bigT (Py,Px,N), prevT (16,16,N), meta (16,N),
    tmpl_ok (N,))."""
    H, W = prev_img.shape
    S = win + 1
    half = (win - 1) / 2.0
    N = prev_pts.shape[0]

    # template window: integer corner one left/up of the sample start so the
    # Scharr halo is in-window and the in-window sample start is the
    # CONSTANT 1. No right/bottom clip: the one-hot gather zero-fills the
    # overhang, which reproduces _sep_filter's zero padding at the image
    # edge exactly (see _sample_template). The lower clip never engages for
    # live points (their padded coords are >= the pyramid pad of 7).
    tl = prev_pts - half
    tbase = jnp.floor(tl)
    tfrac = tl - tbase
    tw_x = jnp.maximum(tbase[:, 0].astype(jnp.int32) - 1, 0)
    tw_y = jnp.maximum(tbase[:, 1].astype(jnp.int32) - 1, 0)
    tmpl_ok = ((tl[:, 0] >= 0.0) & (tl[:, 1] >= 0.0)
               & (tl[:, 0] + win < W) & (tl[:, 1] + win < H))
    prevT = gather_windows_rect_T(prev_img, tw_y, tw_x, _TW, _TW)

    # current-image search window around the initial guess
    corner_x = (jnp.floor(guesses[:, 0] - half).astype(jnp.int32)
                - (Px - S) // 2)
    corner_y = (jnp.floor(guesses[:, 1] - half).astype(jnp.int32)
                - (Py - S) // 2)
    cx = jnp.clip(corner_x, 0, max(W - Px, 0))
    cy = jnp.clip(corner_y, 0, max(H - Py, 0))
    bigT = gather_windows_rect_T(cur_img, cy, cx, Py, Px)

    f32 = jnp.float32
    zero = jnp.zeros((N,), f32)
    meta = jnp.stack([
        guesses[:, 0].astype(f32), guesses[:, 1].astype(f32),
        cx.astype(f32), cy.astype(f32),
        zero,                                       # frozen0 filled by caller
        tfrac[:, 0].astype(f32), tfrac[:, 1].astype(f32),
        zero, zero, zero, zero, zero, zero, zero, zero, zero],
        axis=0)                                     # (16, N)
    return bigT, prevT, meta, tmpl_ok


def track_grouped_lanes(tmpl_pyramids, tgt_pyramids, pts, initial_pts, masks,
                        *, win_size: int = 11, max_iters: int = 30,
                        eps: float = 0.01, min_eig_threshold: float = 1e-4,
                        interpret: bool = False):
    """Track G independent point groups (each with its own image pair)
    through the pyramid, the per-level prep + iteration loop as ONE
    lane-major Pallas kernel over all G*N points.

    Args:
      tmpl_pyramids / tgt_pyramids: lists (level 0 finest) of (G, H, W)
        stacked images.
      pts / initial_pts: (G, N, 2); masks: (G, N) bool active slots.

    Returns (cur_pts (G, N, 2), status (G, N)) with `ops.lk.track`
    status semantics (conditioning gated at the finest level only).
    """
    num_levels = len(tmpl_pyramids)
    G, N, _ = pts.shape
    n = G * N
    scale_top = 0.5 ** (num_levels - 1)
    guesses = initial_pts * scale_top                      # (G, N, 2)
    pad = win_size // 2 + 2
    off = jnp.asarray([pad, pad], dtype=guesses.dtype)
    frozen0 = (~masks).astype(jnp.float32).reshape(1, n)
    status_fine = None

    for level in range(num_levels - 1, -1, -1):
        s = 0.5 ** level
        pts_l = pts * s + off
        prev_p = jnp.pad(tmpl_pyramids[level], ((0, 0), (pad, pad),
                                                (pad, pad)), mode="edge")
        cur_p = jnp.pad(tgt_pyramids[level], ((0, 0), (pad, pad),
                                              (pad, pad)), mode="edge")
        Hp, Wp = prev_p.shape[1:]
        Py, Px = level_window_shape(level, Hp, Wp, win_size)
        # pad the lane count to the level's chunk size (one chunk when it
        # fits, whole chunks otherwise — see _chunk_for)
        ch = _chunk_for(Py, Px)
        npad256 = _round_up(n, 256)
        n_pad = npad256 if npad256 <= ch else _round_up(n, ch)
        g_in = guesses + off
        bigT, prevT, meta, tmpl_ok = jax.vmap(
            _prep_level, in_axes=(0, 0, 0, 0, None, None, None))(
                prev_p, cur_p, pts_l, g_in, win_size, Py, Px)
        # fold the group axis into the lane dimension
        bigT = jnp.moveaxis(bigT, 0, -2).reshape(Py, Px, n)
        prevT = jnp.moveaxis(prevT, 0, -2).reshape(_TW, _TW, n)
        # (G, 16, N) -> (16, G, N) -> (16, G*N): group-major lane order,
        # matching the bigT/prevT fold above
        meta = jnp.moveaxis(meta, 0, 1).reshape(16, n)
        meta = meta.at[4:5, :].set(frozen0)
        if n_pad != n:
            bigT = jnp.pad(bigT, ((0, 0), (0, 0), (0, n_pad - n)))
            prevT = jnp.pad(prevT, ((0, 0), (0, 0), (0, n_pad - n)))
            mpad = jnp.zeros((16, n_pad - n), jnp.float32)
            mpad = mpad.at[4].set(1.0)  # padded lanes start frozen
            meta = jnp.concatenate([meta, mpad], axis=1)
        out = lk_level_lanes(
            bigT, prevT, meta, S=win_size + 1, Py=Py, Px=Px,
            win=win_size, max_iters=max_iters, eps=eps,
            min_eig_threshold=min_eig_threshold, W=Wp, H=Hp,
            interpret=interpret)[:, :n]
        new_pts = jnp.stack([out[0], out[1]], axis=-1)     # (n, 2)
        guesses = new_pts.reshape(G, N, 2) - off
        if level == 0:
            # final status: template in bounds, solvable, window respected,
            # final point in (padded-)image bounds (ops/lk.py:187-188)
            half = (win_size - 1) / 2.0
            tlx = out[0] - half
            tly = out[1] - half
            final_inb = ((tlx >= 0.0) & (tly >= 0.0)
                         & (tlx + win_size < Wp) & (tly + win_size < Hp))
            ok = (tmpl_ok.reshape(n) & (out[4] > 0.5) & final_inb
                  & ~(out[3] > 0.5))
            status_fine = ok.reshape(G, N)
        else:
            guesses = guesses * 2.0

    H0, W0 = tgt_pyramids[0].shape[1:]
    inb = ((guesses[..., 0] >= 0.0) & (guesses[..., 0] < W0)
           & (guesses[..., 1] >= 0.0) & (guesses[..., 1] < H0))
    return guesses, status_fine & inb
