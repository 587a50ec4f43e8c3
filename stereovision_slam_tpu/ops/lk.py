"""Batched pyramidal Lucas-Kanade sparse optical flow.

TPU-native equivalent of the reference's two `cv::calcOpticalFlowPyrLK` calls
(/root/reference/src/frontend.cpp:105-109 left->right, :353-357 last->current):
window 11x11, 4 pyramid levels (maxLevel=3), <=30 Gauss-Newton iterations with
eps 0.01, OPTFLOW_USE_INITIAL_FLOW semantics (the caller supplies the initial
guess, e.g. landmark reprojections).

Redesign, not a port: all N points advance together as one batched program —
per level the spatial-gradient images are two convs shared by every point, the
per-point work is (patch gather, 2x2 solve), vmapped. The iteration loop is a
`lax.fori_loop` with a convergence freeze mask instead of per-point early exit,
so the shape stays static and the whole tracker jits into one XLA program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from stereovision_slam_tpu.ops import image as imops

_PREC = jax.lax.Precision.HIGHEST


_WINDOW_MARGIN = 10  # px each side a point may travel within one level


def _track_level(prev_img, cur_img, prev_pts, guesses, win_size, max_iters, eps,
                 min_eig_threshold, mask=None, windowed=None,
                 pallas_mode=None):
    """One pyramid level of LK for all points. Returns (new_guesses, ok).

    On TPU the per-iteration current-image patch is sampled from a per-point
    (P, P) WINDOW gathered once per level (P = win+1 + 2*_WINDOW_MARGIN)
    instead of from the full image: inside the window the bilinear result is
    bit-identical (same pixels, same arithmetic) while the per-iteration
    one-hot shrinks from (N*S, H)x(H, W) full-image matmuls (~0.8 GFLOP) to
    (S, P)x(P, P) batched ones (~5 MFLOP). A point that travels further than
    the margin within one level freezes with status false — with
    coarse-to-fine guesses the per-level correction is a few pixels, and a
    point moving >10 px against its initialization at one level is a failed
    track by any measure (cv::calcOpticalFlowPyrLK would return it as a
    wrong-lock instead).

    `windowed` overrides the trace-time path choice (None = by backend +
    level size) so CPU tests can exercise the windowed kernel and assert
    parity against the dynamic-slice path.

    `pallas_mode` chooses how the windowed iteration loop runs: None = the
    fused Pallas kernel on TPU, the XLA while_loop elsewhere; "pallas" /
    "interpret" force the kernel (interpret = Pallas interpreter, for CPU
    parity tests); "xla" forces the while_loop."""
    H, W = prev_img.shape
    ix, iy = imops.scharr_gradients(prev_img)

    # template + gradient patches share their centers: one fused gather
    # pass for all three images (fixed for the level)
    (tmpl, gx, gy), tmpl_ok = imops.sample_patches_multi(
        jnp.stack([prev_img, ix, iy]), prev_pts, win_size)

    # FLAT (N, win*win) copies for every reduction below: (N, 11, 11)
    # tensors tile as T(8,128) with the trailing 11 lane-padded to 128, so
    # each per-iteration bx/by reduce read ~10x its logical bytes (~18 us
    # per op on the chip, ~0.85 ms/step across levels — round-4 trace);
    # flat layouts pad 121 -> 128 only (~6%)
    N_pts = prev_pts.shape[0]
    tmpl_f = tmpl.reshape(N_pts, -1)
    gx_f = gx.reshape(N_pts, -1)
    gy_f = gy.reshape(N_pts, -1)

    gxx = jnp.sum(gx_f * gx_f, axis=1)
    gxy = jnp.sum(gx_f * gy_f, axis=1)
    gyy = jnp.sum(gy_f * gy_f, axis=1)
    det = gxx * gyy - gxy * gxy
    tr_half = 0.5 * (gxx + gyy)
    min_eig = (tr_half - jnp.sqrt(jnp.maximum(tr_half * tr_half - det, 0.0)))
    min_eig = min_eig / (win_size * win_size)
    solvable = (min_eig > min_eig_threshold) & (det > 1e-12)
    det_safe = jnp.where(det > 1e-12, det, 1.0)

    # Window only the LARGE fine levels: at coarse levels the full-image
    # one-hot is already tiny, and — critically — coarse levels are where
    # the motion is still large (a 100 px stereo disparity is 12.5 px at
    # level 3: freezing there at the margin loses exactly the near-field
    # points whose disparity pins the forward translation; measured +40%
    # ATE on the benchmark scene when windowing all levels).
    half = (win_size - 1) / 2.0
    S = win_size + 1                       # raw patch incl. bilinear apron
    P = S + 2 * _WINDOW_MARGIN
    # guard min(H, W) >= P: a skinnier level than the window would make the
    # clipped corner request out-of-range rows/cols that the one-hot gather
    # silently zero-fills (corrupt patches) — fall back to full-image there
    if windowed is None:
        windowed = jax.default_backend() != "cpu" and H * W > 32768
    windowed = windowed and min(H, W) >= P
    if windowed:
        corner = jnp.floor(guesses - half).astype(jnp.int32) - _WINDOW_MARGIN
        cx = jnp.clip(corner[:, 0], 0, max(W - P, 0))
        cy = jnp.clip(corner[:, 1], 0, max(H - P, 0))
        big = imops._gather_patches_mxu(cur_img, cy, cx, P - 1)  # (N, P, P)
        sidx = lax.broadcasted_iota(jnp.int32, (1, S, P), 2)
        soff = lax.broadcasted_iota(jnp.int32, (1, S, P), 1)
        qidx = lax.broadcasted_iota(jnp.int32, (1, P, S), 1)
        qoff = lax.broadcasted_iota(jnp.int32, (1, P, S), 2)

    def sample_cur(pts):
        if not windowed:
            patches, inb = imops.sample_patches(cur_img, pts, win_size)
            return patches, inb, jnp.ones(pts.shape[0], jnp.bool_)
        tl = pts - half
        # original full-image validity (matches sample_patches' contract)
        g_ok = ((tl[:, 0] >= 0.0) & (tl[:, 1] >= 0.0)
                & (tl[:, 0] + win_size < W) & (tl[:, 1] + win_size < H))
        loc = tl - jnp.stack([cx, cy], axis=-1).astype(tl.dtype)
        in_win = ((loc[:, 0] >= 0.0) & (loc[:, 1] >= 0.0)
                  & (loc[:, 0] + S <= P) & (loc[:, 1] + S <= P))
        base = jnp.floor(loc)
        frac = loc - base
        x0 = jnp.clip(base[:, 0].astype(jnp.int32), 0, P - S)
        y0 = jnp.clip(base[:, 1].astype(jnp.int32), 0, P - S)
        rsel = (sidx == y0[:, None, None] + soff).astype(big.dtype)
        csel = (qidx == x0[:, None, None] + qoff).astype(big.dtype)
        rows = jnp.einsum("nsp,npq->nsq", rsel, big,
                          precision=lax.Precision.HIGHEST)
        raw = jnp.einsum("nsq,nqc->nsc", rows, csel,
                         precision=lax.Precision.HIGHEST)
        return imops._bilinear_combine(raw, frac), g_ok & in_win, in_win

    def body(carry):
        it, pts, frozen, left_win = carry
        cur, inb, in_win = sample_cur(pts)
        diff = cur.reshape(N_pts, -1) - tmpl_f
        bx = jnp.sum(diff * gx_f, axis=1)
        by = jnp.sum(diff * gy_f, axis=1)
        # solve G d = b with G = [[gxx, gxy], [gxy, gyy]]
        dx = (gyy * bx - gxy * by) / det_safe
        dy = (gxx * by - gxy * bx) / det_safe
        delta = jnp.stack([dx, dy], axis=-1)
        step_ok = solvable & inb & ~frozen
        new_pts = jnp.where(step_ok[:, None], pts - delta, pts)
        converged = jnp.sum(delta * delta, axis=-1) < eps * eps
        # a still-active point whose patch exits the per-level window is a
        # failed track: it freezes here AND its final status must be False
        # (the full-image bounds check below cannot see the window exit)
        left_win = left_win | (~in_win & ~frozen)
        return (it + 1, new_pts,
                frozen | (converged & step_ok) | ~(solvable & inb),
                left_win)

    # early exit once every point is frozen (converged / unsolvable / out of
    # bounds) — identical result to running all max_iters (frozen points
    # never move), but with reprojection initial guesses typical frames
    # converge in a handful of iterations, not 30. cv::calcOpticalFlowPyrLK
    # exits per-point on the same criteria (COUNT+EPS).
    frozen0 = (jnp.zeros(guesses.shape[0], jnp.bool_) if mask is None
               else ~mask)  # untracked slots start frozen -> fast exit
    if pallas_mode is None:
        # measured on the v5e tunnel (2026-08-21): the XLA while_loop with
        # convergence early-exit runs a 256-point 4-level track in ~2.6 ms
        # vs ~3.3 ms for the fused kernel — Mosaic lane-pads the (N, 12, 12)
        # patch tensors to (N, 16, 128) which caps the tile at 64 points,
        # and the resulting 4-step sequential grid forfeits the early-exit
        # advantage. The kernel stays available (pallas_mode="pallas") and
        # bit-identical (tests force both paths); flip the default if a
        # flat-layout rework lands.
        pallas_mode = "xla"
    if windowed and pallas_mode in ("pallas", "interpret"):
        # the entire iteration loop as ONE fused Pallas kernel — identical
        # carry semantics, no per-iteration op-dispatch latency
        from stereovision_slam_tpu.ops.lk_pallas import lk_iterate_window
        out_pts, _, left_win = lk_iterate_window(
            big, tmpl, gx, gy, gxx, gxy, gyy, det_safe, solvable,
            guesses, frozen0,
            jnp.stack([cx, cy], axis=-1).astype(guesses.dtype),
            S=S, P=P, max_iters=max_iters, eps=eps, W=W, H=H,
            interpret=(pallas_mode == "interpret"))
    else:
        out = lax.while_loop(
            lambda c: (c[0] < max_iters) & ~jnp.all(c[2]), body,
            (jnp.asarray(0, jnp.int32), guesses, frozen0,
             jnp.zeros(guesses.shape[0], jnp.bool_)))
        out_pts, left_win = out[1], out[3]
    _, final_inb = imops.sample_patches(cur_img, out_pts, win_size)
    ok = tmpl_ok & solvable & final_inb & ~left_win
    return out_pts, ok


def _lanes_levels_ok(pyramid, win_size: int) -> bool:
    """True when every pyramid level is large enough for the lane kernel's
    per-level windows: level_window_shape clamps Py/Px to >= round_up(S, 8),
    and a padded level SMALLER than that floor would make the one-hot window
    gather zero-fill out-of-range rows (corrupt patches) instead of
    erroring — the hazard the XLA windowed path guards with its full-image
    fallback (see `_track_level`)."""
    pad = win_size // 2 + 2
    s8 = -(-(win_size + 1) // 8) * 8
    for lv in pyramid:
        H, W = lv.shape[-2:]
        if (((H + 2 * pad) // 8) * 8 < s8
                or ((W + 2 * pad) // 8) * 8 < s8):
            return False
    return True


def track(prev_pyramid, cur_pyramid, prev_pts, initial_pts=None, *,
          win_size: int = 11, max_iters: int = 30, eps: float = 0.01,
          min_eig_threshold: float = 1e-4, mask=None, windowed=None,
          pallas_mode=None):
    """Track points from the previous image into the current image.

    Args:
      prev_pyramid/cur_pyramid: lists of (H, W) float images, level 0 finest
        (see :func:`stereovision_slam_tpu.ops.image.build_pyramid`).
      prev_pts: (N, 2) float (x, y) points in the previous image.
      initial_pts: (N, 2) initial guesses in the current image
        (OPTFLOW_USE_INITIAL_FLOW); defaults to prev_pts.
      mask: optional (N,) bool; False slots are not iterated (their returned
        position is the initial guess, status unspecified). Lets the
        convergence early-exit ignore dead feature slots whose garbage
        coordinates would otherwise iterate the full max_iters every call.
      windowed: force (True) or forbid (False) the windowed per-level
        sampling path; None picks by backend + level size (TPU, large
        levels). Tests use True on CPU to cover the windowed kernel.

    Returns:
      cur_pts: (N, 2) tracked points.
      status: (N,) bool track validity (in-bounds + well-conditioned, matching
        the border/status culling at frontend.cpp:115-121).
    """
    num_levels = len(prev_pyramid)
    if initial_pts is None:
        initial_pts = prev_pts
    if pallas_mode is None:
        # default: the lane-major fused kernel on TPU (slope-measured r5:
        # 1.04 -> 0.37 ms single-group, 3.01 -> 1.11 ms for the frontend's
        # 3-group batch), the XLA while_loop elsewhere (the Pallas
        # interpreter is far slower than plain XLA on CPU). windowed=False
        # is an explicit request for full-image sampling, which the lanes
        # kernel (always windowed) cannot honor; tiny coarse levels fall
        # back too (the lane windows would exceed the level image —
        # lk_lanes.level_window_shape's clamp floor).
        pallas_mode = ("lanes" if jax.default_backend() != "cpu"
                       and windowed is not False
                       and _lanes_levels_ok(prev_pyramid, win_size)
                       else "xla")
    if pallas_mode in ("lanes", "lanes-interpret"):
        # lane-major fused path: the whole per-level iteration loop is one
        # Pallas kernel with points in the lane dimension (ops/lk_lanes.py)
        from stereovision_slam_tpu.ops import lk_lanes
        if mask is None:
            mask = jnp.ones(prev_pts.shape[0], jnp.bool_)
        uv, st = lk_lanes.track_grouped_lanes(
            [l[None] for l in prev_pyramid], [l[None] for l in cur_pyramid],
            prev_pts[None], initial_pts[None], mask[None],
            win_size=win_size, max_iters=max_iters, eps=eps,
            min_eig_threshold=min_eig_threshold,
            interpret=(pallas_mode == "lanes-interpret"))
        return uv[0], st[0]
    scale_top = 0.5 ** (num_levels - 1)
    guesses = initial_pts * scale_top
    status = jnp.ones(prev_pts.shape[0], dtype=jnp.bool_)

    # Edge-pad every level by the window apron so patches at (and slightly
    # past) the true image border remain well-defined — coarse levels of
    # KITTI-sized images are only a few window-widths tall, and without the
    # pad border points would freeze at the coarse levels and never converge.
    pad = win_size // 2 + 2
    off = jnp.asarray([pad, pad], dtype=guesses.dtype)

    for level in range(num_levels - 1, -1, -1):
        s = 0.5 ** level
        pts_l = prev_pts * s + off
        prev_p = jnp.pad(prev_pyramid[level], pad, mode="edge")
        cur_p = jnp.pad(cur_pyramid[level], pad, mode="edge")
        guesses, ok = _track_level(
            prev_p, cur_p, pts_l, guesses + off,
            win_size, max_iters, eps, min_eig_threshold, mask=mask,
            windowed=windowed, pallas_mode=pallas_mode)
        guesses = guesses - off
        # only require conditioning at the finest level (coarse levels just
        # refine the guess; OpenCV behaves similarly for small images)
        if level == 0:
            status = status & ok
        if level > 0:
            guesses = guesses * 2.0

    H, W = cur_pyramid[0].shape
    inb = (
        (guesses[:, 0] >= 0.0) & (guesses[:, 0] < W)
        & (guesses[:, 1] >= 0.0) & (guesses[:, 1] < H)
    )
    return guesses, status & inb


def track_batched(tmpl_pyramids, tgt_pyramids, pts, initial_pts, masks, *,
                  win_size: int = 11, max_iters: int = 30, eps: float = 0.01,
                  min_eig_threshold: float = 1e-4, windowed=None,
                  pallas_mode=None):
    """Track G independent point groups — each with its OWN template/target
    image pair — as ONE batched program.

    The frontend issues up to three LK solves per frame (last->current,
    anchor->current, ->right; frontend.py track_step). Run sequentially they
    pay the sum of their while_loop iteration counts in sequential latency;
    vmapped over the group axis they pay only the max, and every per-point
    one-hot gather/matmul runs as a single (G*N)-sized MXU batch. Numerics
    per group are identical to :func:`track` (the batching rule only merges
    the iteration schedules).

    Args:
      tmpl_pyramids / tgt_pyramids: lists (level 0 finest) of (G, H, W)
        stacked images.
      pts / initial_pts: (G, N, 2) template points and initial guesses.
      masks: (G, N) bool active slots.

    Returns (cur_pts (G, N, 2), status (G, N)).
    """
    # None falls through to the vmap path (each group resolves its own
    # default inside `track`). Folding the G groups into one lane-major
    # call (pallas_mode="lanes" explicitly) was A/B'd for the frontend's
    # 2-group solve in round 5 and measured NEUTRAL-to-slightly-worse
    # (1.21 -> 1.26-1.31 ms track_step): the folded chunk's while_loop
    # runs to the WORST group's iteration count over 2x-wide per-iteration
    # ops, which cancels the issue-cost saving. The serving path still
    # folds (frontend.track_step_serving) because at G=B>=8 the vmap
    # alternative serializes B grid steps.
    if pallas_mode in ("lanes", "lanes-interpret"):
        # fold the group axis into the kernel's lane dimension instead of
        # vmapping (ops/lk_lanes.py module docstring)
        from stereovision_slam_tpu.ops import lk_lanes
        return lk_lanes.track_grouped_lanes(
            tmpl_pyramids, tgt_pyramids, pts, initial_pts, masks,
            win_size=win_size, max_iters=max_iters, eps=eps,
            min_eig_threshold=min_eig_threshold,
            interpret=(pallas_mode == "lanes-interpret"))
    fn = partial(track, win_size=win_size, max_iters=max_iters, eps=eps,
                 min_eig_threshold=min_eig_threshold, windowed=windowed,
                 pallas_mode=pallas_mode)
    return jax.vmap(
        lambda tp, cp, p, i, mk: fn(tp, cp, p, initial_pts=i, mask=mk)
    )(tmpl_pyramids, tgt_pyramids, pts, initial_pts, masks)
