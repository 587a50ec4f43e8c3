"""Batched good-features-to-track (GFTT / Shi-Tomasi) corner detection.

TPU-native equivalent of the reference's `cv::GFTTDetector::create(num_features,
0.01, 20)` + rectangular masking around already-tracked features
(/root/reference/src/frontend.cpp:22-70). Redesign rather than port:

  * the min-eigenvalue response is two convs + elementwise math (VPU-friendly);
  * existing-feature masking is a scatter into a coarse occupancy grid (the
    reference draws one 20x20 filled rect per feature — a serial host loop);
  * minDistance enforcement is a (2r+1)^2 max-pool non-max suppression instead
    of OpenCV's greedy sorted scan (greedy is inherently sequential); with
    r = minDistance/2 the kept corners are a slightly sparser subset with the
    same spatial spread;
  * final selection is one `lax.top_k` over the flattened response.

Everything is static-shape: always returns `max_corners` slots plus a validity
mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from stereovision_slam_tpu.ops import image as imops


def min_eig_response(img: jax.Array, block_size: int = 3) -> jax.Array:
    """Shi-Tomasi min-eigenvalue corner response (cv::cornerMinEigenVal)."""
    ix, iy = imops.sobel_gradients(img)
    import numpy as np
    box = np.ones(block_size, np.float32) / float(block_size * block_size)
    ones = np.ones(block_size, np.float32)
    # structure tensor entries, box-filtered in ONE batched pass (three
    # sequential whole-image filter fusions cost ~3x the latency of one
    # vmapped pass on the TPU runtime; normalization is irrelevant for the
    # relative qualityLevel threshold but keeps magnitudes sane)
    planes = jnp.stack([ix * ix, iy * iy, ix * iy])
    sxx, syy, sxy = jax.vmap(
        lambda p: imops._sep_filter(p, box, ones))(planes)
    # min eigenvalue of [[sxx, sxy], [sxy, syy]]
    tr_half = 0.5 * (sxx + syy)
    det_part = jnp.sqrt(jnp.maximum(0.25 * (sxx - syy) ** 2 + sxy * sxy, 0.0))
    return tr_half - det_part


def occupancy_mask(shape: tuple[int, int], pts: jax.Array, pts_valid: jax.Array,
                   radius: int) -> jax.Array:
    """Boolean (H, W) mask, False within ~radius of any valid point.

    Scatter the points into a cell grid with cell = radius, mark the 3x3 cell
    neighborhood of each occupied cell, then upsample. Cheap, static-shape
    replacement for the reference's per-feature cv::rectangle mask painting
    (frontend.cpp:43-49).
    """
    H, W = shape
    cell = max(int(radius), 1)
    gh = -(-H // cell)
    gw = -(-W // cell)
    cx = jnp.clip((pts[:, 0] / cell).astype(jnp.int32), 0, gw - 1)
    cy = jnp.clip((pts[:, 1] / cell).astype(jnp.int32), 0, gh - 1)
    grid = jnp.zeros((gh, gw), dtype=jnp.bool_)
    grid = grid.at[cy, cx].max(pts_valid)
    # dilate occupied cells by 1 in each direction (3x3 window)
    g = grid.astype(jnp.float32)[None, None]
    dil = lax.reduce_window(g, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 1, 1),
                            "SAME")[0, 0] > 0.5
    # upsample back to pixels
    up = jnp.repeat(jnp.repeat(dil, cell, axis=0), cell, axis=1)[:H, :W]
    return ~up


def detect(img: jax.Array, max_corners: int, quality_level: float = 0.01,
           min_distance: int = 20, mask: jax.Array | None = None,
           border: int = 3):
    """Detect up to `max_corners` corners.

    Args:
      img: (H, W) float image.
      max_corners: static output slot count.
      quality_level: relative response threshold.
      min_distance: NMS spacing (pool radius = min_distance // 2).
      mask: optional (H, W) bool; False pixels are excluded.
      border: pixels at the image edge to exclude.

    Returns:
      pts: (max_corners, 2) float (x, y), strongest first.
      valid: (max_corners,) bool.
      scores: (max_corners,) response values.
    """
    H, W = img.shape
    resp = min_eig_response(img)

    if mask is not None:
        resp = jnp.where(mask, resp, 0.0)

    # exclude border
    yy = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    resp = jnp.where(inb, resp, 0.0)

    # NMS: keep local maxima of a (2r+1)^2 window
    r = max(min_distance // 2, 1)
    win = 2 * r + 1
    pooled = lax.reduce_window(resp[None, None], -jnp.inf, lax.max,
                               (1, 1, win, win), (1, 1, 1, 1), "SAME")[0, 0]
    is_peak = (resp >= pooled) & (resp > 0.0)
    resp_nms = jnp.where(is_peak, resp, 0.0)

    flat = resp_nms.reshape(-1)
    scores, idx = lax.top_k(flat, max_corners)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    pts = jnp.stack([xs, ys], axis=-1)

    thresh = quality_level * jnp.max(resp)
    valid = scores > jnp.maximum(thresh, 0.0)
    return pts, valid, scores
