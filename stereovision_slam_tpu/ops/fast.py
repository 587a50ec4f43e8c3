"""Batched FAST-9 corner detection (the ORB detector's corner stage).

The reference optionally detects with `cv::ORB::create(num_features)` instead
of GFTT (config `keypoint_feature_detector: ORB`,
/root/reference/src/frontend.cpp:26-29). ORB's detector is FAST-9 on an image
pyramid with Harris ranking; here the segment test runs as pure vectorized
image algebra — 16 rolled copies of the image, bright/dark ring masks, and
the >=9-contiguous test as an unrolled AND over the 16 cyclic windows — so
the whole image is tested in one fused VPU pass. Selection (NMS + top-k +
masking) matches ops/gftt.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Bresenham circle of radius 3 (the FAST-16 ring), (dy, dx)
_RING = np.array([
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
], np.int32)

ARC = 9  # FAST-9: at least 9 contiguous ring pixels brighter/darker


def fast_response(img: jax.Array, threshold: float = 10.0) -> jax.Array:
    """FAST-9 corner response: 0 for non-corners, else the score
    sum(|ring - center| - t) over the qualifying arc's pixels (approximated
    with the full ring, which preserves ranking)."""
    shifted = [jnp.roll(img, (-int(dy), -int(dx)), axis=(0, 1))
               for dy, dx in _RING]
    ring = jnp.stack(shifted)                     # (16, H, W)
    bright = ring > img[None] + threshold
    dark = ring < img[None] - threshold

    def has_arc(mask):
        out = jnp.zeros_like(mask[0])
        for start in range(16):
            run = mask[start]
            for k in range(1, ARC):
                run = run & mask[(start + k) % 16]
            out = out | run
        return out

    is_corner = has_arc(bright) | has_arc(dark)
    score = jnp.sum(jnp.maximum(jnp.abs(ring - img[None]) - threshold, 0.0),
                    axis=0)
    return jnp.where(is_corner, score, 0.0)


def detect(img: jax.Array, max_corners: int, threshold: float = 10.0,
           min_distance: int = 20, mask: jax.Array | None = None,
           border: int = 4):
    """FAST corner detection with the same contract as gftt.detect:
    returns (pts (max_corners, 2), valid, scores), strongest first."""
    H, W = img.shape
    resp = fast_response(img, threshold)
    if mask is not None:
        resp = jnp.where(mask, resp, 0.0)
    yy = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    resp = jnp.where(inb, resp, 0.0)

    r = max(min_distance // 2, 1)
    win = 2 * r + 1
    pooled = lax.reduce_window(resp[None, None], -jnp.inf, lax.max,
                               (1, 1, win, win), (1, 1, 1, 1), "SAME")[0, 0]
    is_peak = (resp >= pooled) & (resp > 0.0)
    resp_nms = jnp.where(is_peak, resp, 0.0)

    scores, idx = lax.top_k(resp_nms.reshape(-1), max_corners)
    pts = jnp.stack([(idx % W).astype(jnp.float32),
                     (idx // W).astype(jnp.float32)], axis=-1)
    valid = scores > 0.0
    return pts, valid, scores
