"""Dense stereo block matching (disparity estimation).

TPU-native replacement for cv::StereoBM in the reference's dense
reconstruction (/root/reference/src/dense_reconstruction.cpp:104-117;
128 disparities, 15x15 block, dense_reconstruction.h:56-58). Instead of the
OpenCV scanline algorithm, the whole cost volume is computed batched: for
every disparity, an absolute-difference image box-filtered by two separable
sums (conv), then argmin over the disparity axis with left-right uniqueness
and sub-pixel parabola refinement — ~15M MAC-equivalent per KITTI frame,
ideal VPU work, one jitted program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from stereovision_slam_tpu.ops import image as imops


def _box_filter(img: jax.Array, size: int) -> jax.Array:
    import numpy as np
    k = np.ones((size,), np.float32)
    return imops._sep_filter(img, k, k)


@partial(jax.jit, static_argnames=("num_disparities", "block_size"))
def compute_disparity(left: jax.Array, right: jax.Array,
                      num_disparities: int = 128, block_size: int = 15,
                      uniqueness_ratio: float = 1.12,
                      texture_threshold: float = 12.0):
    """Disparity map from a rectified grayscale pair.

    Args:
      left/right: (H, W) float images.
      num_disparities: disparity search range [0, D).
      block_size: odd SAD window size.
      uniqueness_ratio: best-cost must beat second-best by this factor.
      texture_threshold: minimum local gradient energy to trust a match.

    Returns:
      disp: (H, W) float32 disparity (sub-pixel), 0 where invalid.
      valid: (H, W) bool.
    """
    H, W = left.shape
    D = num_disparities

    def cost_at(d):
        shifted = jnp.roll(right, d, axis=1)
        ad = jnp.abs(left - shifted)
        # columns x < d have no valid counterpart
        col = lax.broadcasted_iota(jnp.int32, (H, W), 1)
        ad = jnp.where(col >= d, ad, 1e6)
        return _box_filter(ad, block_size)

    costs = jax.vmap(cost_at)(jnp.arange(D))       # (D, H, W)

    best = jnp.argmin(costs, axis=0)               # (H, W)
    cmin = jnp.min(costs, axis=0)

    # uniqueness: second-best outside +-1 of best must be clearly worse
    d_axis = jnp.arange(D)[:, None, None]
    near = jnp.abs(d_axis - best[None]) <= 1
    second = jnp.min(jnp.where(near, 1e6, costs), axis=0)
    unique = second >= cmin * uniqueness_ratio

    # sub-pixel parabola around the minimum
    bm1 = jnp.clip(best - 1, 0, D - 1)
    bp1 = jnp.clip(best + 1, 0, D - 1)
    yy = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    c0 = costs[bm1, yy, xx]
    c1 = cmin
    c2 = costs[bp1, yy, xx]
    denom = c0 - 2 * c1 + c2
    delta = jnp.where(jnp.abs(denom) > 1e-6,
                      0.5 * (c0 - c2) / jnp.where(jnp.abs(denom) > 1e-6,
                                                  denom, 1.0), 0.0)
    disp = best.astype(jnp.float32) + jnp.clip(delta, -0.5, 0.5)

    # texture gate: flat regions are unreliable
    ix, _ = imops.sobel_gradients(left)
    tex = _box_filter(jnp.abs(ix), block_size) / (block_size * block_size)
    textured = tex > texture_threshold / 255.0 * jnp.maximum(jnp.mean(left), 1.0) * 0.05

    border = block_size // 2
    inb = ((yy >= border) & (yy < H - border)
           & (xx >= border + D) & (xx < W - border))
    valid = unique & textured & inb & (best > 0) & (cmin < 1e5)
    return jnp.where(valid, disp, 0.0), valid
