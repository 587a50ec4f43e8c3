"""Image primitives: pyramids, gradients, bilinear patch sampling.

These are the batched building blocks under the frontend's detection/tracking
kernels (the reference leans on OpenCV for all of this: cv::buildOpticalFlowPyramid,
cv::Scharr/Sobel inside calcOpticalFlowPyrLK, /root/reference/src/frontend.cpp:105-109).

TPU mapping:
  * whole-image filters are `lax.conv_general_dilated` calls — XLA tiles them;
  * per-point patch reads are vmapped `lax.dynamic_slice` + bilinear blend,
    which lowers to a batched gather of contiguous windows (far cheaper on TPU
    than per-pixel gathers);
  * everything is static-shaped; out-of-bounds is tracked with masks, not
    branches.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _conv2d_same(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """2-D correlation with SAME padding on a single-channel image (H, W)."""
    x = img[None, None, :, :]
    k = kernel[None, None, :, :].astype(img.dtype)
    out = lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def _sep_filter(img: jax.Array, kx: jax.Array, ky: jax.Array) -> jax.Array:
    """Separable filter: row kernel kx then column kernel ky (SAME, zero pad).

    Implemented as unrolled shift-adds rather than `lax.conv`: a 1-channel
    conv is degenerate on the TPU MXU (the channel dim gets padded out to the
    systolic width), while k shifted adds are pure VPU elementwise work that
    XLA fuses into one pass — measured ~25x faster for the pyramid stack.
    """
    kx = np.asarray(kx, dtype=np.float32)
    ky = np.asarray(ky, dtype=np.float32)
    H, W = img.shape
    rx = len(kx) // 2
    ry = len(ky) // 2
    padded = jnp.pad(img, ((0, 0), (rx, rx)))
    out = None
    for i, w in enumerate(kx.tolist()):
        if w == 0.0:
            continue
        term = padded[:, i:i + W] * jnp.asarray(w, img.dtype)
        out = term if out is None else out + term
    padded = jnp.pad(out, ((ry, ry), (0, 0)))
    out2 = None
    for i, w in enumerate(ky.tolist()):
        if w == 0.0:
            continue
        term = padded[i:i + H, :] * jnp.asarray(w, img.dtype)
        out2 = term if out2 is None else out2 + term
    return out2


# OpenCV's fixed small-kernel tables (getGaussianKernel with sigma<=0 and
# ksize<=7 returns these, NOT the sigma formula). The reference's embedder
# preprocessing is cv::GaussianBlur(img, Size(7,7), 0) (loopclosure.cpp:110),
# so matching these taps gives bit-level preprocessing parity.
_SMALL_GAUSSIAN_TAB = {
    1: np.array([1.0], np.float32),
    3: np.array([0.25, 0.5, 0.25], np.float32),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], np.float32),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125,
                 0.21875, 0.109375, 0.03125], np.float32),
}


def gaussian_kernel1d(size: int, sigma: float | None = None) -> np.ndarray:
    """Odd-sized normalized 1-D Gaussian (OpenCV conventions when sigma=None:
    fixed binomial-style taps for ksize<=7, else the 0.3((k-1)/2-1)+0.8 rule).

    Returned as a concrete numpy array: filter taps are compile-time
    constants for the shift-add path in _sep_filter."""
    if (sigma is None or sigma <= 0) and size in _SMALL_GAUSSIAN_TAB:
        return _SMALL_GAUSSIAN_TAB[size]
    if sigma is None or sigma <= 0:
        sigma = 0.3 * ((size - 1) * 0.5 - 1) + 0.8
    x = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / np.sum(k)


def gaussian_blur(img: jax.Array, size: int, sigma: float | None = None) -> jax.Array:
    k = gaussian_kernel1d(size, sigma)
    return _sep_filter(img, k, k)


_PYRDOWN_K = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def pyr_down(img: jax.Array) -> jax.Array:
    """Gaussian 5-tap blur + 2x decimation (cv::pyrDown semantics)."""
    blurred = _sep_filter(img, _PYRDOWN_K, _PYRDOWN_K)
    return blurred[::2, ::2]


def build_pyramid(img: jax.Array, num_levels: int) -> list[jax.Array]:
    """List of `num_levels` images, level 0 = full resolution."""
    levels = [img]
    for _ in range(num_levels - 1):
        levels.append(pyr_down(levels[-1]))
    return levels


def build_pyramid_batched(imgs: jax.Array, num_levels: int) -> list[jax.Array]:
    """Pyramids for a (B, H, W) stack in one pass per level: the B images'
    blur/decimate run as one batched elementwise program instead of B
    sequential ones (halves the fused step's pyramid latency for the
    left+right pair). Level k has shape (B, H/2^k, W/2^k)."""
    levels = [imgs]
    down = jax.vmap(pyr_down)
    for _ in range(num_levels - 1):
        levels.append(down(levels[-1]))
    return levels


def resize_half(img: jax.Array) -> jax.Array:
    """Area-style 2x downscale (the reference halves KITTI images with
    cv::resize INTER_AREA-ish default, dataset.cpp:126-129): mean over 2x2."""
    H, W = img.shape
    H2, W2 = H // 2, W // 2
    img = img[: H2 * 2, : W2 * 2]
    return img.reshape(H2, 2, W2, 2).mean(axis=(1, 3))


# Scharr derivative (what cv::calcOpticalFlowPyrLK uses internally),
# normalized by 1/32 so gradients are in intensity-per-pixel units.
_SCHARR_D = np.array([-1.0, 0.0, 1.0], np.float32)
_SCHARR_S = np.array([3.0, 10.0, 3.0], np.float32) / 32.0


def scharr_gradients(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(Ix, Iy) via the 3x3 Scharr operator."""
    ix = _sep_filter(img, _SCHARR_D, _SCHARR_S)
    iy = _sep_filter(img, _SCHARR_S, _SCHARR_D)
    return ix, iy


def sobel_gradients(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(Ix, Iy) via the 3x3 Sobel operator (GFTT's cornerMinEigenVal uses
    Sobel with blockSize=3)."""
    d = np.array([-1.0, 0.0, 1.0], np.float32)
    s = np.array([1.0, 2.0, 1.0], np.float32)
    ix = _sep_filter(img, d, s)
    iy = _sep_filter(img, s, d)
    return ix, iy


def _bilinear_combine(raw, frac):
    fx = frac[:, 0][:, None, None]
    fy = frac[:, 1][:, None, None]
    return (
        (1 - fy) * (1 - fx) * raw[:, :-1, :-1]
        + (1 - fy) * fx * raw[:, :-1, 1:]
        + fy * (1 - fx) * raw[:, 1:, :-1]
        + fy * fx * raw[:, 1:, 1:]
    )


def _patch_corners(img, centers, size):
    H, W = img.shape
    half = (size - 1) / 2.0
    top_left = centers - half          # (N, 2) float, (x, y)
    base = jnp.floor(top_left)
    frac = top_left - base             # in [0, 1)
    x0 = jnp.clip(base[:, 0].astype(jnp.int32), 0, W - size - 1)
    y0 = jnp.clip(base[:, 1].astype(jnp.int32), 0, H - size - 1)
    valid = (
        (top_left[:, 0] >= 0.0)
        & (top_left[:, 1] >= 0.0)
        & (top_left[:, 0] + size < W)
        & (top_left[:, 1] + size < H)
    )
    return y0, x0, frac, valid


def sample_patches(img: jax.Array, centers: jax.Array, size: int):
    """Bilinearly sample `size` x `size` patches centered at float coords.

    Args:
      img: (H, W) image.
      centers: (N, 2) float (x, y) patch centers.
      size: odd patch side length.

    Returns:
      patches: (N, size, size).
      valid: (N,) bool — whole patch (incl. the +1 bilinear apron) in bounds.

    Two bit-identical implementations, chosen by backend at trace time:

      * CPU: one vmapped `dynamic_slice` per point (fast there).
      * TPU: the vmapped slice lowers to ~N sequential slices at the
        runtime's per-op latency floor (~1.3 us each — measured
        benchmarks/probe_runtime.py, the dominant cost of the whole LK
        tracker in round 1). Instead the row window is selected by a
        one-hot (N*(size+1), H) @ (H, W) matmul on the MXU and the column
        window by a per-point batched one-hot matmul — two large dense ops
        instead of N tiny serialized ones. One-hot matmuls are exact
        (each output element is 1.0 * pixel), so both paths return the
        same bits.
    """
    y0, x0, frac, valid = _patch_corners(img, centers, size)
    if jax.default_backend() == "cpu":
        def one(y, x):
            return lax.dynamic_slice(img, (y, x), (size + 1, size + 1))
        raw = jax.vmap(one)(y0, x0)
    else:
        raw = _gather_patches_mxu(img, y0, x0, size)
    return _bilinear_combine(raw, frac), valid


def _gather_patches_mxu(img, y0, x0, size):
    """(N, size+1, size+1) integer-corner patches via one-hot MXU matmuls."""
    H, W = img.shape
    N = y0.shape[0]
    S = size + 1
    hh = lax.broadcasted_iota(jnp.int32, (N, S, H), 2)
    rr = lax.broadcasted_iota(jnp.int32, (N, S, H), 1)
    rsel = (hh == y0[:, None, None] + rr).astype(img.dtype)
    rows = jnp.einsum("nsh,hw->nsw", rsel, img,
                      precision=lax.Precision.HIGHEST)
    ww = lax.broadcasted_iota(jnp.int32, (N, W, S), 1)
    cc = lax.broadcasted_iota(jnp.int32, (N, W, S), 2)
    csel = (ww == x0[:, None, None] + cc).astype(img.dtype)
    return jnp.einsum("nsw,nwc->nsc", rows, csel,
                      precision=lax.Precision.HIGHEST)


def sample_patches_multi(imgs: jax.Array, centers: jax.Array, size: int):
    """Bilinearly sample patches from C same-shape images at SHARED centers.

    One one-hot select pass serves all C images (the row/column selectors
    and bilinear fractions depend only on the centers): on TPU this is one
    (N*S, H) x (H, C*W)-shaped einsum chain instead of C separate gather
    programs — used by the LK tracker, whose template/gradient-x/gradient-y
    patches share their centers. Bit-identical to C `sample_patches` calls
    (each output element is still 1.0 * pixel).

    Args:
      imgs: (C, H, W) stack.
      centers: (N, 2) float (x, y).
      size: odd patch side length.

    Returns (patches (C, N, size, size), valid (N,)).
    """
    C, H, W = imgs.shape
    y0, x0, frac, valid = _patch_corners(imgs[0], centers, size)
    if jax.default_backend() == "cpu":
        def one(y, x):
            return lax.dynamic_slice(imgs, (0, y, x),
                                     (C, size + 1, size + 1))
        raw = jax.vmap(one)(y0, x0)              # (N, C, S, S)
        raw = jnp.swapaxes(raw, 0, 1)            # (C, N, S, S)
    else:
        N = y0.shape[0]
        S = size + 1
        hh = lax.broadcasted_iota(jnp.int32, (N, S, H), 2)
        rr = lax.broadcasted_iota(jnp.int32, (N, S, H), 1)
        rsel = (hh == y0[:, None, None] + rr).astype(imgs.dtype)
        rows = jnp.einsum("nsh,chw->cnsw", rsel, imgs,
                          precision=lax.Precision.HIGHEST)
        ww = lax.broadcasted_iota(jnp.int32, (N, W, S), 1)
        cc = lax.broadcasted_iota(jnp.int32, (N, W, S), 2)
        csel = (ww == x0[:, None, None] + cc).astype(imgs.dtype)
        raw = jnp.einsum("cnsw,nwq->cnsq", rows, csel,
                         precision=lax.Precision.HIGHEST)
    patches = jax.vmap(_bilinear_combine, in_axes=(0, None))(raw, frac)
    return patches, valid


def bilinear_sample(img: jax.Array, pts: jax.Array):
    """Bilinearly sample the image at (N, 2) float (x, y) points.

    Returns (values (N,), valid (N,)).
    """
    patches, _ = sample_patches(img, pts, 1)
    H, W = img.shape
    valid = (
        (pts[:, 0] >= 0.0) & (pts[:, 1] >= 0.0)
        & (pts[:, 0] <= W - 2.0) & (pts[:, 1] <= H - 2.0)
    )
    return patches[:, 0, 0], valid
