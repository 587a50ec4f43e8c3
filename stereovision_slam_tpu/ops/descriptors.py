"""Oriented BRIEF (ORB-style) binary descriptors, batched in JAX.

TPU-native replacement for the reference's `cv::ORB::create(400)` descriptor
computation (/root/reference/src/loopclosure.cpp:40-45, 131-171): per keypoint
an orientation from the intensity-centroid moment of a 31x31 patch, then 256
brightness comparisons over a rotated sampling pattern, packed into 8 uint32
lanes for XOR/popcount matching.

The sampling pattern is a fixed seeded Gaussian pattern rather than OpenCV's
learned rBRIEF table — descriptors only ever match against other descriptors
from this module (loop-closure candidate vs current keyframe), so internal
consistency is what matters, and a Gaussian pattern's discrimination is
equivalent in that setting.

All keypoints are processed as one batched program: patch gathers via
dynamic slices, orientation + comparisons as vectorized math.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.ops import image as imops

PATCH = 31           # orientation/sampling patch (cv::ORB patchSize)
N_BITS = 256
N_WORDS = N_BITS // 32


def _make_pattern(seed: int = 7):
    """(N_BITS, 4) sampling-pair offsets (x0, y0, x1, y1), sigma = PATCH/5."""
    rng = np.random.default_rng(seed)
    sigma = PATCH / 5.0
    pat = rng.normal(0.0, sigma, size=(N_BITS, 4))
    return np.clip(pat, -(PATCH // 2 - 1), PATCH // 2 - 1).astype(np.float32)


_PATTERN = jnp.asarray(_make_pattern())


def orientations(img: jax.Array, pts: jax.Array):
    """Intensity-centroid orientation per keypoint (IC angle, as in ORB).

    Returns (cos, sin, valid) for (N, 2) points.
    """
    patches, valid = imops.sample_patches(img, pts, PATCH)
    half = (PATCH - 1) / 2.0
    ys = jnp.arange(PATCH, dtype=img.dtype) - half
    xs = jnp.arange(PATCH, dtype=img.dtype) - half
    # restrict to the circular patch like cv::ORB
    rr = ys[:, None] ** 2 + xs[None, :] ** 2
    circ = (rr <= half * half).astype(img.dtype)
    pw = patches * circ
    m10 = jnp.sum(pw * xs[None, None, :], axis=(1, 2))
    m01 = jnp.sum(pw * ys[None, :, None], axis=(1, 2))
    norm = jnp.sqrt(m10 * m10 + m01 * m01)
    safe = jnp.maximum(norm, 1e-9)
    return m10 / safe, m01 / safe, valid


def compute(img: jax.Array, pts: jax.Array, valid: jax.Array | None = None,
            pattern: jax.Array | None = None):
    """Descriptors for (N, 2) keypoints on an (H, W) image.

    Args:
      pattern: optional (N_BITS, 4) sampling-pair offsets. Defaults to the
        module pattern — fine for EAGER calls (the array is then an input
        buffer), but callers that trace `compute` inside a jitted program
        MUST pass the pattern as a runtime argument: a closed-over module
        array becomes a dense constant in the executable, which the axon
        runtime executes pathologically (docs/PERFORMANCE.md
        "array-constant cliff").

    Returns:
      desc: (N, N_WORDS) uint32 packed binary descriptors.
      ok:   (N,) bool — descriptor computed (patch in bounds, pts valid).
    """
    n = pts.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    if pattern is None:
        pattern = _PATTERN
    # ORB smooths with an integral-image box blur; gaussian is equivalent here
    smooth = imops.gaussian_blur(img, 5)
    ca, sa, pv = orientations(smooth, pts)

    # rotate the pattern by the keypoint orientation: (N, N_BITS, 4)
    px0, py0, px1, py1 = (pattern[:, 0], pattern[:, 1],
                          pattern[:, 2], pattern[:, 3])

    def rot(px, py):
        x = ca[:, None] * px[None, :] - sa[:, None] * py[None, :]
        y = sa[:, None] * px[None, :] + ca[:, None] * py[None, :]
        return x, y

    x0, y0 = rot(px0, py0)
    x1, y1 = rot(px1, py1)

    # sample both endpoints of each pair via one patch per keypoint.
    # NEAREST sampling, like cv::ORB's GET_VALUE (orb.cpp uses cvRound on the
    # rotated offsets — not bilinear), realized as two one-hot contractions
    # with the 2*N_BITS sample axis in the LANE dimension: the previous
    # per-tap fancy-indexed bilinear lowered to 8 batched gather ops costing
    # ~5.9 ms per keyframe on the TPU runtime (round-4 slope probe) vs
    # ~0.2 ms for the one-hot form.
    patches, pv2 = imops.sample_patches(smooth, pts, PATCH + 2)
    half = (PATCH + 1) / 2.0
    P2 = PATCH + 2                              # patch side (33)
    S2 = 2 * N_BITS
    xs = jnp.concatenate([x0, x1], axis=1)      # (N, 2*N_BITS)
    ys = jnp.concatenate([y0, y1], axis=1)
    xi = jnp.clip(jnp.round(xs + half).astype(jnp.int32), 0, P2 - 1)
    yi = jnp.clip(jnp.round(ys + half).astype(jnp.int32), 0, P2 - 1)
    dt = patches.dtype
    rsel = (jax.lax.broadcasted_iota(jnp.int32, (n, P2, S2), 1)
            == yi[:, None, :]).astype(dt)       # (N, P2, S2)
    rows = jnp.einsum("nps,npq->nqs", rsel, patches,
                      precision=jax.lax.Precision.HIGHEST)
    csel = (jax.lax.broadcasted_iota(jnp.int32, (n, P2, S2), 1)
            == xi[:, None, :]).astype(dt)
    vals = jnp.einsum("nqs,nqs->ns", rows, csel,
                      precision=jax.lax.Precision.HIGHEST)
    va, vb = vals[:, :N_BITS], vals[:, N_BITS:]
    bits = (va < vb).astype(jnp.uint32)        # (N, N_BITS)

    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(bits.reshape(n, N_WORDS, 32) << shifts[None, None, :],
                    axis=-1, dtype=jnp.uint32)
    ok = valid & pv & pv2
    return words, ok
