"""Micro-benchmark: strategies for gathering N per-point (P, P) windows
from a KITTI-level image — the LK tracker's per-level prep cost.

Candidates (round-4 design probe for fusing the LK prep into Pallas):
  xla_onehot       status quo: one-hot MXU matmuls (ops/image.py
                   _gather_patches_mxu)
  pallas_dynslice  Pallas kernel, image resident in VMEM, fori_loop over
                   points: 8-aligned sublane dynamic slice + two
                   tpu.dynamic_rotate ops bring the window to (0, 0)

Findings (v5e, 2026-08-21): slope-timed, the XLA one-hot costs ~80 us per
(256, 32, 32) gather and the Pallas roll-gather is ~free beyond the ~30-60
us pallas_call overhead. Mosaic constraints hit on the way: dynamic
sublane starts must be provably 8-aligned (pl.multiple_of), dynamic LANE
starts must be 128-aligned, dynamic_rotate needs a 128-multiple lane dim,
and HBM DMA slices must be 128-aligned on the lane dim (which kills
per-point unaligned window DMAs outright).

Each strategy is SLOPE-timed between two in-jit repetition counts (corner
offsets vary per rep, checksum accumulated — defeats CSE/hoisting): a
single dispatch+readback through the tunnel measures the ~24 ms RTT, not
the kernel (docs/PERFORMANCE.md round-4 methodology correction).

Run fresh: python benchmarks/probe_gather.py [N] [P]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from stereovision_slam_tpu.ops import image as imops  # noqa: E402

H, W = 208, 768          # level-0 KITTI half-res + LK apron, padded to the
                         # (8, 128) vreg grid: dynamic_rotate on the lane dim
                         # requires a 128-multiple width
K_REPS = 32


def _dynslice_kernel(pts_ref, img_ref, out_ref, *, N, P):
    """Roll-gather: dynamic-slice an 8-aligned full-width stripe (legal on
    the sublane dim with a multiple_of hint), then two dynamic rotates
    (tpu.dynamic_rotate) bring the window's (y%8, x) corner to (0, 0).
    Slice-then-newaxis ordering matters: newaxis-then-slice lowers to an
    unsupported in-kernel lax.gather."""
    W = img_ref.shape[1]

    def body(n, _):
        cy = pts_ref[n, 0]
        cx = pts_ref[n, 1]
        cy8 = pl.multiple_of((cy // 8) * 8, 8)
        stripe = img_ref[pl.ds(cy8, P + 8), :]
        stripe = pltpu.roll(stripe, (P + 8) - (cy - cy8), 0)
        stripe = pltpu.roll(stripe, W - cx, 1)
        # roll(x, s)[i] = x[(i - s) mod L]; s = L - d puts row d at index 0
        out_ref[pl.ds(n, 1)] = stripe[:P, :P][None]
        return 0
    lax.fori_loop(0, N, body, 0)


def gather_dynslice(img, cy, cx, N, P):
    pts = jnp.stack([cy, cx], axis=1).astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(_dynslice_kernel, N=N, P=P),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, P, P), jnp.float32),
    )(pts, img)


def bench(label, fn, img, cy, cx, N, P):
    best = {}
    for KR in (4, 4 + K_REPS):
        @jax.jit
        def reps(img, cy, cx, KR=KR):
            def body(i, acc):
                out = fn(img, (cy + i) % (H - P), (cx + i) % (W - P), N, P)
                return acc + jnp.sum(out[0]) + jnp.sum(out[N - 1])
            return lax.fori_loop(0, KR, body, jnp.float32(0.0))

        float(np.asarray(reps(img, cy, cx)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(reps(img, cy, cx)))
            ts.append(time.perf_counter() - t0)
        best[KR] = min(ts)
    per = (best[4 + K_REPS] - best[4]) / K_REPS
    print(f"{label:45s} {per*1e6:9.1f} us/gather  "
          f"({N}x{P}x{P} windows)", flush=True)
    return per


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.default_backend(), f" N={N} P={P}", flush=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    cy = jnp.asarray(rng.integers(0, H - P - K_REPS, N).astype(np.int32))
    cx = jnp.asarray(rng.integers(0, W - P - K_REPS, N).astype(np.int32))

    def xla_onehot(img, cy, cx, N, P):
        return imops._gather_patches_mxu(img, cy, cx, P - 1)

    ref = np.stack([np.asarray(img)[y:y + P, x:x + P]
                    for y, x in zip(np.asarray(cy), np.asarray(cx))])
    got = np.asarray(gather_dynslice(img, cy, cx, N, P))
    print("roll-gather max |err|:", np.abs(got - ref).max(), flush=True)

    bench("xla one-hot MXU (status quo)", xla_onehot, img, cy, cx, N, P)
    try:
        bench("pallas VMEM stripe+roll fori", gather_dynslice,
              img, cy, cx, N, P)
    except Exception as e:
        print("pallas_dynslice FAILED:", repr(e)[:300])


if __name__ == "__main__":
    main()
