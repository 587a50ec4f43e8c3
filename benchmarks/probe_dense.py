"""Slope-timed on-chip cost of the dense-reconstruction kernels (C12).

Times compute_disparity (128-disp SAD cost volume + LR check, the
cv::StereoBM analogue) and the k-NN matmul core of statistical outlier
removal at the reference's operating point (620x188 half-res pairs,
dense_reconstruction.h:56-58 / :175-200).

Run fresh: python benchmarks/probe_dense.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from stereovision_slam_tpu.ops import sor, stereo_bm

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    H, W = 188, 620
    left = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    # shifted copy gives a well-behaved disparity field
    right = jnp.roll(left, -12, axis=1)
    pts = jnp.asarray(rng.uniform(-20, 20, (8192, 3)).astype(np.float32))

    def slope(label, step_fn, *args):
        ts = {}
        for KR in (4, 20):
            @jax.jit
            def reps(*a):
                return lax.fori_loop(
                    0, KR, lambda i, acc: acc + step_fn(i, *a),
                    jnp.float32(0.0))
            float(np.asarray(reps(*args)))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(reps(*args)))
                best = min(best, time.perf_counter() - t0)
            ts[KR] = best
        print(f"{label:52s} {(ts[20] - ts[4]) / 16 * 1e3:9.3f} ms",
              flush=True)

    def disp_step(i, left, right):
        d, ok = stereo_bm.compute_disparity(left + i * 1e-6, right,
                                            num_disparities=128,
                                            block_size=15)
        return jnp.sum(d) + jnp.sum(ok)
    slope("stereo BM disparity 620x188 x128 disp (per kf)", disp_step,
          left, right)

    for method in ("exact", "approx"):
        def sor_step(i, pts, method=method):
            m = sor._mean_knn_chunk(pts + i * 1e-6, pts, k=50,
                                    method=method)
            return jnp.sum(m)
        slope(f"SOR k-NN mean distances, 8192 pts k=50 [{method}]",
              sor_step, pts)


if __name__ == "__main__":
    main()
