"""Honest (readback-timed) axon runtime probes.

Every timing here stops the clock only after np.asarray() of a value that
data-depends on the work — block_until_ready() can return early on this
runtime (bench.py module docstring), so enqueue-rate numbers are worthless.

Run in a FRESH process (cliffs are per-process):
    python benchmarks/probe_runtime.py [probe ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(label, fn, *args, reps=3):
    # first call compiles
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]  # data-dep drain
        ts.append(time.perf_counter() - t0)
    print(f"{label:55s} {min(ts)*1000:10.3f} ms  (reps {[f'{t*1000:.1f}' for t in ts]})")
    return min(ts)


def main():
    which = set(sys.argv[1:]) or {"matmul", "loops", "unrolled", "pyramid",
                                  "lk", "readback"}
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.default_backend())

    if "matmul" in which:
        a = jnp.ones((2048, 2048), jnp.float32)

        @jax.jit
        def mm(a):
            return a @ a

        t = timed("matmul 2048^3 f32 (~17 GFLOP)", mm, a)
        print(f"    -> {17.2e9 / t / 1e12:.2f} TFLOP/s")

    if "readback" in which:
        for n in (1, 1024, 1024 * 1024):
            x = jnp.ones((n,), jnp.float32) * 2

            @jax.jit
            def f(x):
                return x + 1

            timed(f"readback {4*n/1024:.0f} KiB after trivial op", f, x)

    if "loops" in which:
        x = jnp.ones((8, 128), jnp.float32)
        for n in (10, 100, 1000):

            @jax.jit
            def loop(x, n=n):
                return lax.fori_loop(0, n, lambda i, v: v * 1.0001 + 1e-7, x)

            t = timed(f"fori_loop {n} iters of fused 8x128 body", loop, x)
            print(f"    -> {t/n*1e6:.1f} us/iter")

    if "unrolled" in which:
        x = jnp.ones((8, 128), jnp.float32)
        for n in (100, 1000):

            @jax.jit
            def unrolled(x, n=n):
                for _ in range(n):
                    x = x * 1.0001 + 1e-7
                return x

            t = timed(f"trace-unrolled {n} iters (XLA fuses to ~1 kernel)",
                      unrolled, x)

        # defeat fusion: rotating matmul chain — N distinct MXU calls
        m = jnp.eye(128, dtype=jnp.float32) * 1.0001
        for n in (100, 1000):

            @jax.jit
            def chain(x, m, n=n):
                for _ in range(n):
                    x = x @ m
                return x

            xx = jnp.ones((128, 128), jnp.float32)
            t = timed(f"trace-unrolled {n} chained 128-matmuls", chain, xx, m)
            print(f"    -> {t/n*1e6:.1f} us/op")

    if "pyramid" in which:
        sys.path.insert(0, "/root/repo")
        from stereovision_slam_tpu.ops import image as imops
        img = jnp.ones((188, 620), jnp.float32)

        @jax.jit
        def pyr(img):
            return tuple(imops.build_pyramid(img, 4))

        timed("build_pyramid 188x620 x4 levels", pyr, img)

    if "lk" in which:
        sys.path.insert(0, "/root/repo")
        from stereovision_slam_tpu.ops import image as imops, lk
        img0 = jnp.asarray(np.random.default_rng(0).uniform(
            0, 255, (188, 620)).astype(np.float32))
        img1 = jnp.roll(img0, 2, axis=1)
        p0 = tuple(imops.build_pyramid(img0, 4))
        p1 = tuple(imops.build_pyramid(img1, 4))
        pts = jnp.asarray(np.random.default_rng(1).uniform(
            20, 160, (256, 2)).astype(np.float32))

        @jax.jit
        def track(p0, p1, pts):
            return lk.track(list(p0), list(p1), pts)

        timed("LK 256 pts x 4 levels x 30 iters", track, p0, p1, pts)


if __name__ == "__main__":
    main()


def probe_irregular():
    """Row-gather / scatter-add / batched small-inverse costs (BA suspects)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 1024, 8192).astype(np.int32))
    table = jnp.asarray(rng.uniform(0, 1, (1024, 3)).astype(np.float32))
    upd = jnp.asarray(rng.uniform(0, 1, (8192, 3, 3)).astype(np.float32))
    mats = jnp.asarray(rng.uniform(0, 1, (1024, 3, 3)).astype(np.float32)) + \
        3.0 * jnp.eye(3)

    timed("row-gather (8192 idx from (1024,3))",
          jax.jit(lambda t, i: t[i]), table, idx)
    timed("scatter-add (8192,3,3) into (1024,3,3)",
          jax.jit(lambda u, i: jnp.zeros((1024, 3, 3), jnp.float32)
                  .at[i].add(u)), upd, idx)
    onehot = jax.jit(lambda i: (i[:, None] == jnp.arange(1024)[None, :])
                     .astype(jnp.float32))
    timed("one-hot scatter-add equivalent (matmul)",
          jax.jit(lambda u, i: jnp.einsum(
              "ml,mbc->lbc", onehot(i), u,
              precision=jax.lax.Precision.HIGHEST)), upd, idx)
    timed("batched inv (1024,3,3) via linalg.inv",
          jax.jit(jnp.linalg.inv), mats)
    timed("batched 96x96 solve",
          jax.jit(lambda A, b: jnp.linalg.solve(A, b)),
          jnp.eye(96) * 3 + jnp.ones((96, 96)) * 0.01, jnp.ones((96,)))
    sc = jnp.asarray(rng.uniform(0, 1, (1024, 3)).astype(np.float32))
    timed("scatter-set (1024 rows into (4096,3))",
          jax.jit(lambda t, i, v: t.at[i].set(v)),
          jnp.zeros((4096, 3)), idx[:1024], sc)


if __name__ == "__main__" and "irregular" in sys.argv:
    probe_irregular()
