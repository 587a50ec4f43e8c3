"""PGO at scale under the honest protocol: 512 / 2048 keyframes, isolated
wall time including result readback (VERDICT r2 #9).

    [BENCH_PLATFORM=cpu] python benchmarks/probe_pgo_scale.py [512,2048]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np
    from stereovision_slam_tpu.geometry import se3
    from stereovision_slam_tpu.slam.pose_graph import (PoseGraph,
                                                       optimize_pose_graph)

    sizes = [int(v) for v in (sys.argv[1].split(",") if len(sys.argv) > 1
                              else ["512", "2048"])]
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    for T in sizes:
        # drifting circle with ~12% loop edges (KITTI-00-like edge mix)
        gt = []
        pose = np.concatenate([np.eye(3, dtype=np.float32),
                               np.zeros((3, 1), np.float32)], axis=1)
        delta = np.asarray(se3.se3_exp(jnp.asarray(
            [0.0, 0.0, -0.5, 0.0, 2 * np.pi / T, 0.0], dtype=jnp.float32)))
        for _ in range(T):
            gt.append(pose)
            pose = np.asarray(se3.se3_compose(jnp.asarray(delta),
                                              jnp.asarray(pose)))
        noisy = np.stack([
            np.asarray(se3.se3_compose(se3.se3_exp(jnp.asarray(
                rng.normal(0, 0.01, 6).astype(np.float32))),
                jnp.asarray(p))) for p in gt])
        ei = list(range(1, T))
        ej = list(range(0, T - 1))
        n_loop = max(T // 8, 1)
        for k in range(n_loop):  # loop edges spanning the circle
            a = int(rng.integers(0, T // 2))
            b = min(a + T // 2, T - 1)
            ej.append(a); ei.append(b)
        meas = np.stack([
            np.asarray(se3.se3_compose(jnp.asarray(gt[b]),
                                       se3.se3_inverse(jnp.asarray(gt[a]))))
            for a, b in zip(ej, ei)])
        E = len(ei)
        g = PoseGraph(poses=jnp.asarray(noisy),
                      pose_valid=jnp.ones((T,), bool),
                      edge_i=jnp.asarray(ei, jnp.int32),
                      edge_j=jnp.asarray(ej, jnp.int32),
                      edge_meas=jnp.asarray(meas),
                      edge_valid=jnp.ones((E,), bool))
        out = optimize_pose_graph(g, iters=22, cg_iters=100)  # compile
        np.asarray(out)
        t0 = time.perf_counter()
        out = optimize_pose_graph(g, iters=22, cg_iters=100)
        out_h = np.asarray(out)     # honest: clock stops after readback
        dt = time.perf_counter() - t0
        err = np.linalg.norm(out_h[:, :, 3] - noisy[:, :, 3], axis=1)
        print(f"T={T:5d} E={E:5d}: {dt*1000:9.1f} ms/solve "
              f"(22 LM x 100 CG, drained), max pose correction "
              f"{err.max():.3f}", flush=True)


if __name__ == "__main__":
    main()
