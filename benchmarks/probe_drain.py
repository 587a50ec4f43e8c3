"""Decompose post-stream drain + PGO wall time on the live backend."""
import os, sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np
    import subprocess, tempfile
    from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
    from stereovision_slam_tpu.slam.config import SlamConfig
    from stereovision_slam_tpu.slam.fused_loop import FusedLoopVisualOdometry
    import synthetic

    H, W, T = 188, 620, 120
    with tempfile.TemporaryDirectory() as tmp:
        scene = os.path.join(tmp, "scene.npz")
        subprocess.run([sys.executable, "/root/repo/benchmarks/render_scene.py",
                        scene, str(T), str(H), str(W), "circuit"],
                       check=True, capture_output=True)
        data = np.load(scene)
        lefts, rights, gt = data["lefts"], data["rights"], data["poses"]
    rig = synthetic.make_stereo_rig()
    cfg = SlamConfig(); cfg.num_features = 250
    cfg.num_features_needed_for_keyframe = 160
    cfg.keyframes_to_skip_in_candidate_search = 12
    cfg.potential_loop_strong_threshold = 0.90
    cfg.potential_loop_weak_threshold = 0.85
    cfg.max_num_weak_threshold = 100
    cfg.min_num_acceptable_keypoint_match = 10
    ds = ArraySequenceDataset(lefts, rights, list(rig))
    vo = FusedLoopVisualOdometry(cfg, ds, prefetch_depth=0,
                                 max_total_keyframes=512,
                                 max_total_landmarks=1 << 16)
    vo.initialize()
    vo._queue = [(i, jax.device_put(lefts[i]), jax.device_put(rights[i]))
                 for i in range(T)]
    jax.block_until_ready(vo._queue[-1][1])
    t0 = time.perf_counter(); vo.step(); np.asarray(vo.fs.T_cur)
    print(f"warmup: {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter(); n = 0
    while vo.step():
        n += 1
        if n % 8 == 0: np.asarray(vo.fs.T_cur)
    print(f"enqueue+sync: {time.perf_counter()-t0:.3f}s")

    t = time.perf_counter(); kfc = int(vo.kf_count)
    print(f"kf_count readback (full queue wait): {time.perf_counter()-t:.3f}s")
    t = time.perf_counter(); nlm = int(vo.ms.next_lm_id)
    print(f"next_lm_id readback: {time.perf_counter()-t:.3f}s")
    t = time.perf_counter(); outs = vo._materialize_outputs()
    print(f"materialize_outputs: {time.perf_counter()-t:.3f}s")
    t = time.perf_counter(); kf, lm, frames = vo.drain()
    print(f"drain() after that: {time.perf_counter()-t:.3f}s  kf={len(kf)} lm={len(lm)}")
    t = time.perf_counter(); edges = vo.loop_edges()
    print(f"loop_edges: {time.perf_counter()-t:.3f}s n={len(edges)}")
    t = time.perf_counter(); kf2, lm2, _ = vo.drain()
    print(f"drain() again: {time.perf_counter()-t:.3f}s")
    from stereovision_slam_tpu.slam.pose_graph import optimize_pose_graph
    t = time.perf_counter(); traj = vo.run_pgo()
    print(f"run_pgo total: {time.perf_counter()-t:.3f}s")

if __name__ == "__main__":
    main()
