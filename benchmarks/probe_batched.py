"""Honest aggregate throughput of the batched serving configuration.

Drives the batched step directly on pre-staged device frame stacks for
B lanes and reports ms per frame-batch and aggregate frames/s, clock
stopped by a data-dependent readback every 8 steps and at the end.

    python benchmarks/probe_batched.py 1,4,8 [legacy|stagger]

`stagger` (default) uses batched_staggered_step with k=B (one lane's
keyframe branch per dispatch); `legacy` uses the per-frame vmapped cond
(both branches every lane — flat in B, kept for comparison).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main():
    import os

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if os.environ.get("BENCH_PLATFORM"):  # the axon plugin ignores
        # JAX_PLATFORMS; this config update is what actually works
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np

    import synthetic
    from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
    from stereovision_slam_tpu.slam.config import SlamConfig
    from stereovision_slam_tpu.slam.batched import (
        BatchedFusedVisualOdometry, batched_fused_step,
        batched_staggered_step)

    Bs = [int(v) for v in (sys.argv[1].split(",") if len(sys.argv) > 1
                           else ["1", "4", "8"])]
    MODE = sys.argv[2] if len(sys.argv) > 2 else "stagger"
    print("backend:", jax.default_backend(), flush=True)
    H, W, T = 188, 620, 40
    rig = synthetic.make_stereo_rig()
    poses = synthetic.forward_motion_poses(T, step=0.5)
    lefts, rights = synthetic.render_textured_stereo_sequence(
        poses, H=H, W=W, rig=rig)
    lefts, rights = np.asarray(lefts), np.asarray(rights)
    cfg = SlamConfig()
    cfg.num_features = 250

    for B in Bs:
        dss = [ArraySequenceDataset(lefts, rights, list(rig))
               for _ in range(B)]
        vo = BatchedFusedVisualOdometry(cfg, dss, max_total_keyframes=512,
                                        max_total_landmarks=1 << 14)
        vo.initialize()
        statics = dict(
            num_levels=cfg.lk_num_levels, num_features=cfg.num_features,
            min_distance=cfg.gftt_min_distance,
            quality_level=cfg.gftt_quality_level,
            max_depth=cfg.max_triangulation_depth,
            num_active=cfg.num_active_keyframes,
            kf_threshold=cfg.num_features_needed_for_keyframe,
            bad_threshold=cfg.num_features_tracking_bad,
            chi2_th=cfg.chi2_th, backend_on=bool(cfg.backend_on),
            ba_iters=cfg.ba_lm_iters,
            detector=cfg.keypoint_feature_detector.lower(),
            init_branch=False, lost_recovery=False,
            ba_max_active=cfg.ba_max_active_landmarks or None)
        frames_dev = [
            (jax.device_put(jnp.asarray(np.stack([lefts[t]] * B))),
             jax.device_put(jnp.asarray(np.stack([rights[t]] * B))),
             jax.device_put(jnp.asarray([t] * B, jnp.int32)))
            for t in range(1, T)]
        jax.block_until_ready(frames_dev[-1][0])
        st = (vo.fs, vo.ms, vo.arc, vo.kf_count)

        if MODE == "stagger":
            stag = dict(statics)
            stag.pop("init_branch"); stag.pop("lost_recovery")
            stag["ba_max_active"] = stag["ba_max_active"] or 1024
            stag["m"] = 1  # k = B: one lane's keyframe branch per dispatch

            def step(st, fr, i):
                return batched_staggered_step(
                    *st, *fr, jnp.asarray(i % max(B, 1), jnp.int32),
                    vo.cam_left, vo.cam_right, **stag)[:4]
        else:
            def step(st, fr, i):
                return batched_fused_step(*st, *fr, vo.cam_left,
                                          vo.cam_right, **statics)[:4]

        # warmup/compile
        st = step(st, frames_dev[0], 0)
        float(np.asarray(st[0].T_cur)[0, 0, 0])
        t0 = time.perf_counter()
        n = 0
        for fr in frames_dev[1:]:
            st = step(st, fr, n + 1)
            n += 1
            if n % 8 == 0:
                float(np.asarray(st[0].T_cur)[0, 0, 0])
        float(np.asarray(st[0].T_cur)[0, 0, 0])
        dt = time.perf_counter() - t0
        print(f"B={B:3d} [{MODE}]: {dt/n*1000:8.1f} ms/frame-batch, "
              f"aggregate {B*n/dt:8.1f} frames/s", flush=True)


if __name__ == "__main__":
    main()
