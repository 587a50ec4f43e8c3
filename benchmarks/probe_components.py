"""Slope-timed per-component attribution of the fused SLAM step.

Each component is timed as the SLOPE between KR=4 and KR=68 in-jit
repetitions (fori_loop, inputs perturbed per-iteration so XLA cannot hoist
the body; outputs folded into a scalar carry) — the ~24 ms tunnel RTT and
per-dispatch overhead cancel in the difference. This replaces the round-3
attribution, which was polluted by RTT (a trivial kernel "costs" ~790 us
when a single dispatch+readback is divided by 32 reps).

Run fresh: python benchmarks/probe_components.py
"""

import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    import synthetic
    from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
    from stereovision_slam_tpu.ops import image as imops
    from stereovision_slam_tpu.ops import lk
    from stereovision_slam_tpu.slam import frontend as fe
    from stereovision_slam_tpu.slam.backend import optimize_window
    from stereovision_slam_tpu.slam.config import SlamConfig
    from stereovision_slam_tpu.slam.fused_loop import FusedLoopVisualOdometry

    print("backend:", jax.default_backend(), flush=True)
    T = 24
    with tempfile.TemporaryDirectory() as tmp:
        scene = os.path.join(tmp, "scene.npz")
        subprocess.run([sys.executable,
                        "/root/repo/benchmarks/render_scene.py",
                        scene, str(T), "188", "620", "circuit"],
                       check=True, capture_output=True)
        data = np.load(scene)
        lefts, rights = data["lefts"], data["rights"]
    rig = synthetic.make_stereo_rig()
    cfg = SlamConfig()
    cfg.num_features = 250
    cfg.num_features_needed_for_keyframe = 160
    cfg.lk_max_iters = 12
    cfg.pose_rounds = 3
    cfg.pose_iters_per_round = 6
    cfg.ba_lm_iters = 6

    vo = FusedLoopVisualOdometry(cfg, ArraySequenceDataset(
        lefts, rights, list(rig)), prefetch_depth=0,
        max_total_keyframes=512, max_total_landmarks=1 << 16)
    vo.initialize()
    vo._queue = [(i, jnp.asarray(lefts[i]), jnp.asarray(rights[i]))
                 for i in range(T)]
    for _ in range(10):
        vo.step()
    fs, ms = vo.fs, vo.ms
    cam_left, cam_right = vo.cam_left, vo.cam_right
    float(np.asarray(fs.T_cur)[0, 0])
    left = jnp.asarray(lefts[10])
    right = jnp.asarray(rights[10])

    def slope(label, step_fn, *args):
        """step_fn(i, *args) -> scalar contribution; timed via KR slope."""
        ts = {}
        for KR in (4, 68):
            @jax.jit
            def reps(*a):
                return lax.fori_loop(
                    0, KR, lambda i, acc: acc + step_fn(i, *a),
                    jnp.float32(0.0))
            out = reps(*args)
            float(np.asarray(out))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(reps(*args)))
                best = min(best, time.perf_counter() - t0)
            ts[KR] = best
        per = (ts[68] - ts[4]) / 64
        print(f"{label:46s} {per*1e3:9.3f} ms", flush=True)
        return per

    eps = 1e-6

    def pyr_step(i, left, right):
        both = imops.build_pyramid_batched(
            jnp.stack([left + i * eps, right]), cfg.lk_num_levels)
        return both[-1][0, 0, 0]
    t_pyr = slope("pyramids (left+right, 4 levels)", pyr_step, left, right)

    both = imops.build_pyramid_batched(jnp.stack([left, right]),
                                       cfg.lk_num_levels)
    pyr = tuple(lv[0] for lv in both)
    right_pyr = tuple(lv[1] for lv in both)

    def lk_step(i, fs, pyr):
        pts = fs.feat_uv + i * eps
        out, ok = lk.track(list(fs.pyr), list(pyr), pts, pts,
                           max_iters=12, mask=fs.feat_valid)
        return out[0, 0] + jnp.sum(ok) * 0.0
    t_lk = slope("lk.track 256 pts (single program)", lk_step, fs, pyr)

    def track_step_c(i, fs, ms, pyr, right_pyr):
        fs2, n_in, n_tr = fe.track_step(
            fs._replace(T_cur=fs.T_cur + i * eps), ms, pyr, cam_left,
            right_pyr, cam_right, chi2_th=cfg.chi2_th, rounds=3, iters=6,
            lk_iters=12)
        return fs2.T_cur[0, 0] + n_in.astype(jnp.float32)
    t_track = slope("track_step (2 LK + LM pose solve)", track_step_c,
                    fs, ms, pyr, right_pyr)

    def kf_step_c(i, fs, ms, pyr, right_pyr):
        fs1 = fs._replace(T_cur=fs.T_cur + i * eps, pyr=pyr, ref_pyr=pyr)
        fs2, ms2, ev, n_new, n_r = fe.keyframe_step(
            fs1, ms, right_pyr, cam_left, cam_right,
            jnp.int32(10), jnp.int32(5),
            num_features=cfg.num_features,
            min_distance=cfg.gftt_min_distance,
            quality_level=cfg.gftt_quality_level,
            max_depth=cfg.max_triangulation_depth,
            num_active=cfg.num_active_keyframes,
            lk_iters=12)
        return fs2.T_cur[0, 0] + n_new.astype(jnp.float32)
    t_kf = slope("keyframe_step (detect+LK right+triang+insert)",
                 kf_step_c, fs, ms, pyr, right_pyr)

    def ba_step(i, ms):
        ms2, _ = optimize_window(
            ms._replace(kf_pose=ms.kf_pose.at[0, 0, 3].add(i * eps)),
            cam_left, cam_right, chi2_th=cfg.chi2_th, iters=6,
            max_active_landmarks=1024)
        return ms2.kf_pose[0, 0, 0]
    t_ba = slope("optimize_window (Schur BA, 6 LM iters)", ba_step, ms)

    hook = vo._hook_fn if hasattr(vo, "_hook_fn") else None
    print("---", flush=True)
    total_kf = t_pyr + t_track + t_kf + t_ba
    print(f"tracked frame (pyr+track):        {(t_pyr+t_track)*1e3:7.3f} ms")
    print(f"keyframe frame (pyr+track+kf+ba): {total_kf*1e3:7.3f} ms "
          f"(+ loop hook, not timed here)", flush=True)


if __name__ == "__main__":
    main()
