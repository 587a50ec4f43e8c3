"""Readback-timed decomposition of the fused frame step on the real chip.

Times (a) a tracking-only frame, (b) a keyframe frame with and without BA,
(c) the window BA alone — each as its own jitted program, clock stopped by a
tiny data-dependent readback. Fresh process per run (cliffs are per-process).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    import synthetic
    from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
    from stereovision_slam_tpu.slam.config import SlamConfig
    from stereovision_slam_tpu.slam.fused import FusedVisualOdometry
    from stereovision_slam_tpu.slam import frontend as fe
    from stereovision_slam_tpu.slam.backend import optimize_window

    print("backend:", jax.default_backend())
    H, W, T = 188, 620, 24
    rig = synthetic.make_stereo_rig()
    poses = synthetic.forward_motion_poses(T, step=0.5)
    lefts, rights = synthetic.render_textured_stereo_sequence(
        poses, H=H, W=W, rig=rig)
    lefts, rights = np.asarray(lefts), np.asarray(rights)

    cfg = SlamConfig()
    cfg.num_features = 250

    # drive a real VO for a few frames to obtain a realistic mid-sequence
    # state (landmarks, window, archives)
    vo = FusedVisualOdometry(cfg, ArraySequenceDataset(lefts, rights,
                                                       list(rig)),
                             prefetch_depth=0)
    vo.initialize()
    vo._queue = [(i, jnp.asarray(lefts[i]), jnp.asarray(rights[i]))
                 for i in range(T)]
    for _ in range(10):
        vo.step()
    state = (vo.fs, vo.ms, vo.arc, vo.kf_count)
    state = jax.tree.map(lambda a: jnp.asarray(a).copy(), state)
    jax.block_until_ready(state)

    def timed(label, fn, *args, reps=3):
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(jax.tree.leaves(out)[-1]).ravel()[0])
            ts.append(time.perf_counter() - t0)
        print(f"{label:48s} {min(ts)*1000:9.1f} ms "
              f"({['%.0f' % (t*1000) for t in ts]})")

    left11 = jnp.asarray(lefts[11])
    right11 = jnp.asarray(rights[11])

    def step_with(backend_on, kf_threshold):
        from stereovision_slam_tpu.slam.fused import fused_step

        def f(fs, ms, arc, kfc, left, right):
            return fused_step(
                fs, ms, arc, kfc, left, right, jnp.asarray(11, jnp.int32),
                vo.cam_left, vo.cam_right,
                num_levels=cfg.lk_num_levels, num_features=cfg.num_features,
                min_distance=cfg.gftt_min_distance,
                quality_level=cfg.gftt_quality_level,
                max_depth=cfg.max_triangulation_depth,
                num_active=cfg.num_active_keyframes,
                kf_threshold=kf_threshold,
                bad_threshold=cfg.num_features_tracking_bad,
                chi2_th=cfg.chi2_th, backend_on=backend_on,
                ba_iters=cfg.ba_lm_iters,
                detector=cfg.keypoint_feature_detector.lower(),
                num_features_init=cfg.num_features_init,
                ba_max_active=cfg.ba_max_active_landmarks or None)
        return f

    # kf_threshold=0 -> never insert a keyframe; =9999 -> always insert
    for label, backend_on, kf_th in (
            ("fused step, tracking-only (no KF branch)", False, 0),
            ("fused step, KF insert, BA off", False, 9999),
            ("fused step, KF insert + window BA", True, 9999)):
        f = step_with(backend_on, kf_th)
        # fresh copies each call: fused_step donates its state args
        def run(left, right, f=f):
            st = jax.tree.map(lambda a: jnp.asarray(a).copy(), state)
            return f(*st, left, right)[4]
        timed(label, run, left11, right11)

    ms = state[1]

    def run_ba():
        m2 = jax.tree.map(lambda a: jnp.asarray(a).copy(), ms)
        return optimize_window(
            m2, vo.cam_left, vo.cam_right, iters=cfg.ba_lm_iters,
            chi2_th=cfg.chi2_th,
            max_active_landmarks=cfg.ba_max_active_landmarks)

    timed("window BA alone (10 LM iters)", run_ba)

    fs = state[0]
    timed("track_step alone (2x LK + multi-start solve)",
          lambda: fe.track_step(fs, ms, fs.pyr, vo.cam_left,
                                chi2_th=cfg.chi2_th)[1])
    timed("track_step mono single-start (ref-faithful)",
          lambda: fe.track_step(fs, ms, fs.pyr, vo.cam_left,
                                chi2_th=cfg.chi2_th, anchored=False,
                                multi_start=False)[1])

    from stereovision_slam_tpu.ops import gftt
    from stereovision_slam_tpu.slam.pose_solver import solve_pose_multi
    from stereovision_slam_tpu.geometry import se3

    img = jnp.asarray(lefts[11])
    timed("GFTT detect (min-eig + NMS + top-k)",
          jax.jit(lambda im: gftt.detect(im, max_corners=cfg.num_features,
                                         min_distance=cfg.gftt_min_distance,
                                         quality_level=cfg.gftt_quality_level)),
          img)

    # pose solve alone at the track_step operating point (512 obs, 3 starts)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-10, 10, (512, 3)).astype(np.float32) +
                      np.array([0, 0, 20], np.float32))
    T0 = se3.se3_identity(jnp.float32)
    from stereovision_slam_tpu.geometry import jacobians
    obs, _ = jacobians.project_points(vo.cam_left, T0, pts)
    valid = jnp.ones(512, bool)
    T_inits = jnp.stack([T0, T0, T0])
    timed("solve_pose_multi (3 starts x 4 rounds x 10 iters)",
          jax.jit(lambda ti, p, o, v: solve_pose_multi(
              vo.cam_left, ti, p, o, v, chi2_th=cfg.chi2_th)[0]),
          T_inits, pts, obs, valid)


if __name__ == "__main__":
    main()
