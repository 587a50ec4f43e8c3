"""Readback-timed BA cost vs its knobs (iters, outlier rounds, compaction)."""

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
    vo = FusedVisualOdometry(cfg, ArraySequenceDataset(lefts, rights,
                                                       list(rig)),
                             prefetch_depth=0)
    vo.initialize()
    vo._queue = [(i, jnp.asarray(lefts[i]), jnp.asarray(rights[i]))
                 for i in range(T)]
    for _ in range(12):
        vo.step()
    ms = jax.tree.map(lambda a: jnp.asarray(a).copy(), vo.ms)
    jax.block_until_ready(ms)

    def timed(label, fn, reps=3):
        out = fn()
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            float(np.asarray(jax.tree.leaves(out)[-1]).ravel()[0])
            ts.append(time.perf_counter() - t0)
        print(f"{label:52s} {min(ts)*1000:9.1f} ms", flush=True)

    for label, kw in (
        ("BA iters=10 rounds=5 La=1024 (default)", dict()),
        ("BA iters=1  rounds=5 La=1024", dict(iters=1)),
        ("BA iters=10 rounds=1 La=1024", dict(outlier_rounds=1)),
        ("BA iters=1  rounds=1 La=1024", dict(iters=1, outlier_rounds=1)),
        ("BA iters=10 rounds=5 La=256", dict(max_active_landmarks=256)),
        ("BA iters=10 rounds=5 uncompacted", dict(max_active_landmarks=0)),
    ):
        base = dict(iters=10, outlier_rounds=5, max_active_landmarks=1024)
        base.update(kw)

        def run(base=base):
            m2 = jax.tree.map(lambda a: jnp.asarray(a).copy(), ms)
            return optimize_window(
                m2, vo.cam_left, vo.cam_right, chi2_th=cfg.chi2_th,
                iters=base["iters"], outlier_rounds=base["outlier_rounds"],
                max_active_landmarks=base["max_active_landmarks"] or None)
        timed(label, run)


if __name__ == "__main__":
    main()
