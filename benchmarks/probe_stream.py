"""How does per-frame cost scale with host sync cadence on the axon runtime?

Runs the fused streaming pipeline for T frames, forcing a tiny data-dependent
readback every M frames (M = sync cadence), and reports per-frame wall time
per cadence. Distinguishes
  * per-dispatch device cost (M=1: fully synchronous), from
  * queue-depth pathologies (large M slower than small M would indicate the
    runtime degrades when many dispatches are in flight).
Fresh process per run; argv[1] = comma-separated cadences (default 1,4,16,60).
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

    cadences = [int(v) for v in (sys.argv[1].split(",") if len(sys.argv) > 1
                                 else ["1", "4", "16", "60"])]
    print("backend:", jax.default_backend())
    H, W, T = 188, 620, 60
    rig = synthetic.make_stereo_rig()
    poses = synthetic.forward_motion_poses(T, step=0.5)
    lefts, rights = synthetic.render_textured_stereo_sequence(
        poses, H=H, W=W, rig=rig)
    lefts, rights = np.asarray(lefts), np.asarray(rights)
    cfg = SlamConfig()
    cfg.num_features = 250

    for cadence in cadences:
        vo = FusedVisualOdometry(cfg, ArraySequenceDataset(
            lefts, rights, list(rig)), prefetch_depth=0)
        vo.initialize()
        vo._queue = [(i, jnp.asarray(lefts[i]), jnp.asarray(rights[i]))
                     for i in range(T)]
        jax.block_until_ready(vo._queue[-1][1])
        vo.step()  # warmup/compile
        float(np.asarray(vo.fs.T_cur)[0, 0])
        t0 = time.perf_counter()
        n = 0
        while vo.step():
            n += 1
            if n % cadence == 0:
                float(np.asarray(vo.fs.T_cur)[0, 0])  # tiny readback sync
        float(np.asarray(vo.fs.T_cur)[0, 0])
        dt = time.perf_counter() - t0
        print(f"cadence {cadence:3d}: {dt/n*1000:8.1f} ms/frame "
              f"({n} frames in {dt:.1f} s)", flush=True)

    # block_until_ready honesty check at depth: if it waits properly, this
    # matches the readback-synced cadence-1 figure; if it returns early, it
    # will look implausibly fast
    vo = FusedVisualOdometry(cfg, ArraySequenceDataset(
        lefts, rights, list(rig)), prefetch_depth=0)
    vo.initialize()
    vo._queue = [(i, jnp.asarray(lefts[i]), jnp.asarray(rights[i]))
                 for i in range(T)]
    vo.step()
    jax.block_until_ready(vo.fs.T_cur)
    t0 = time.perf_counter()
    n = 0
    while vo.step():
        n += 1
        jax.block_until_ready(vo.fs.T_cur)
    dt = time.perf_counter() - t0
    print(f"block_until_ready every frame: {dt/n*1000:8.1f} ms/frame")


if __name__ == "__main__":
    main()
