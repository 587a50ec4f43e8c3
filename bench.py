"""End-to-end SLAM benchmark: frontend + BA frames/sec per chip.

Runs the full pipeline (GFTT detection, pyramidal LK, LM pose solve, keyframe
triangulation, Schur-complement BA) on a synthetic KITTI-scale stereo sequence
(620x188, the reference's 2x-downsampled input size, dataset.cpp:126-129) on
the default JAX backend (the real TPU under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no fps numbers (BASELINE.md); its per-frame
wall-clock logging on a desktop CPU corresponds to roughly real-time (~10 fps)
operation on KITTI. vs_baseline is therefore fps / 10.0 until the C++
reference can be measured directly.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "/root/repo/tests")
    import synthetic

    from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
    from stereovision_slam_tpu.slam.backend import Backend
    from stereovision_slam_tpu.slam.config import SlamConfig
    from stereovision_slam_tpu.slam.pipeline import VisualOdometry

    H, W = 188, 620
    T = 40
    key = jax.random.PRNGKey(0)
    rig = synthetic.make_stereo_rig()
    poses = synthetic.forward_motion_poses(T, step=0.6, yaw_rate=0.008)
    k1, k2, k3 = jax.random.split(key, 3)
    lms = jnp.concatenate([
        synthetic.random_landmarks(k1, 120, z_range=(5, 50)),
        synthetic.random_landmarks(k2, 100, z_range=(15, 60)) + jnp.array([0., 0., 10.]),
        synthetic.random_landmarks(k3, 100, z_range=(25, 70)) + jnp.array([0., 0., 20.]),
    ])
    lefts, rights = synthetic.render_stereo_sequence(key, poses, lms, H=H, W=W,
                                                     rig=rig)
    lefts = np.asarray(lefts)
    rights = np.asarray(rights)

    cfg = SlamConfig()  # reference defaults: 150 features, window 10
    ds = ArraySequenceDataset(lefts, rights, list(rig))
    vo = VisualOdometry(cfg, ds, backend=Backend(chi2_th=cfg.chi2_th))
    vo.initialize()

    # warmup: first frames trigger compilation of all three programs
    warmup = 6
    for _ in range(warmup):
        if not vo.step():
            break

    t0 = time.perf_counter()
    n = 0
    while vo.step():
        n += 1
    jax.block_until_ready(vo.fs.T_cur)
    dt = time.perf_counter() - t0

    fps = n / dt if dt > 0 else 0.0
    print(json.dumps({
        "metric": "frontend+BA frames/sec per chip (synthetic KITTI-scale 620x188)",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
