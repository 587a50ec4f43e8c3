"""End-to-end SLAM benchmark: frontend + BA frames/sec per chip.

Runs the full pipeline (GFTT detection, pyramidal LK, LM pose solve, keyframe
triangulation, Schur-complement BA) on a synthetic KITTI-scale stereo sequence
(620x188, the reference's 2x-downsampled input size, dataset.cpp:126-129) on
the default JAX backend (the real TPU under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no fps numbers (BASELINE.md), and its
g2o/Sophus/PCL deps are absent so the C++ binary cannot be built here.
Instead, its hot path IS a fixed set of OpenCV kernel calls, which we time
directly on this host at the reference's exact operating point
(benchmarks/reference_cpu_baseline.py): the resulting per-frame floor gives
an UPPER BOUND on the reference's achievable fps (the real pipeline adds the
g2o solves, map bookkeeping, I/O and Rerun logging on top). vs_baseline is
fps / that-upper-bound — i.e. a conservative speedup figure.

Measurement protocol (shaped by the axon runtime's two dispatch cliffs,
docs/PERFORMANCE.md):
  * the synthetic scene is rendered by a SUBPROCESS
    (benchmarks/render_scene.py) — the first device->host value readback in
    a process permanently degrades all subsequent dispatch ~30x, and
    converting render outputs to numpy is exactly such a readback;
  * the measured loop performs ZERO readbacks: stereo-init (including its
    retry decision) runs inside the fused device program, per-frame outputs
    stay on device, and both best-of-2 passes complete BEFORE any value is
    drained for the correctness guard.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    # persistent compilation cache: axon remote compiles take minutes for the
    # big SLAM programs; cache them across processes/rounds
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "/root/repo/tests")
    import synthetic

    from stereovision_slam_tpu.io.kitti import ArraySequenceDataset, StereoFrame
    from stereovision_slam_tpu.slam.config import SlamConfig
    from stereovision_slam_tpu.slam.fused import FusedVisualOdometry

    H, W = 188, 620
    T = 120
    # Render the scene in an ISOLATED SUBPROCESS (module docstring): reading
    # rendered frames back to numpy inside this process would trip the axon
    # readback cliff before the measurement starts.
    with tempfile.TemporaryDirectory() as tmp:
        scene = os.path.join(tmp, "scene.npz")
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "render_scene.py"),
             scene, str(T), str(H), str(W)],
            check=True, capture_output=True)
        data = np.load(scene)
        lefts = data["lefts"]
        rights = data["rights"]
    rig = synthetic.make_stereo_rig()

    cfg = SlamConfig()  # reference defaults: 150 features, window 10

    # dispatch-health probe: the number below should be ~0.02-0.05 ms on a
    # healthy axon runtime; >0.2 ms means the process is already degraded and
    # the measurement will under-report (logged to stderr for diagnosis)
    probe_x = jnp.ones((8, 128))
    probe_f = jax.jit(lambda v: v * 2 + 1)
    probe_f(probe_x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(50):
        y = probe_f(probe_x)
    y.block_until_ready()
    print(f"dispatch probe: {(time.perf_counter() - t0) / 50 * 1000:.3f} "
          "ms/op", file=sys.stderr)

    # Pre-stage the frames on the device: the benchmark measures per-chip
    # frontend+BA compute throughput. (Under the axon RPC tunnel each
    # host->device image upload costs ~0.45ms of host time — an artifact of
    # the tunnel, not the TPU's DMA path; the native prefetching loader +
    # FusedVisualOdometry(prefetch_depth=...) overlap uploads on real hosts.)
    dev_l = [jax.device_put(lefts[i]) for i in range(T)]
    dev_r = [jax.device_put(rights[i]) for i in range(T)]
    jax.block_until_ready((dev_l[-1], dev_r[-1]))

    class DeviceResidentDataset(ArraySequenceDataset):
        def frame_by_id(self, fid):
            if fid < 0 or fid >= T:
                return None
            return StereoFrame(frame_id=fid, left=dev_l[fid],
                               right=dev_r[fid])

    # fused streaming mode: the whole frame (pyramid + LK + pose solve +
    # stereo-init-with-retry + keyframe decision + triangulation + Schur BA)
    # is ONE device program, no per-frame host syncs and no readbacks.
    # Best-of-2 passes (the second reuses the compiled programs); both passes
    # run BEFORE any drain so neither is poisoned by readbacks.
    passes = []
    for _rep in range(2):
        ds = DeviceResidentDataset(lefts, rights, list(rig))
        vo = FusedVisualOdometry(cfg, ds)
        vo.initialize()

        # warmup: first steps compile/load the fused program (all branches)
        warmup = 6
        for _ in range(warmup):
            if not vo.step():
                break
        jax.block_until_ready(vo.fs.T_cur)

        t0 = time.perf_counter()
        n = 0
        while vo.step():
            n += 1
        jax.block_until_ready(vo.fs.T_cur)
        dt = time.perf_counter() - t0
        passes.append((n / dt if dt > 0 else 0.0, vo))

    fps = max(p[0] for p in passes)

    # correctness guard (AFTER timing — drain reads values back): a
    # fast-but-broken run must not produce a score
    for _, vo in passes:
        keyframes, landmarks, frames = vo.drain()
        n_in = np.array([int(f.n_inliers) for _, f in frames])
        assert len(keyframes) >= 2, f"only {len(keyframes)} keyframes"
        assert len(landmarks) > 50, f"only {len(landmarks)} landmarks"
        assert np.all(n_in[1:] > 10), f"tracking collapsed: {n_in.tolist()}"
        poses_arr = np.stack([pose for _, pose in keyframes.values()])
        assert np.all(np.isfinite(poses_arr)), "non-finite keyframe poses"

    # measured reference baseline: time the reference's own OpenCV hot-path
    # kernels on this host (see module docstring); fall back to the recorded
    # measurement if cv2 is unavailable at bench time
    from benchmarks import reference_cpu_baseline as refbase
    try:
        floor_ms, _ = refbase.measure_floor(lefts[0], lefts[1], rights[0])
        ref_fps_bound = 1000.0 / floor_ms
    except ImportError:
        ref_fps_bound = refbase.MEASURED_REFERENCE_FPS_UPPER_BOUND

    print(json.dumps({
        "metric": "frontend+BA frames/sec per chip (synthetic KITTI-scale 620x188)",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / ref_fps_bound, 3),
    }))


if __name__ == "__main__":
    main()
