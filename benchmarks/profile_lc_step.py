"""Profile the bench configuration's fused loop-closure step on the chip:
trace tracked frames and keyframe frames separately and print top device ops.

Usage: python benchmarks/profile_lc_step.py [outdir]
"""

import glob
import gzip
import json
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
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np

    import synthetic
    from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
    from stereovision_slam_tpu.slam.config import SlamConfig
    from stereovision_slam_tpu.slam.fused_loop import FusedLoopVisualOdometry

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lctrace"
    print("backend:", jax.default_backend(), flush=True)
    T = 48
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
    cfg.keyframes_to_skip_in_candidate_search = 12
    cfg.potential_loop_strong_threshold = 0.52
    cfg.potential_loop_weak_threshold = 0.45
    cfg.max_num_weak_threshold = 100
    cfg.min_num_acceptable_keypoint_match = 10
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
    for _ in range(12):
        vo.step()
    float(np.asarray(vo.fs.T_cur)[0, 0])
    # per-frame wall time + kf indicator for the next frames (steady state)
    times, kfs = [], []
    for _ in range(16):
        t0 = time.perf_counter()
        vo.step()
        float(np.asarray(vo.fs.T_cur)[0, 0])   # hard sync per frame
        times.append(time.perf_counter() - t0)
        kfs.append(bool(np.asarray(
            vo.out_buf.kf_inserted[len(vo._fids) - 1])))
    for t, k in zip(times, kfs):
        print(f"  {'KF ' if k else '   '} {t*1000:7.1f} ms", flush=True)
    tr = [t for t, k in zip(times, kfs) if not k]
    kf = [t for t, k in zip(times, kfs) if k]
    if tr:
        print(f"tracked median: {sorted(tr)[len(tr)//2]*1000:.1f} ms")
    if kf:
        print(f"keyframe median: {sorted(kf)[len(kf)//2]*1000:.1f} ms")
    print("tracing", flush=True)
    with jax.profiler.trace(outdir):
        for _ in range(6):
            vo.step()
        float(np.asarray(vo.fs.T_cur)[0, 0])
    print("captured", flush=True)
    report(outdir)


def report(outdir):
    p = sorted(glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    ev = json.load(gzip.open(p))["traceEvents"]
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"]["name"]
    durs = {}
    for e in ev:
        pname = str(pids.get(e.get("pid"), ""))
        if e.get("ph") == "X" and ("TPU" in pname or "/device" in pname.lower()):
            durs.setdefault(e["name"], [0, 0])
            durs[e["name"]][0] += e.get("dur", 0)
            durs[e["name"]][1] += 1
    top = sorted(durs.items(), key=lambda kv: -kv[1][0])[:30]
    for name, (d, c) in top:
        print(f"{d/1000:9.2f} ms  x{c:4d}  {name[:110]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "report":
        report(sys.argv[2] if len(sys.argv) > 2 else "/tmp/lctrace")
    else:
        main()
