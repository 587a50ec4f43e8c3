"""Capture a jax.profiler trace of fused steps on the real chip.

Renders the scene in a subprocess (fast CPU render), runs a few fused steps,
profiles three of them, and prints the top device ops by total duration.

Usage: python benchmarks/profile_step.py [batch_B] [outdir]
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    import synthetic
    from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
    from stereovision_slam_tpu.slam.config import SlamConfig

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fstrace"
    print("backend:", jax.default_backend(), "B:", B, flush=True)
    T = 16
    with tempfile.TemporaryDirectory() as tmp:
        scene = os.path.join(tmp, "scene.npz")
        subprocess.run([sys.executable,
                        "/root/repo/benchmarks/render_scene.py",
                        scene, str(T)], check=True, capture_output=True)
        data = np.load(scene)
        lefts, rights = data["lefts"], data["rights"]
    rig = synthetic.make_stereo_rig()
    cfg = SlamConfig()
    cfg.num_features = 250

    if B == 0:
        from stereovision_slam_tpu.slam.fused import FusedVisualOdometry
        vo = FusedVisualOdometry(cfg, ArraySequenceDataset(
            lefts, rights, list(rig)), prefetch_depth=0)
        vo.initialize()
        vo._queue = [(i, jnp.asarray(lefts[i]), jnp.asarray(rights[i]))
                     for i in range(T)]
        for _ in range(8):
            vo.step()
        float(np.asarray(vo.fs.T_cur)[0, 0])
        print("warm; tracing", flush=True)
        with jax.profiler.trace(outdir):
            for _ in range(3):
                vo.step()
            float(np.asarray(vo.fs.T_cur)[0, 0])
    else:
        from stereovision_slam_tpu.slam.batched import (
            BatchedFusedVisualOdometry, batched_fused_step)
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
        st = (vo.fs, vo.ms, vo.arc, vo.kf_count)
        for fr in frames_dev[:4]:
            st = batched_fused_step(*st, *fr, vo.cam_left, vo.cam_right,
                                    **statics)[:4]
        float(np.asarray(st[0].T_cur)[0, 0, 0])
        print("warm; tracing", flush=True)
        with jax.profiler.trace(outdir):
            for fr in frames_dev[4:7]:
                st = batched_fused_step(*st, *fr, vo.cam_left,
                                        vo.cam_right, **statics)[:4]
            float(np.asarray(st[0].T_cur)[0, 0, 0])
    print("captured", flush=True)
    report(outdir)


def report(outdir):
    p = sorted(glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    ev = json.load(gzip.open(p))["traceEvents"]
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"]["name"]
    print("processes:", pids, flush=True)
    durs = {}
    for e in ev:
        pname = str(pids.get(e.get("pid"), ""))
        if e.get("ph") == "X" and ("TPU" in pname or "/device" in pname.lower()):
            durs.setdefault(e["name"], [0, 0])
            durs[e["name"]][0] += e.get("dur", 0)
            durs[e["name"]][1] += 1
    top = sorted(durs.items(), key=lambda kv: -kv[1][0])[:25]
    for name, (d, c) in top:
        print(f"{d/1000:9.2f} ms  x{c:4d}  {name[:100]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "report":
        report(sys.argv[2])
    else:
        main()
