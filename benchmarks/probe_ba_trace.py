"""Device-trace optimize_window alone and attribute top ops via the HLO dump.

Run fresh: python benchmarks/probe_ba_trace.py
"""

import glob
import gzip
import json
import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")




def main():
    import jax
    # no persistent cache: we need a fresh compile so the dump is emitted
    import jax.numpy as jnp
    import numpy as np

    import synthetic
    from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
    from stereovision_slam_tpu.slam import backend as be
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
    vo = FusedLoopVisualOdometry(cfg, ArraySequenceDataset(
        lefts, rights, list(rig)), prefetch_depth=0,
        max_total_keyframes=512, max_total_landmarks=1 << 16)
    vo.initialize()
    vo._queue = [(i, jnp.asarray(lefts[i]), jnp.asarray(rights[i]))
                 for i in range(T)]
    for _ in range(10):
        vo.step()
    ms = vo.ms
    cam_left, cam_right = vo.cam_left, vo.cam_right
    float(np.asarray(ms.kf_pose)[0, 0, 0])

    def ba(ms):
        ms2, _ = be.optimize_window(ms, cam_left, cam_right,
                                    chi2_th=cfg.chi2_th, iters=6,
                                    max_active_landmarks=1024)
        return ms2

    import functools
    jitted = jax.jit(ba)
    hlo_text = jitted.lower(ms).compile().as_text()
    open("/tmp/ba_hlo.txt", "w").write(hlo_text)
    print("hlo dumped:", len(hlo_text), "chars", flush=True)
    out = jitted(ms)
    jax.block_until_ready(out.kf_pose)
    with jax.profiler.trace("/tmp/batrace"):
        o = ms
        for _ in range(8):
            o = jitted(o)
        jax.block_until_ready(o.kf_pose)
    print("traced", flush=True)

    # --- map fusion names to HLO via the dump ---
    hlo_ops = {}
    for line in open("/tmp/ba_hlo.txt"):
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ([^\n]{0,200})", line)
        if m:
            hlo_ops[m.group(1)] = m.group(2)

    p = sorted(glob.glob("/tmp/batrace/plugins/profile/*/*.trace.json.gz"))[-1]
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
    top = sorted(durs.items(), key=lambda kv: -kv[1][0])[:40]
    for name, (d, c) in top:
        base = name.split("/")[-1]
        hlo = hlo_ops.get(base, hlo_ops.get(base.replace("%", ""), ""))
        print(f"{d/1000:8.2f} ms x{c:5d}  {base[:40]:40s} {hlo[:90]}")


if __name__ == "__main__":
    main()
