#!/usr/bin/env python
"""Stereo visual SLAM CLI.

Equivalent of the reference app
(/root/reference/app/run_stereo_vision_SLAM.cpp): argv[1] is a YAML config
path (reference-format keys), defaulting to configs/default.yaml.

Beyond the reference: --platform cpu|tpu backend override,
--checkpoint-every N (save full SLAM state every N frames, any mode),
--resume PATH (continue a checkpointed run exactly where it stopped), and
--mode classic|fused|scan|unrolled:
  classic  — the reference's interactive topology (viewer, loop closure,
             per-frame status readback); the default;
  fused    — maximum-throughput streaming: stereo-init + tracking + BA (and,
             with loopclosure_on, the full device-side loop-closure state
             machine + shutdown PGO) as one zero-readback device program per
             frame;
  scan     — fused semantics, one `lax.scan` device dispatch per 32-frame
             chunk (recorded sequences / slow host links);
  unrolled — fused semantics, one UNROLLED device dispatch per 8-frame chunk.
             A hedge for hosts where per-dispatch cost dominates; NOT
             recommended on the axon runtime, where it measured pathological
             under dispatch floods (docs/PERFORMANCE.md "Dispatch
             topologies").
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = list(sys.argv[1:])
    # --platform cpu|tpu: the axon TPU plugin ignores the JAX_PLATFORMS env
    # var, so an explicit jax.config.update is the only reliable override
    if "--platform" in args:
        i = args.index("--platform")
        platform = args[i + 1]
        del args[i:i + 2]
        import jax
        jax.config.update("jax_platforms", platform)
    mode = "classic"
    if "--mode" in args:
        i = args.index("--mode")
        mode = args[i + 1]
        del args[i:i + 2]
        if mode not in ("classic", "fused", "scan", "unrolled"):
            print(f"Unknown --mode {mode}; "
                  "expected classic|fused|scan|unrolled")
            return 1
    checkpoint_every, resume_path = 0, None
    if "--checkpoint-every" in args:
        i = args.index("--checkpoint-every")
        checkpoint_every = int(args[i + 1])
        del args[i:i + 2]
    if "--resume" in args:
        i = args.index("--resume")
        resume_path = args[i + 1]
        del args[i:i + 2]
    config_path = (args[0] if args else
                   os.path.join(os.path.dirname(__file__), "..", "configs",
                                "default.yaml"))
    sys.argv = [sys.argv[0]] + args
    if len(sys.argv) <= 1:
        print("No config file specified; using default config "
              f"{config_path}")
    if not os.path.exists(config_path):
        print(f"Config file not found: {config_path}")
        return 1

    from stereovision_slam_tpu.io.kitti import KittiDataset
    from stereovision_slam_tpu.slam.backend import Backend
    from stereovision_slam_tpu.slam.config import SlamConfig
    from stereovision_slam_tpu.slam.loop_closure import LoopClosure
    from stereovision_slam_tpu.slam.pipeline import VisualOdometry
    from stereovision_slam_tpu.viz.viewer import Viewer

    cfg = SlamConfig.from_yaml(config_path)
    dataset = KittiDataset(cfg.dataset_dir, cfg.left_cam_index,
                           cfg.right_cam_index, bool(cfg.is_color_input))
    dataset.initialize()

    if mode in ("fused", "scan", "unrolled"):
        import time

        import numpy as np

        from stereovision_slam_tpu.slam import outputs as out_mod
        from stereovision_slam_tpu.slam.fused import (FusedVisualOdometry,
                                                      ScanVisualOdometry,
                                                      UnrolledVisualOdometry)
        if mode == "fused" and cfg.loopclosure_on:
            # device-side loop closure (slam/fused_loop.py): the whole
            # loop-closure state machine runs inside the per-frame program
            from stereovision_slam_tpu.slam.fused_loop import \
                FusedLoopVisualOdometry
            vo = FusedLoopVisualOdometry(
                cfg, dataset, mnv2_weights_path=cfg.dnn_weights_path)
            if vo.mnv2_params is None:
                # no MobileNet artifact: deploy the in-repo-trained PlaceNet
                # embedder (falls through to the thumbnail if its weights
                # artifact is also absent) — models/place_net.py
                from stereovision_slam_tpu.models import place_net
                vo.mnv2_params = place_net.get_params()
        else:
            cls = {"fused": FusedVisualOdometry, "scan": ScanVisualOdometry,
                   "unrolled": UnrolledVisualOdometry}[mode]
            vo = cls(cfg, dataset)
        vo.initialize()
        if resume_path:
            from stereovision_slam_tpu.slam.checkpoint import \
                load_fused_checkpoint
            load_fused_checkpoint(vo, resume_path)
            print(f"Resumed from {resume_path} "
                  f"({len(vo.outputs)} frames already processed)")
        t0 = time.perf_counter()
        if checkpoint_every > 0:
            from stereovision_slam_tpu.slam.checkpoint import \
                save_fused_checkpoint
            ckpt_path = os.path.join(cfg.output_dir or ".",
                                     "slam_checkpoint.npz")
            os.makedirs(os.path.dirname(ckpt_path) or ".", exist_ok=True)
            n = 0
            while vo.step():
                n += 1
                if n % checkpoint_every == 0:
                    save_fused_checkpoint(vo, ckpt_path)
            import jax
            jax.block_until_ready(vo.fs.T_cur)
        else:
            vo.run()
        dt = time.perf_counter() - t0
        if (hasattr(vo, "run_pgo")
                and int(cfg.global_pose_graph_optimization)):
            pgo_traj = vo.run_pgo()
            n_loops = len(vo.loop_edges())
            print(f"Loop closure: {n_loops} loop(s) closed"
                  + (", global PGO applied" if n_loops else ""))
            if n_loops:
                keyframes, landmarks, frames = vo.drain()
                kfs = [(fid, pgo_traj[fid])
                       for fid, _ in keyframes.values()]
                lms_d = getattr(vo, "_pgo_landmarks", None) or landmarks
                import numpy as np
                lms = (np.stack(list(lms_d.values()))
                       if lms_d else np.zeros((0, 3), np.float32))
                from stereovision_slam_tpu.slam import outputs as out_mod
                out = out_mod.save_slam_output(
                    cfg.output_dir, cfg.dataset_dir, cfg.left_cam_index,
                    kfs, lms)
                print(f"SLAM finished ({mode}+loop): {len(keyframes)} "
                      f"keyframes, {len(lms_d)} landmarks, "
                      f"{len(frames) / dt:.2f} frames/s")
                print(f"Output saved to {out}")
                return 0
        keyframes, landmarks, frames = vo.drain()
        kfs = [(fid, pose) for fid, pose in keyframes.values()]
        lms = (np.stack(list(landmarks.values()))
               if landmarks else np.zeros((0, 3), np.float32))
        out = out_mod.save_slam_output(cfg.output_dir, cfg.dataset_dir,
                                       cfg.left_cam_index, kfs, lms)
        print(f"SLAM finished ({mode}): {len(keyframes)} keyframes, "
              f"{len(landmarks)} landmarks, {len(frames) / dt:.2f} frames/s")
        print(f"Output saved to {out}")
        return 0

    backend = Backend(chi2_th=cfg.chi2_th, iters=cfg.ba_lm_iters,
                      outlier_rounds=cfg.ba_outlier_rounds) \
        if cfg.backend_on else None
    viewer = Viewer() if cfg.visualizer_on else None
    vo = VisualOdometry(cfg, dataset, viewer=viewer, backend=backend)
    vo.initialize()
    if cfg.loopclosure_on:
        vo.loop_closure = LoopClosure(
            cfg, vo.cam_left, mnv2_weights_path=cfg.dnn_weights_path)

    if resume_path:
        from stereovision_slam_tpu.slam.checkpoint import load_checkpoint
        load_checkpoint(vo, resume_path)
        print(f"Resumed from {resume_path} at frame {vo.frame_count}")

    if checkpoint_every > 0:
        from stereovision_slam_tpu.slam.checkpoint import save_checkpoint
        ckpt_path = os.path.join(cfg.output_dir or ".", "slam_checkpoint.npz")
        os.makedirs(os.path.dirname(ckpt_path) or ".", exist_ok=True)
        n = 0
        while vo.step():
            n += 1
            if n % checkpoint_every == 0:
                save_checkpoint(vo, ckpt_path)
        vo.finish()
    else:
        vo.run()
    out = vo.save_output()
    print(f"SLAM finished: {len(vo.archived_keyframes)} keyframes, "
          f"{len(vo.archived_landmarks)} landmarks, {vo.fps():.2f} frames/s")
    print(f"Output saved to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
