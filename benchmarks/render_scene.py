"""Render the synthetic benchmark scene to an .npz, in an isolated process.

Run as a SUBPROCESS by bench.py: the scene renderer uses the JAX CPU backend,
and converting its outputs to numpy is a device->host readback — on the axon
TPU runtime the first readback in a process permanently degrades every
subsequent dispatch ~30x (docs/PERFORMANCE.md "readback cliff"). Rendering in
a throwaway process keeps the benchmarking process's runtime pristine.

Usage: python benchmarks/render_scene.py OUT.npz T [H W] [scene]

`scene`: "forward" (default) — straight forward motion over a textured
ground plane; "circuit" — a closed circular trajectory inside a textured
cylindrical arena that revisits its starting views, exercising loop
closure + pose-graph optimization in the scored pipeline (VERDICT r2
next-round #5).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import synthetic  # noqa: E402


def main():
    out = sys.argv[1]
    T = int(sys.argv[2])
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 188
    W = int(sys.argv[4]) if len(sys.argv) > 4 else 620
    scene = sys.argv[5] if len(sys.argv) > 5 else "forward"
    rig = synthetic.make_stereo_rig()
    if scene == "figure8":
        # two same-heading revisits of the crossing pose (loop-closure
        # stress; tests/test_loop_scenes.py) — smooth yaw transitions
        step = 0.5
        poses = synthetic.figure_eight_poses(T, step=step)
        lefts, rights = synthetic.render_arena_stereo_sequence(
            poses, H=H, W=W, rig=rig, center=(0.0, 6.0), radius=25.0)
        dist = step * T
    elif scene == "aliased":
        # 4-fold symmetric wall: perceptual aliasing for pooled embedders
        step = 0.5
        poses = synthetic.forward_motion_poses(T, step=step,
                                               yaw_rate=2 * np.pi / (T + T // 3))
        lefts, rights = synthetic.render_arena_stereo_sequence(
            poses, H=H, W=W, rig=rig, center=(0.0, 6.0), radius=25.0,
            wall_symmetry=4)
        dist = step * T
    elif scene == "circuit":
        # closed loop: ~3 deg/frame yaw closes the circle in T frames (same
        # operating point as tests/test_fused_loop.py's arena circuit)
        step = 0.35
        poses = synthetic.forward_motion_poses(T, step=step,
                                               yaw_rate=2 * np.pi / (T - 8))
        lefts, rights = synthetic.render_arena_stereo_sequence(
            poses, H=H, W=W, rig=rig, center=(0.0, 6.0), radius=25.0)
        dist = step * T
    elif scene == "hard":
        # the circuit hardened toward real-sequence statistics: occluding
        # pillars, an independently moving sphere, per-frame exposure drift
        # + vignette + sensor noise + motion blur (VERDICT r4 #6)
        step = 0.35
        poses = synthetic.forward_motion_poses(T, step=step,
                                               yaw_rate=2 * np.pi / (T - 8))
        lefts, rights = synthetic.render_hard_arena_stereo_sequence(
            poses, H=H, W=W, rig=rig, center=(0.0, 6.0), radius=25.0)
        dist = step * T
    elif scene == "circuit_long":
        # multi-lap circuit for long-sequence throughput (VERDICT r4 #3: the
        # reference free-runs 1000-4500-frame KITTI sequences; fixed drain/
        # setup costs must amortize): the same circle driven T/112 times,
        # every lap a loop-closure opportunity
        step = 0.35
        poses = synthetic.forward_motion_poses(T, step=step,
                                               yaw_rate=2 * np.pi / 112)
        lefts, rights = synthetic.render_arena_stereo_sequence(
            poses, H=H, W=W, rig=rig, center=(0.0, 6.0), radius=25.0)
        dist = step * T
    else:
        step = 0.5
        poses = synthetic.forward_motion_poses(T, step=step, yaw_rate=0.0)
        lefts, rights = synthetic.render_textured_stereo_sequence(
            poses, H=H, W=W, rig=rig)
        dist = step * T
    np.savez(out,
             lefts=np.asarray(lefts, np.float32),
             rights=np.asarray(rights, np.float32),
             poses=np.asarray(poses, np.float32),
             dist=np.asarray(dist, np.float32))


if __name__ == "__main__":
    main()
