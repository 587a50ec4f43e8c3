"""Similarity statistics behind the shared PlaceNet operating point
(slam/config.py PLACENET_LOOP_GATES): for each scene family (circuit /
figure-eight / 4-fold-aliased / straight corridor), the argmax-candidate
score distribution split by true/false revisit, plus weak-threshold counts.

Round-5 measurement (repo weights):
  circuit   true argmax med 1.000, false <= 0.361
  figure8   true argmax med 0.939 (min 0.46), false <= 0.564
  aliased   all false, max 0.613  -> strong 0.65 separates with margin
  straight  all false, med 0.833, weak>0.5 counts 32-64 -> max_weak 12
            suppresses the self-similar-corridor ambiguity

Run: python benchmarks/probe_loop_gates.py (CPU, ~4 min)
"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
import os
_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, "tests"))
import numpy as np
import jax.numpy as jnp
import synthetic
from stereovision_slam_tpu.models import place_net

params = place_net.get_params()
rig = synthetic.make_stereo_rig()


def embed_seq(lefts):
    return np.stack([np.asarray(place_net.embed_image(
        params, jnp.asarray(np.asarray(l)))) for l in lefts])


def center_yaw(gt):
    cen = np.stack([-p[:, :3].T @ p[:, 3] for p in gt])[:, [0, 2]]
    yaws = np.array([np.arctan2(-p[2, 0], p[2, 2]) for p in gt])
    return cen, yaws


def stats(name, lefts, poses, skip_frames=24):
    embs = embed_seq(lefts)
    gt = np.asarray(poses)
    cen, yaws = center_yaw(gt)
    T = len(embs)
    sims = embs @ embs.T
    rows = []
    for i in range(skip_frames + 1, T):
        js = sims[i, :i - skip_frames]
        j = int(np.argmax(js))
        d = np.linalg.norm(cen[i] - cen[j])
        dy = abs(np.angle(np.exp(1j * (yaws[i] - yaws[j]))))
        true = d < 2.0 and dy < np.deg2rad(20)
        nweak5 = int((js > 0.5).sum())
        nweak6 = int((js > 0.6).sum())
        rows.append((i, js[j], true, d, nweak5, nweak6))
    best_true = [r[1] for r in rows if r[2]]
    best_false = [r[1] for r in rows if not r[2]]
    w5_true = [r[4] for r in rows if r[2]]
    w5_false = [r[4] for r in rows if not r[2]]
    print(f"== {name} (T={T})")
    if best_true:
        print(f"  true argmax sims: min {min(best_true):.3f} "
              f"med {np.median(best_true):.3f} max {max(best_true):.3f} "
              f"n={len(best_true)}  weak>.5 count med {np.median(w5_true):.0f} max {max(w5_true)}")
    if best_false:
        print(f"  false argmax sims: med {np.median(best_false):.3f} "
              f"p90 {np.percentile(best_false, 90):.3f} "
              f"max {max(best_false):.3f} n={len(best_false)}"
              f"  weak>.5 count med {np.median(w5_false):.0f} max {max(w5_false)}")


# 1. bench circuit
T = 120
poses = synthetic.forward_motion_poses(T, 0.35, 2 * np.pi / (T - 8))
lefts, _ = synthetic.render_arena_stereo_sequence(
    poses, rig=rig, center=(0.0, 6.0), radius=25.0)
stats("circuit", lefts, poses)

# 2. figure-eight
T = 112
poses = synthetic.figure_eight_poses(T, step=0.5)
lefts, _ = synthetic.render_arena_stereo_sequence(
    poses, rig=rig, center=(0.0, 6.0), radius=25.0)
stats("figure8", lefts, poses)

# 3. aliased (3/4 arc, 4-fold wall) — all candidates false
T = 72
poses = synthetic.forward_motion_poses(T, 0.5, 2 * np.pi / 96)
lefts, _ = synthetic.render_arena_stereo_sequence(
    poses, rig=rig, center=(0.0, 6.0), radius=25.0, wall_symmetry=4)
stats("aliased", lefts, poses, skip_frames=15)

# 4. straight line (textured world, no revisit, OOD for PlaceNet)
T = 80
poses = synthetic.forward_motion_poses(T, 0.5, 0.0)
lefts, _ = synthetic.render_textured_stereo_sequence(poses, rig=rig)
stats("straight", lefts, poses, skip_frames=15)
