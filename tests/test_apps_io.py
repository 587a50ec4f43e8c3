"""CLI apps + KITTI loader + viewer fallback, driven on a fabricated dataset."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from stereovision_slam_tpu.geometry import se3
from tests import synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


pytestmark = pytest.mark.slow  # >30 s e2e; -m "not slow" for the quick suite


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    """Fabricate a mini KITTI sequence from the synthetic renderer."""
    root = tmp_path_factory.mktemp("kitti") / "sequences" / "99"
    (root / "image_0").mkdir(parents=True)
    (root / "image_1").mkdir(parents=True)
    # calib: fx 520, cx 320, cy 92 at FULL resolution (loader halves it),
    # right camera baseline 0.54m -> P1 tx = -fx * b
    fx, cx, cy, b = 520.0, 320.0, 92.0, 0.54
    rows = []
    for i in range(4):
        tx = -fx * b if i % 2 == 1 else 0.0
        rows.append(f"P{i}: {fx} 0 {cx} {tx} 0 {fx} {cy} 0 0 0 1 0")
    (root / "calib.txt").write_text("\n".join(rows) + "\n")

    H, W = 184, 640  # full-res; halved to 92x320 by the loader
    rig = synthetic.make_stereo_rig(fx=fx / 2, fy=fx / 2, cx=cx / 2,
                                    cy=cy / 2, baseline=b)
    poses = synthetic.forward_motion_poses(8, step=0.5)
    lms = jnp.concatenate([
        synthetic.random_landmarks(jax.random.PRNGKey(0), 60,
                                   y_range=(-3, 3), z_range=(4, 35)),
        synthetic.random_landmarks(jax.random.PRNGKey(1), 40,
                                   y_range=(-3, 3), z_range=(8, 40)),
    ])
    lefts, rights = synthetic.render_stereo_sequence(
        jax.random.PRNGKey(2), poses, lms, H=H // 2, W=W // 2, rig=rig)
    for i in range(poses.shape[0]):
        for sub, img in (("image_0", lefts[i]), ("image_1", rights[i])):
            # upsample back to "full" resolution (the loader decimates 2x)
            big = np.asarray(jax.image.resize(img, (H, W), "nearest"))
            Image.fromarray(big.astype(np.uint8), "L").save(
                root / sub / f"{i:06d}.png")
    return root, poses


def test_kitti_loader(kitti_dir):
    from stereovision_slam_tpu.io.kitti import KittiDataset
    root, _ = kitti_dir
    ds = KittiDataset(str(root))
    ds.initialize()
    assert len(ds.cameras) == 4
    cam_l, cam_r = ds.get_camera(0), ds.get_camera(1)
    np.testing.assert_allclose(float(cam_l.fx), 260.0, rtol=1e-5)  # halved
    np.testing.assert_allclose(float(cam_r.baseline), 0.54, rtol=1e-4)
    # extrinsic translation = K^-1 p4 (not halved: world-scale meters)
    np.testing.assert_allclose(float(cam_r.pose[0, 3]), -0.54, rtol=1e-4)
    f = ds.next_frame()
    assert f.frame_id == 0 and f.left.shape == (92, 320)
    n = 1
    while ds.next_frame() is not None:
        n += 1
    assert n == 8


def test_run_slam_cli(kitti_dir, tmp_path):
    root, poses = kitti_dir
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    cfg = f"""
dataset_dir: {root}
left_cam_index: 0
right_cam_index: 1
is_color_input: 0
output_dir: {out_dir}
num_features: 60
num_features_init: 15
num_features_tracking: 20
num_features_tracking_bad: 8
num_features_needed_for_keyframe: 50
max_triangulation_depth: 300.0
num_active_keyframes: 5
backend_on: 1
chi2_th: 5.991
loopclosure_on: 0
visualizer_on: 0
"""
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(cfg)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "apps", "run_slam.py"),
         str(cfg_path)],
        capture_output=True, text=True, timeout=400, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SLAM finished" in proc.stdout
    runs = list(out_dir.iterdir())
    assert len(runs) == 1
    assert (runs[0] / "keyframes.txt").exists()
    assert (runs[0] / "landmarks.pcd").exists()


def test_viewer_jsonl_fallback(tmp_path):
    from stereovision_slam_tpu.viz.viewer import Viewer, _HAS_RERUN
    if _HAS_RERUN:
        pytest.skip("rerun installed; fallback path not active")
    path = tmp_path / "viz.jsonl"
    v = Viewer(jsonl_path=str(path))
    v.log_info("hello", "frontend")
    v.plot("plots/frontend_inlier_ratio", 0.5, 3)
    v.close()
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["event"] == "log" and lines[0]["component"] == "frontend"
    assert lines[1]["event"] == "plot" and lines[1]["value"] == 0.5


def test_config_yaml_roundtrip(tmp_path):
    from stereovision_slam_tpu.slam.config import SlamConfig
    # OpenCV-style directive line must be tolerated
    p = tmp_path / "c.yaml"
    p.write_text("%YAML:1.0\nnum_features: 99\nchi2_th: 4.0\n"
                 "keypoint_feature_detector: GFTT\n")
    cfg = SlamConfig.from_yaml(str(p))
    assert cfg.num_features == 99
    assert cfg.chi2_th == 4.0
    # reference config files parse
    ref = SlamConfig.from_yaml(os.path.join(REPO, "configs", "config-00.yaml"))
    assert ref.min_num_acceptable_keypoint_match == 20


def test_all_sequence_configs_parse():
    from stereovision_slam_tpu.slam.config import SlamConfig
    import glob
    paths = sorted(glob.glob(os.path.join(REPO, "configs", "config-*.yaml")))
    assert len(paths) >= 9
    for p in paths:
        cfg = SlamConfig.from_yaml(p)
        seq = os.path.basename(p).split("-")[1].split(".")[0]
        assert cfg.dataset_dir.endswith(f"sequences/{seq}")
    # spot-check reference per-sequence overrides
    c09 = SlamConfig.from_yaml(os.path.join(REPO, "configs", "config-09.yaml"))
    assert c09.num_features == 200 and c09.num_features_init == 100
    assert c09.max_pose_differnece_between_old_new == 150
    c07 = SlamConfig.from_yaml(os.path.join(REPO, "configs", "config-07.yaml"))
    assert c07.potential_loop_strong_threshold == 0.93
    assert c07.max_pose_distance_between_loop_keyframes == 30


def test_run_slam_cli_checkpoint_resume(kitti_dir, tmp_path):
    """--checkpoint-every writes a resumable state; --resume continues it."""
    root, poses = kitti_dir
    out_dir = tmp_path / "out2"
    out_dir.mkdir()
    cfg = f"""
dataset_dir: {root}
left_cam_index: 0
right_cam_index: 1
is_color_input: 0
output_dir: {out_dir}
num_features: 60
num_features_init: 15
num_features_tracking: 20
num_features_tracking_bad: 8
num_features_needed_for_keyframe: 50
max_triangulation_depth: 300.0
num_active_keyframes: 5
backend_on: 1
chi2_th: 5.991
loopclosure_on: 0
visualizer_on: 0
"""
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(cfg)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    app = os.path.join(REPO, "apps", "run_slam.py")
    proc = subprocess.run(
        [sys.executable, app, str(cfg_path), "--checkpoint-every", "3"],
        capture_output=True, text=True, timeout=400, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    ckpt = out_dir / "slam_checkpoint.npz"
    assert ckpt.exists(), "checkpoint file missing"

    proc2 = subprocess.run(
        [sys.executable, app, str(cfg_path), "--resume", str(ckpt)],
        capture_output=True, text=True, timeout=400, env=env)
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "Resumed from" in proc2.stdout
    assert "SLAM finished" in proc2.stdout


def test_render_outputs_cli(tmp_path):
    pytest.importorskip("matplotlib")
    from stereovision_slam_tpu.slam.outputs import save_slam_output

    kfs = []
    for i in range(12):
        T = np.hstack([np.eye(3, dtype=np.float32),
                       np.array([[0.1 * i], [0.0], [-0.5 * i]], np.float32)])
        kfs.append((i, T))
    lms = np.random.default_rng(0).uniform(-10, 10, (200, 3)).astype(np.float32)
    out = save_slam_output(str(tmp_path), "/data/kitti/05", 0, kfs, lms,
                           timestamped_subdir=False)

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "apps", "render_outputs.py"),
         out], capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    assert os.path.exists(os.path.join(out, "trajectory.png"))
    assert os.path.exists(os.path.join(out, "landmarks.png"))


def test_run_slam_cli_fused_mode(kitti_dir, tmp_path):
    """--mode fused drives the zero-readback streaming pipeline from the CLI
    and writes the same keyframes.txt/landmarks.pcd outputs."""
    root, poses = kitti_dir
    out_dir = tmp_path / "out_fused"
    out_dir.mkdir()
    cfg = f"""
dataset_dir: {root}
left_cam_index: 0
right_cam_index: 1
is_color_input: 0
output_dir: {out_dir}
num_features: 60
num_features_init: 15
num_features_tracking: 20
num_features_tracking_bad: 8
num_features_needed_for_keyframe: 50
max_triangulation_depth: 300.0
num_active_keyframes: 5
backend_on: 1
chi2_th: 5.991
loopclosure_on: 1
visualizer_on: 0
"""
    cfg_path = tmp_path / "cfg_fused.yaml"
    cfg_path.write_text(cfg)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "apps", "run_slam.py"),
         str(cfg_path), "--mode", "fused"],
        capture_output=True, text=True, timeout=400, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SLAM finished (fused)" in proc.stdout
    assert "0 loop(s) closed" in proc.stdout
    runs = list(out_dir.iterdir())
    assert len(runs) == 1
    assert (runs[0] / "keyframes.txt").exists()
    assert (runs[0] / "landmarks.pcd").exists()


def test_run_slam_cli_unrolled_checkpoint_resume(kitti_dir, tmp_path):
    """--mode unrolled with --checkpoint-every/--resume: the streaming state
    round-trips through the fused checkpoint and the run completes."""
    root, poses = kitti_dir
    out_dir = tmp_path / "out_unrolled"
    out_dir.mkdir()
    cfg = f"""
dataset_dir: {root}
left_cam_index: 0
right_cam_index: 1
is_color_input: 0
output_dir: {out_dir}
num_features: 60
num_features_init: 15
num_features_tracking: 20
num_features_tracking_bad: 8
num_features_needed_for_keyframe: 50
max_triangulation_depth: 300.0
num_active_keyframes: 5
backend_on: 1
chi2_th: 5.991
loopclosure_on: 0
visualizer_on: 0
"""
    cfg_path = tmp_path / "cfg_unrolled.yaml"
    cfg_path.write_text(cfg)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    app = os.path.join(REPO, "apps", "run_slam.py")
    proc = subprocess.run(
        [sys.executable, app, str(cfg_path), "--mode", "unrolled",
         "--checkpoint-every", "1"],
        capture_output=True, text=True, timeout=500, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SLAM finished (unrolled)" in proc.stdout
    ckpt = out_dir / "slam_checkpoint.npz"
    assert ckpt.exists()

    proc2 = subprocess.run(
        [sys.executable, app, str(cfg_path), "--mode", "unrolled",
         "--resume", str(ckpt)],
        capture_output=True, text=True, timeout=500, env=env)
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "Resumed from" in proc2.stdout
    assert "SLAM finished (unrolled)" in proc2.stdout
