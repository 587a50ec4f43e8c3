"""Dense reconstruction tests: block matching + back-projection + filters."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereovision_slam_tpu.ops.stereo_bm import compute_disparity
from stereovision_slam_tpu.dense.reconstruction import (
    DenseReconstruction, DenseReconstructionConfig, density_filter,
    voxel_downsample, _depth_and_points)
from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
from stereovision_slam_tpu.slam.outputs import save_slam_output
from stereovision_slam_tpu.io.pcd import read_pcd
from tests import synthetic


def test_disparity_constant_shift():
    key = jax.random.PRNGKey(0)
    H, W = 96, 320
    img = synthetic.smooth_texture(key, H, W)
    d_true = 17.0
    right = synthetic.translate_image(img, -d_true, 0.0)  # right img shifted left
    disp, valid = compute_disparity(img, right, num_disparities=64,
                                    block_size=11)
    v = np.asarray(valid)
    assert v.sum() > 2000
    err = np.abs(np.asarray(disp)[v] - d_true)
    assert np.median(err) < 0.5, f"median disparity error {np.median(err)}"


def test_disparity_two_planes():
    key = jax.random.PRNGKey(1)
    H, W = 96, 320
    img = synthetic.smooth_texture(key, H, W)
    # left half shifted by 8, right half by 24 (two fronto-parallel planes)
    right = jnp.concatenate([
        synthetic.translate_image(img, -8.0, 0.0)[:, : W // 2],
        synthetic.translate_image(img, -24.0, 0.0)[:, W // 2:],
    ], axis=1)
    disp, valid = compute_disparity(img, right, num_disparities=48,
                                    block_size=11)
    v = np.asarray(valid)
    d = np.asarray(disp)
    mid = W // 2
    left_med = np.median(d[:, :mid - 16][v[:, :mid - 16]])
    right_med = np.median(d[:, mid + 16:][v[:, mid + 16:]])
    assert abs(left_med - 8.0) < 1.0, left_med
    assert abs(right_med - 24.0) < 1.0, right_med


def test_depth_backprojection_roundtrip():
    H, W = 32, 64
    fx = fy = 100.0
    cx, cy = W / 2, H / 2
    baseline = 0.5
    z_true = 10.0
    d = fx * baseline / z_true
    disp = jnp.full((H, W), d)
    valid = jnp.ones((H, W), bool)
    T = se3.se3_identity()
    pts, ok = _depth_and_points(disp, valid, fx, fy, cx, cy,
                                jnp.asarray(baseline), T)
    pts = np.asarray(pts)[np.asarray(ok)]
    np.testing.assert_allclose(pts[:, 2], z_true, atol=1e-3)


def test_density_filter_drops_isolated():
    rng = np.random.default_rng(0)
    cluster = rng.normal(0, 0.05, (200, 3))
    outliers = np.array([[5.0, 5.0, 5.0], [-7.0, 2.0, 1.0]])
    pts = np.concatenate([cluster, outliers])
    keep = density_filter(pts, voxel=0.2, min_neighbors=4)
    assert keep[:200].mean() > 0.9
    assert not keep[200] and not keep[201]


def test_voxel_downsample():
    pts = np.array([[0.0, 0.0, 0.0], [0.001, 0.001, 0.0], [1.0, 0.0, 0.0]])
    cols = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    p2, c2 = voxel_downsample(pts, cols, leaf=0.02)
    assert len(p2) == 2


def test_dense_reconstruction_end_to_end(tmp_path):
    """Synthetic fronto-parallel textured wall at known depth -> cloud."""
    key = jax.random.PRNGKey(2)
    H, W = 96, 320
    fx = fy = 150.0
    cx, cy = W / 2.0, H / 2.0
    baseline = 0.5
    z_wall = 6.0
    d = fx * baseline / z_wall  # 12.5 px
    left = synthetic.smooth_texture(key, H, W)
    right = synthetic.translate_image(left, -d, 0.0)

    from stereovision_slam_tpu.geometry.camera import Camera
    cam_l = Camera.create(fx, fy, cx, cy, baseline=0.0)
    cam_r = Camera.create(fx, fy, cx, cy, baseline=baseline,
                          pose=se3.se3_from_Rt(jnp.eye(3),
                                               jnp.array([-baseline, 0., 0.])))
    ds = ArraySequenceDataset(np.asarray(left)[None], np.asarray(right)[None],
                              [cam_l, cam_r])
    # SLAM output with one keyframe at identity
    out_dir = save_slam_output(str(tmp_path), "<synthetic>", 0,
                               [(0, np.asarray(se3.se3_identity()))],
                               np.zeros((0, 3)), timestamped_subdir=False)

    cfg = DenseReconstructionConfig(slam_output_dir=out_dir,
                                    num_disparities=32, block_size=11,
                                    max_depth=50.0, voxel_leaf=0.05,
                                    density_voxel=0.3)
    dr = DenseReconstruction(cfg, dataset_factory=lambda _: ds)
    dr.initialize()
    points, colors = dr.dense_reconstruct()
    assert len(points) > 500
    z = points[:, 2]
    assert abs(np.median(z) - z_wall) < 0.3, np.median(z)
    # output file readable
    pts2, cols2 = read_pcd(os.path.join(out_dir, "dense_pointcloud.pcd"))
    assert len(pts2) == len(points)
    assert cols2 is not None


def test_dense_reconstruction_sharded_matches_serial(tmp_path):
    """Mesh-sharded dense mapping over 8 virtual devices must reproduce the
    serial per-keyframe path (same wall geometry, same point budget)."""
    key = jax.random.PRNGKey(7)
    H, W = 96, 320
    fx = fy = 150.0
    cx, cy = W / 2.0, H / 2.0
    baseline = 0.5
    n_kf = 3  # < mesh size: exercises zero-image padding
    lefts, rights, kfs = [], [], []
    for i in range(n_kf):
        z_wall = 5.0 + i
        d = fx * baseline / z_wall
        left = synthetic.smooth_texture(jax.random.fold_in(key, i), H, W)
        lefts.append(np.asarray(left))
        rights.append(np.asarray(synthetic.translate_image(left, -d, 0.0)))
        kfs.append((i, np.asarray(se3.se3_identity())))

    from stereovision_slam_tpu.geometry.camera import Camera
    cam_l = Camera.create(fx, fy, cx, cy, baseline=0.0)
    cam_r = Camera.create(fx, fy, cx, cy, baseline=baseline,
                          pose=se3.se3_from_Rt(jnp.eye(3),
                                               jnp.array([-baseline, 0., 0.])))
    ds = ArraySequenceDataset(np.stack(lefts), np.stack(rights),
                              [cam_l, cam_r])
    out_dir = save_slam_output(str(tmp_path), "<synthetic>", 0, kfs,
                               np.zeros((0, 3)), timestamped_subdir=False)
    cfg = DenseReconstructionConfig(slam_output_dir=out_dir,
                                    num_disparities=32, block_size=11,
                                    max_depth=50.0, voxel_leaf=0.05,
                                    density_voxel=0.3)

    dr = DenseReconstruction(cfg, dataset_factory=lambda _: ds)
    dr.initialize()
    pts_serial, _ = dr.dense_reconstruct()

    mesh = jax.make_mesh((jax.device_count(),), ("kf",))
    dr2 = DenseReconstruction(cfg, dataset_factory=lambda _: ds)
    dr2.initialize()
    pts_sharded, _ = dr2.dense_reconstruct(mesh=mesh)

    assert len(pts_sharded) > 500
    # same geometry: per-keyframe walls at z = 5, 6, 7
    assert abs(len(pts_sharded) - len(pts_serial)) < 0.05 * len(pts_serial)
    assert abs(np.median(pts_sharded[:, 2]) - np.median(pts_serial[:, 2])) < 0.3


def test_statistical_outlier_removal_drops_isolated_points():
    from stereovision_slam_tpu.ops.sor import statistical_outlier_removal
    rng = np.random.default_rng(3)
    cluster = rng.normal(0.0, 0.5, (2000, 3)).astype(np.float32)
    outliers = np.array([[50., 0., 0.], [0., 80., 0.], [-60., -60., 20.]],
                        np.float32)
    pts = np.concatenate([cluster, outliers])
    keep = statistical_outlier_removal(pts, mean_k=50, std_ratio=1.0)
    assert not keep[-3:].any(), "isolated far points must be dropped"
    assert keep[:-3].mean() > 0.6, "the bulk of the cluster must survive"


def test_statistical_outlier_removal_subsampled_ref():
    """With N > max_ref the neighbor set is subsampled; the relative
    threshold must still separate speckle from the cluster."""
    from stereovision_slam_tpu.ops.sor import statistical_outlier_removal
    rng = np.random.default_rng(4)
    cluster = rng.normal(0.0, 1.0, (5000, 3)).astype(np.float32)
    outliers = rng.uniform(100, 200, (20, 3)).astype(np.float32)
    pts = np.concatenate([cluster, outliers])
    keep = statistical_outlier_removal(pts, mean_k=20, std_ratio=1.0,
                                       max_ref=1024, chunk=512)
    assert not keep[-20:].any()
    assert keep[:-20].mean() > 0.6


def test_statistical_outlier_removal_tiny_inputs():
    from stereovision_slam_tpu.ops.sor import statistical_outlier_removal
    assert statistical_outlier_removal(np.zeros((0, 3))).shape == (0,)
    one = statistical_outlier_removal(np.zeros((1, 3)))
    assert one.shape == (1,) and one.all()


def test_statistical_outlier_removal_mean_k_exceeds_ref():
    """mean_k >= max_ref must clamp, not crash (independent config knobs)."""
    from stereovision_slam_tpu.ops.sor import statistical_outlier_removal
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(3000, 3)).astype(np.float32)
    keep = statistical_outlier_removal(pts, mean_k=2000, max_ref=512,
                                       chunk=512)
    assert keep.shape == (3000,)
    assert keep.mean() > 0.5


def test_statistical_outlier_removal_no_subsample_bias():
    """In-sample and out-of-sample points must see statistically identical
    mean-kNN distances (the self/k+1 drop rule removes the rank asymmetry)."""
    from stereovision_slam_tpu.ops.sor import statistical_outlier_removal
    rng = np.random.default_rng(6)
    pts = rng.uniform(-5, 5, (4000, 3)).astype(np.float32)
    keep = statistical_outlier_removal(pts, mean_k=20, std_ratio=1.0,
                                       max_ref=1024, chunk=512, seed=7)
    # uniform cloud: survival rate must be high and NOT depend on subsample
    # membership; with the old biased drop, out-of-sample points were culled
    # several times more often
    sel = np.zeros(4000, bool)
    sel[np.random.default_rng(7).choice(4000, 1024, replace=False)] = True
    in_rate, out_rate = keep[sel].mean(), keep[~sel].mean()
    assert abs(in_rate - out_rate) < 0.1, (in_rate, out_rate)
