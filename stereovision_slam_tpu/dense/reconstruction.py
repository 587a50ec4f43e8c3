"""Offline dense 3-D reconstruction from SLAM keyframe poses.

TPU-native equivalent of the reference `DenseReconstruction`
(/root/reference/src/dense_reconstruction.cpp): reads the SLAM
`keyframes.txt` output (:18-90), per keyframe runs block-matching stereo
(:104-117), converts disparity to depth z = f*b/d (:119-142), back-projects
every valid pixel through the keyframe pose into a colored world cloud
(:144-173), removes outliers and voxel-downsamples (:175-209), and writes a
binary PCD (:212-237).

Redesigns:
  * cv::StereoBM -> the batched SAD cost volume in ops/stereo_bm.py;
  * PCL StatisticalOutlierRemoval (k-NN mean distance, meanK 50, sigma 1.0)
    -> ops/sor.py: brute-force k-NN as chunked pairwise-distance matmuls
    on the MXU instead of a k-d tree (same meanK/sigma semantics). A faster
    O(N) voxel-density approximation remains available
    (outlier_filter='density');
  * VoxelGrid downsample (leaf 0.02 m) -> hash-based first-point-per-voxel
    selection in numpy (host-side; this is an offline tool).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.io import pcd
from stereovision_slam_tpu.ops.sor import statistical_outlier_removal
from stereovision_slam_tpu.ops.stereo_bm import compute_disparity
from stereovision_slam_tpu.slam.outputs import load_keyframes_file


def _depth_and_points_impl(disp, valid, fx, fy, cx, cy, baseline, T_cw,
                           min_depth=1.0, max_depth=200.0):
    """Disparity -> world points for every pixel (masked)."""
    H, W = disp.shape
    z = jnp.where(valid & (disp > 0.1), fx * baseline / jnp.maximum(disp, 0.1),
                  0.0)
    ok = valid & (z >= min_depth) & (z <= max_depth)
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    x = (xx - cx) * z / fx
    y = (yy - cy) * z / fy
    p_cam = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    T_wc = se3.se3_inverse(T_cw)
    p_world = se3.se3_apply(T_wc, p_cam)
    return p_world, ok.reshape(-1)


_depth_and_points = jax.jit(_depth_and_points_impl)


def build_sharded_dense_kernel(mesh, num_disparities: int = 128,
                               block_size: int = 15, min_depth: float = 1.0,
                               max_depth: float = 150.0):
    """Mesh-distributed dense mapping: keyframes shard over every mesh axis.

    Dense reconstruction is embarrassingly parallel across keyframes (the
    reference loops them serially on one CPU, dense_reconstruction.cpp:92-173)
    — the cost volume + back-projection for each keyframe shard runs on its
    own device with zero collectives; hosts only gather the point batches.

    Returns jitted fn(lefts (B,H,W), rights (B,H,W), T_cws (B,3,4),
    fx, fy, cx, cy, baseline) -> (points (B,H*W,3), ok (B,H*W)), with B a
    multiple of the mesh size (pad with zero images: the texture gate marks
    every padded pixel invalid).
    """
    from functools import partial as _partial
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    axes = tuple(mesh.axis_names)

    def per_kf(left, right, T_cw, fx, fy, cx, cy, baseline):
        disp, valid = compute_disparity(
            left, right, num_disparities=num_disparities,
            block_size=block_size)
        return _depth_and_points_impl(disp, valid, fx, fy, cx, cy, baseline,
                                      T_cw, min_depth, max_depth)

    vmapped = jax.vmap(per_kf, in_axes=(0, 0, 0) + (None,) * 5)

    @_partial(shard_map, mesh=mesh,
              in_specs=(P(axes), P(axes), P(axes)) + (P(),) * 5,
              out_specs=(P(axes), P(axes)), check_vma=False)
    def run(lefts, rights, T_cws, fx, fy, cx, cy, baseline):
        return vmapped(lefts, rights, T_cws, fx, fy, cx, cy, baseline)

    return jax.jit(run)


def density_filter(points: np.ndarray, voxel: float = 0.1,
                   min_neighbors: int = 4) -> np.ndarray:
    """Boolean keep-mask: drop points whose 3x3x3-voxel neighborhood is
    sparse (the statistical-outlier-removal replacement)."""
    if len(points) == 0:
        return np.zeros((0,), bool)
    keys = np.floor(points / voxel).astype(np.int64)
    # neighborhood count = own voxel + the 6 face neighbors (approximation of
    # the full 27-cell neighborhood; enough to kill isolated speckle)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    voxel_count = np.bincount(inv)
    neigh = voxel_count[inv].astype(np.int64)
    lookup = {tuple(k): c for k, c in zip(uniq, voxel_count)}
    for dz in (-1, 1):
        for axis in range(3):
            shifted = keys.copy()
            shifted[:, axis] += dz
            neigh += np.array([lookup.get(tuple(k), 0) for k in shifted])
    return neigh >= min_neighbors


def voxel_downsample(points: np.ndarray, colors: np.ndarray | None,
                     leaf: float = 0.02):
    """Keep one point per voxel (first hit), like pcl::VoxelGrid with the
    reference's 0.02 m leaf (dense_reconstruction.cpp:202-209)."""
    if len(points) == 0:
        return points, colors
    keys = np.floor(points / leaf).astype(np.int64)
    _, first = np.unique(keys, axis=0, return_index=True)
    first = np.sort(first)
    return points[first], (colors[first] if colors is not None else None)


@dataclass
class DenseReconstructionConfig:
    slam_output_dir: str = ""
    left_color_cam_index: int = 2
    right_color_cam_index: int = 3
    is_color_input: bool = True
    num_disparities: int = 128
    block_size: int = 15
    min_depth: float = 1.0
    max_depth: float = 150.0
    voxel_leaf: float = 0.02
    # outlier filter: 'statistical' = PCL SOR semantics (meanK/sigma,
    # dense_reconstruction.cpp:175-200); 'density' = fast voxel approximation
    outlier_filter: str = "statistical"
    sor_mean_k: int = 50
    sor_std_ratio: float = 1.0
    sor_max_ref: int = 16384   # neighbor-search subsample cap
    sor_chunk: int = 1024      # queries per distance-matrix tile
    density_voxel: float = 0.15
    density_min_neighbors: int = 5


class DenseReconstruction:
    """Offline dense mapper driven by a SLAM output directory."""

    def __init__(self, cfg: DenseReconstructionConfig, dataset_factory=None):
        """dataset_factory(dataset_dir) -> dataset with get_camera/frame_by_id;
        defaults to KittiDataset with the color camera indices."""
        self.cfg = cfg
        self.dataset_factory = dataset_factory
        self.dataset = None
        self.keyframes = []

    def initialize(self) -> None:
        # the reference config points `slam_output_dir` at the keyframes.txt
        # file itself (dense_3D_reconstruction_configs/config-00.yaml);
        # accept either the file or its directory
        if self.cfg.slam_output_dir.endswith(".txt"):
            kf_path = self.cfg.slam_output_dir
            self.cfg.slam_output_dir = os.path.dirname(kf_path)
        else:
            kf_path = os.path.join(self.cfg.slam_output_dir, "keyframes.txt")
        dataset_dir, left_cam_index, frames = load_keyframes_file(kf_path)
        self.keyframes = frames
        if self.dataset_factory is not None:
            self.dataset = self.dataset_factory(dataset_dir)
        else:
            from stereovision_slam_tpu.io.kitti import KittiDataset
            self.dataset = KittiDataset(
                dataset_dir,
                left_cam_index=self.cfg.left_color_cam_index,
                right_cam_index=self.cfg.right_color_cam_index,
                is_color_input=self.cfg.is_color_input)
            self.dataset.initialize()

    def _frame_arrays(self, frame_id: int):
        """(left_gray, right_gray, colors_img) for one keyframe, or None."""
        frame = self.dataset.frame_by_id(frame_id)
        if frame is None:
            return None
        left = np.asarray(frame.left, np.float32)
        right = np.asarray(frame.right, np.float32)
        if left.ndim == 3:
            return left.mean(axis=-1), right.mean(axis=-1), left.astype(np.uint8)
        return left, right, np.stack([left] * 3, axis=-1).astype(np.uint8)

    def _cams(self):
        cfg = self.cfg
        cam = self.dataset.get_camera(
            getattr(self.dataset, "left_cam_index", cfg.left_color_cam_index))
        cam_r = self.dataset.get_camera(
            getattr(self.dataset, "right_cam_index", cfg.right_color_cam_index))
        baseline = abs(float(cam_r.baseline) - float(cam.baseline))
        return cam, baseline

    def reconstruct_keyframe(self, frame_id: int, T_cw: np.ndarray):
        """One keyframe -> (points (N,3), colors (N,3) uint8)."""
        cfg = self.cfg
        arrs = self._frame_arrays(frame_id)
        if arrs is None:
            return None, None
        left_gray, right_gray, colors_img = arrs
        cam, baseline = self._cams()

        disp, valid = compute_disparity(
            jnp.asarray(left_gray), jnp.asarray(right_gray),
            num_disparities=cfg.num_disparities, block_size=cfg.block_size)
        pts, ok = _depth_and_points(
            disp, valid, cam.fx, cam.fy, cam.cx, cam.cy,
            jnp.asarray(baseline, jnp.float32), jnp.asarray(T_cw),
            cfg.min_depth, cfg.max_depth)
        ok_np = np.asarray(ok)
        pts_np = np.asarray(pts)[ok_np]
        cols_np = colors_img.reshape(-1, 3)[ok_np]

        keep = self._outlier_keep_mask(pts_np)
        return pts_np[keep], cols_np[keep]

    def _outlier_keep_mask(self, points: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        if cfg.outlier_filter == "density":
            return density_filter(points, cfg.density_voxel,
                                  cfg.density_min_neighbors)
        return statistical_outlier_removal(
            points, mean_k=cfg.sor_mean_k, std_ratio=cfg.sor_std_ratio,
            max_ref=cfg.sor_max_ref, chunk=cfg.sor_chunk)

    def _reconstruct_sharded(self, kfs, mesh, per_device_batch: int):
        """Keyframe shards run on their own mesh devices (one jitted program
        per batch of mesh_size*per_device_batch keyframes); the host gathers
        point batches and applies the per-keyframe outlier filter."""
        import jax.numpy as jnp
        cfg = self.cfg
        B = mesh.devices.size * per_device_batch
        cam, baseline = self._cams()
        kernel = build_sharded_dense_kernel(
            mesh, cfg.num_disparities, cfg.block_size,
            cfg.min_depth, cfg.max_depth)

        loaded = []
        for frame_id, T in kfs:
            arrs = self._frame_arrays(frame_id)
            if arrs is not None:
                loaded.append((arrs, T))
        all_pts, all_cols = [], []
        ident = np.eye(3, 4, dtype=np.float32)
        for s in range(0, len(loaded), B):
            chunk = loaded[s:s + B]
            pad = B - len(chunk)
            lefts = np.stack([a[0] for a, _ in chunk]
                             + [np.zeros_like(loaded[0][0][0])] * pad)
            rights = np.stack([a[1] for a, _ in chunk]
                              + [np.zeros_like(loaded[0][0][1])] * pad)
            T_cws = np.stack([np.asarray(T, np.float32) for _, T in chunk]
                             + [ident] * pad)
            pts, ok = kernel(jnp.asarray(lefts), jnp.asarray(rights),
                             jnp.asarray(T_cws),
                             jnp.asarray(cam.fx), jnp.asarray(cam.fy),
                             jnp.asarray(cam.cx), jnp.asarray(cam.cy),
                             jnp.asarray(baseline, jnp.float32))
            pts = np.asarray(pts)
            ok = np.asarray(ok)
            for b, (arrs, _) in enumerate(chunk):
                pts_np = pts[b][ok[b]]
                cols_np = arrs[2].reshape(-1, 3)[ok[b]]
                keep = self._outlier_keep_mask(pts_np)
                if keep.any():
                    all_pts.append(pts_np[keep])
                    all_cols.append(cols_np[keep])
        return all_pts, all_cols

    def dense_reconstruct(self, output_path: str | None = None,
                          max_keyframes: int | None = None, mesh=None,
                          per_device_batch: int = 1):
        """Full pipeline over all keyframes; writes dense_pointcloud.pcd into
        the SLAM output dir (dense_reconstruction.cpp:212-237).

        With `mesh`, keyframes shard over the mesh devices
        (build_sharded_dense_kernel) instead of running serially.
        """
        all_pts, all_cols = [], []
        kfs = self.keyframes[:max_keyframes] if max_keyframes else self.keyframes
        if mesh is not None and kfs:
            all_pts, all_cols = self._reconstruct_sharded(
                kfs, mesh, per_device_batch)
        else:
            for frame_id, T in kfs:
                pts, cols = self.reconstruct_keyframe(frame_id, T)
                if pts is not None and len(pts):
                    all_pts.append(pts)
                    all_cols.append(cols)
        if not all_pts:
            points = np.zeros((0, 3), np.float32)
            colors = np.zeros((0, 3), np.uint8)
        else:
            points = np.concatenate(all_pts)
            colors = np.concatenate(all_cols)
            # second, global SOR pass over the merged cloud: intentional —
            # the reference filters per keyframe AND once more globally
            # (dense_reconstruction.cpp:180-185 in-loop, :194-200 merged)
            keep = self._outlier_keep_mask(points)
            points, colors = points[keep], colors[keep]
            points, colors = voxel_downsample(points, colors,
                                              self.cfg.voxel_leaf)
        if output_path is None:
            output_path = os.path.join(self.cfg.slam_output_dir,
                                       "dense_pointcloud.pcd")
        pcd.write_pcd_xyzrgb(output_path, points, colors)
        return points, colors
