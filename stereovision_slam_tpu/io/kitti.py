"""KITTI odometry dataset loader.

Equivalent of the reference `Dataset` (/root/reference/src/dataset.cpp:24-173)
without the OpenCV dependency: parses calib.txt 3x4 projections into four
cameras — intrinsics from K, stereo translation t = K^-1 * p4, baseline =
|t|, K scaled by 0.5 for the 2x image downsample — and loads PNG pairs via
PIL with nearest-neighbor 2x decimation (cv::INTER_NEAREST semantics,
dataset.cpp:126-129).

Image decode is host-side I/O (the one part of this system that belongs on
the CPU); everything downstream is device arrays.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.geometry.camera import Camera
from stereovision_slam_tpu.utils.exceptions import DatasetError

try:
    from PIL import Image
    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False


@dataclass
class StereoFrame:
    frame_id: int
    left: np.ndarray   # (H, W) float32 grayscale (or (H, W, 3) if color)
    right: np.ndarray


class KittiDataset:
    """Sequence loader mirroring Dataset::initialize/NextFrame/FrameById."""

    def __init__(self, dataset_dir: str, left_cam_index: int = 0,
                 right_cam_index: int = 1, is_color_input: bool = False,
                 downsample: int = 2):
        self.dataset_dir = dataset_dir
        self.left_cam_index = left_cam_index
        self.right_cam_index = right_cam_index
        self.is_color_input = is_color_input
        self.downsample = downsample
        self.cameras: list[Camera] = []
        self.current_index = 0

    def initialize(self) -> None:
        calib_path = os.path.join(self.dataset_dir, "calib.txt")
        if not os.path.exists(calib_path):
            raise DatasetError(
                f"Cannot open KITTI camera parameters file: {calib_path}")
        self.cameras = []
        with open(calib_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 13 or not parts[0].startswith("P"):
                    continue
                p = np.array([float(v) for v in parts[1:13]]).reshape(3, 4)
                K = p[:, :3]
                t = np.linalg.solve(K, p[:, 3])
                baseline = float(np.linalg.norm(t))
                Ks = K * (1.0 / self.downsample)
                pose = se3.se3_from_Rt(np.eye(3, dtype=np.float32),
                                       t.astype(np.float32))
                self.cameras.append(Camera.create(
                    fx=Ks[0, 0], fy=Ks[1, 1], cx=Ks[0, 2], cy=Ks[1, 2],
                    baseline=baseline, pose=pose))
        if len(self.cameras) < 2:
            raise DatasetError(f"calib.txt yielded {len(self.cameras)} cameras")
        self.current_index = 0

    def get_camera(self, camera_id: int) -> Camera:
        return self.cameras[camera_id]

    def _image_path(self, cam_index: int, frame_id: int) -> str:
        return os.path.join(self.dataset_dir, f"image_{cam_index}",
                            f"{frame_id:06d}.png")

    def _load_image(self, path: str) -> np.ndarray | None:
        if not os.path.exists(path):
            return None
        if not _HAS_PIL:
            raise RuntimeError("PIL not available for PNG decoding")
        img = Image.open(path)
        img = img.convert("RGB" if self.is_color_input else "L")
        arr = np.asarray(img, dtype=np.float32)
        d = self.downsample
        if d > 1:
            arr = arr[::d, ::d]  # INTER_NEAREST downsample (dataset.cpp:126-129)
        return arr

    def frame_by_id(self, frame_id: int) -> StereoFrame | None:
        """Dataset::FrameById (dataset.cpp:140-173)."""
        left = self._load_image(self._image_path(self.left_cam_index, frame_id))
        right = self._load_image(self._image_path(self.right_cam_index, frame_id))
        if left is None or right is None:
            return None
        return StereoFrame(frame_id=frame_id, left=left, right=right)

    def next_frame(self) -> StereoFrame | None:
        frame = self.frame_by_id(self.current_index)
        if frame is not None:
            self.current_index += 1
        return frame

    def __iter__(self):
        while True:
            f = self.next_frame()
            if f is None:
                return
            yield f


class ArraySequenceDataset:
    """In-memory dataset with the same interface, for synthetic sequences and
    tests (no reference analogue — the reference can only read KITTI)."""

    def __init__(self, lefts: np.ndarray, rights: np.ndarray,
                 cameras: list[Camera], dataset_dir: str = "<synthetic>"):
        self.lefts = np.asarray(lefts)
        self.rights = np.asarray(rights)
        self.cameras = list(cameras)
        self.dataset_dir = dataset_dir
        self.left_cam_index = 0
        self.right_cam_index = 1
        self.current_index = 0

    def initialize(self) -> None:
        self.current_index = 0

    def get_camera(self, camera_id: int) -> Camera:
        return self.cameras[camera_id]

    def frame_by_id(self, frame_id: int) -> StereoFrame | None:
        if frame_id < 0 or frame_id >= len(self.lefts):
            return None
        return StereoFrame(frame_id=frame_id,
                           left=self.lefts[frame_id].astype(np.float32),
                           right=self.rights[frame_id].astype(np.float32))

    def next_frame(self) -> StereoFrame | None:
        frame = self.frame_by_id(self.current_index)
        if frame is not None:
            self.current_index += 1
        return frame

    def __iter__(self):
        while True:
            f = self.next_frame()
            if f is None:
                return
            yield f
