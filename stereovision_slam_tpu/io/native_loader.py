"""ctypes bindings for the native (C++) stereo-frame loader.

The hot-loop host work — PNG decode + decimation — runs in
native/dataloader.cpp worker threads that prefetch ahead of the pipeline, so
image I/O never stalls device dispatch (the reference blocks its main loop on
cv::imread per frame, dataset.cpp:104-138). Falls back cleanly when the
shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from stereovision_slam_tpu.io.kitti import KittiDataset, StereoFrame

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO, "native", "libsvslam_loader.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        # best-effort build (g++ + libpng are part of the target environment)
        try:
            subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                           check=True, capture_output=True)
        except Exception as e:  # pragma: no cover
            raise RuntimeError(
                f"native loader not built and build failed: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    lib.svslam_loader_create.restype = ctypes.c_void_p
    lib.svslam_loader_create.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.svslam_loader_get.restype = ctypes.c_int
    lib.svslam_loader_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.svslam_loader_destroy.restype = None
    lib.svslam_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.svslam_decode_png.restype = ctypes.c_int
    lib.svslam_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        return False


def decode_png(path: str, downsample: int = 1,
               max_shape=(2048, 4096)) -> np.ndarray | None:
    """One-shot grayscale float32 decode via the native library."""
    lib = _load_lib()
    buf = np.empty(max_shape, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    ok = lib.svslam_decode_png(
        path.encode(), downsample,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_shape[0], max_shape[1], ctypes.byref(h), ctypes.byref(w))
    if not ok:
        return None
    return buf.reshape(-1)[: h.value * w.value].reshape(h.value, w.value).copy()


class NativeKittiDataset(KittiDataset):
    """KittiDataset with the prefetching native decode path.

    Same interface/semantics as the pure-Python loader (calib parsing is
    inherited); `next_frame` is backed by the worker-thread ring buffer.
    """

    def __init__(self, dataset_dir: str, left_cam_index: int = 0,
                 right_cam_index: int = 1, downsample: int = 2,
                 n_prefetch: int = 8, n_threads: int = 2,
                 max_shape=(2048, 4096)):
        super().__init__(dataset_dir, left_cam_index, right_cam_index,
                         is_color_input=False, downsample=downsample)
        self._lib = _load_lib()
        self._handle = None
        self._n_prefetch = n_prefetch
        self._n_threads = n_threads
        self._max_shape = max_shape

    def initialize(self) -> None:
        super().initialize()
        if self._handle is not None:
            self._lib.svslam_loader_destroy(self._handle)
        left_dir = os.path.join(self.dataset_dir,
                                f"image_{self.left_cam_index}")
        right_dir = os.path.join(self.dataset_dir,
                                 f"image_{self.right_cam_index}")
        self._handle = self._lib.svslam_loader_create(
            left_dir.encode(), right_dir.encode(), self.downsample,
            self._n_prefetch, self._n_threads)

    def next_frame(self) -> StereoFrame | None:
        fid = self.current_index
        mh, mw = self._max_shape
        left = np.empty((mh, mw), np.float32)
        right = np.empty((mh, mw), np.float32)
        h = ctypes.c_int()
        w = ctypes.c_int()
        ok = self._lib.svslam_loader_get(
            self._handle, fid,
            left.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            right.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mh, mw, ctypes.byref(h), ctypes.byref(w))
        if not ok:
            return None
        self.current_index += 1
        shape = (h.value, w.value)
        n = shape[0] * shape[1]
        return StereoFrame(
            frame_id=fid,
            left=left.reshape(-1)[:n].reshape(shape).copy(),
            right=right.reshape(-1)[:n].reshape(shape).copy())

    def close(self) -> None:
        if self._handle is not None:
            self._lib.svslam_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
