"""Native (C++) PNG loader: decode parity with PIL + prefetch semantics."""

import os

import numpy as np
import pytest
from PIL import Image

from stereovision_slam_tpu.io import native_loader


pytestmark = pytest.mark.skipif(not native_loader.native_available(),
                                reason="native loader not built")


def write_png(path, arr):
    Image.fromarray(arr.astype(np.uint8), "L").save(path)


def test_decode_matches_pil(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    p = str(tmp_path / "a.png")
    write_png(p, img)
    out = native_loader.decode_png(p, downsample=1)
    np.testing.assert_array_equal(out, img.astype(np.float32))


def test_decode_downsample(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    p = str(tmp_path / "b.png")
    write_png(p, img)
    out = native_loader.decode_png(p, downsample=2)
    np.testing.assert_array_equal(out, img[::2, ::2].astype(np.float32))


def test_decode_missing_returns_none(tmp_path):
    assert native_loader.decode_png(str(tmp_path / "nope.png")) is None


def test_dataset_prefetch_roundtrip(tmp_path):
    root = tmp_path / "sequences" / "01"
    (root / "image_0").mkdir(parents=True)
    (root / "image_1").mkdir(parents=True)
    fx, cx, cy, b = 520.0, 320.0, 92.0, 0.54
    rows = []
    for i in range(4):
        tx = -fx * b if i % 2 == 1 else 0.0
        rows.append(f"P{i}: {fx} 0 {cx} {tx} 0 {fx} {cy} 0 0 0 1 0")
    (root / "calib.txt").write_text("\n".join(rows) + "\n")

    rng = np.random.default_rng(2)
    truth = []
    for i in range(10):
        l = rng.integers(0, 256, (64, 128)).astype(np.uint8)
        r = rng.integers(0, 256, (64, 128)).astype(np.uint8)
        write_png(root / "image_0" / f"{i:06d}.png", l)
        write_png(root / "image_1" / f"{i:06d}.png", r)
        truth.append((l, r))

    ds = native_loader.NativeKittiDataset(str(root), downsample=2,
                                          n_prefetch=4, n_threads=2)
    ds.initialize()
    assert len(ds.cameras) == 4
    n = 0
    while True:
        f = ds.next_frame()
        if f is None:
            break
        tl, tr = truth[f.frame_id]
        np.testing.assert_array_equal(f.left, tl[::2, ::2].astype(np.float32))
        np.testing.assert_array_equal(f.right, tr[::2, ::2].astype(np.float32))
        assert f.left.shape == (32, 64)
        n += 1
    assert n == 10
    ds.close()
