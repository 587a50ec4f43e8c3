"""Render SLAM / dense-reconstruction outputs to PNG figures.

The reference demonstrates its results visually (demo GIFs/videos,
/root/reference/README.md:80-82) through the live Rerun viewer. This offline
renderer produces the same artifacts from the on-disk outputs — a top-down
trajectory + landmark map and a 3-D colored point-cloud view — without
needing the Rerun SDK.

Usage:
    python apps/render_outputs.py <slam_output_dir> [--out DIR]
        <slam_output_dir> contains keyframes.txt + landmarks.pcd (and
        optionally dense_pointcloud.pcd from run_dense_reconstruction.py)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereovision_slam_tpu.io import pcd
from stereovision_slam_tpu.slam.outputs import load_keyframes_file
from stereovision_slam_tpu.utils.evaluation import camera_centers


def render_trajectory(kf_path: str, lm_path: str | None, out_png: str) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _, _, keyframes = load_keyframes_file(kf_path)
    poses = np.stack([T for _, T in keyframes])
    centers = camera_centers(poses)

    fig, ax = plt.subplots(figsize=(8, 8))
    if lm_path and os.path.exists(lm_path):
        pts, _ = pcd.read_pcd(lm_path)
        ax.scatter(pts[:, 0], pts[:, 2], s=0.5, c="#9aa4ad", linewidths=0,
                   label=f"landmarks ({len(pts)})")
    ax.plot(centers[:, 0], centers[:, 2], "-", color="#1f6feb", lw=1.5,
            label=f"trajectory ({len(centers)} keyframes)")
    ax.plot(centers[0, 0], centers[0, 2], "o", color="#2da44e", ms=8,
            label="start")
    ax.plot(centers[-1, 0], centers[-1, 2], "s", color="#cf222e", ms=8,
            label="end")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend(loc="best", fontsize=9)
    ax.set_title("SLAM trajectory + landmark map (top-down)")
    fig.tight_layout()
    fig.savefig(out_png, dpi=130)
    plt.close(fig)


def render_cloud(cloud_path: str, out_png: str, max_points: int = 200_000) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts, colors = pcd.read_pcd(cloud_path)
    if len(pts) > max_points:
        sel = np.random.default_rng(0).choice(len(pts), max_points,
                                               replace=False)
        pts = pts[sel]
        colors = colors[sel] if colors is not None else None

    fig = plt.figure(figsize=(10, 7))
    ax = fig.add_subplot(111, projection="3d")
    c = colors / 255.0 if colors is not None else pts[:, 1]
    ax.scatter(pts[:, 0], pts[:, 2], -pts[:, 1], s=0.3, c=c, linewidths=0)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_zlabel("-y [m]")
    ax.set_title(f"Point cloud ({len(pts)} pts): {os.path.basename(cloud_path)}")
    fig.tight_layout()
    fig.savefig(out_png, dpi=130)
    plt.close(fig)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("slam_output_dir")
    ap.add_argument("--out", default=None,
                    help="output dir for PNGs (default: the input dir)")
    args = ap.parse_args(argv)

    out_dir = args.out or args.slam_output_dir
    os.makedirs(out_dir, exist_ok=True)

    kf = os.path.join(args.slam_output_dir, "keyframes.txt")
    lm = os.path.join(args.slam_output_dir, "landmarks.pcd")
    if os.path.exists(kf):
        png = os.path.join(out_dir, "trajectory.png")
        render_trajectory(kf, lm, png)
        print(f"wrote {png}")
    if os.path.exists(lm):
        png = os.path.join(out_dir, "landmarks.png")
        render_cloud(lm, png)
        print(f"wrote {png}")
    dense = os.path.join(args.slam_output_dir, "dense_pointcloud.pcd")
    if os.path.exists(dense):
        png = os.path.join(out_dir, "dense_pointcloud.png")
        render_cloud(dense, png)
        print(f"wrote {png}")
    if not (os.path.exists(kf) or os.path.exists(lm)):
        ap.error(f"no keyframes.txt or landmarks.pcd in {args.slam_output_dir}")


if __name__ == "__main__":
    main()
