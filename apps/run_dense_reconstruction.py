#!/usr/bin/env python
"""Dense 3-D reconstruction CLI.

Equivalent of the reference app
(/root/reference/app/run_dense_reconstruction.cpp): argv[1] is a required
YAML config with `slam_output_dir` and the color camera indices
(dense_3D_reconstruction_configs/config-XX.yaml format).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = list(sys.argv[1:])
    if "--platform" in args:
        i = args.index("--platform")
        platform = args[i + 1]
        del args[i:i + 2]
        import jax
        jax.config.update("jax_platforms", platform)
    per_device_batch = 1
    use_mesh = False
    if "--mesh" in args:  # shard keyframes over all local devices
        use_mesh = True
        args.remove("--mesh")
    if "--per-device-batch" in args:
        i = args.index("--per-device-batch")
        per_device_batch = int(args[i + 1])
        del args[i:i + 2]
    if not args:
        print("Usage: run_dense_reconstruction.py <config.yaml> "
              "[--platform cpu|tpu] [--mesh] [--per-device-batch N]")
        return 1
    config_path = args[0]
    if not os.path.exists(config_path):
        print(f"Config file not found: {config_path}")
        return 1

    import yaml
    from stereovision_slam_tpu.dense.reconstruction import (
        DenseReconstruction, DenseReconstructionConfig)

    with open(config_path) as f:
        text = "\n".join(ln for ln in f.read().splitlines()
                         if not ln.startswith("%YAML"))
    data = yaml.safe_load(text) or {}
    cfg = DenseReconstructionConfig(
        slam_output_dir=data.get("slam_output_dir", ""),
        left_color_cam_index=int(data.get("left_cam_index", 2)),
        right_color_cam_index=int(data.get("right_cam_index", 3)),
        is_color_input=bool(data.get("is_color_input", 1)),
    )
    dr = DenseReconstruction(cfg)
    dr.initialize()
    mesh = None
    if use_mesh:
        import jax
        mesh = jax.make_mesh((jax.device_count(),), ("kf",))
    points, colors = dr.dense_reconstruct(mesh=mesh,
                                          per_device_batch=per_device_batch)
    print(f"Dense reconstruction finished: {len(points)} points -> "
          f"{os.path.join(cfg.slam_output_dir, 'dense_pointcloud.pcd')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
