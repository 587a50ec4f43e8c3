"""Audit the TPU-compiled hot-path executables for array constants.

Complements tests/test_no_array_constants.py: the CPU executable printer
elides constants, so XLA-FOLDING-created constants (the second door in
utils/hlo_guard.py) are only visible in the TPU-optimized HLO. Run this on
the TPU host each round:

    python benchmarks/audit_constants.py

Exits non-zero and lists offenders if any per-frame program embeds an array
constant (>= 2 elements; small s32/u32 index vectors allowlisted — measured
benign). See docs/PERFORMANCE.md "array-constant cliff" for why this matters.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main() -> int:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from stereovision_slam_tpu.geometry.camera import Camera
    from stereovision_slam_tpu.ops import image as imops
    from stereovision_slam_tpu.slam import frontend as fe
    from stereovision_slam_tpu.slam import fused, map_state as mapmod
    from stereovision_slam_tpu.slam.backend import optimize_window
    from stereovision_slam_tpu.slam.config import SlamConfig
    from stereovision_slam_tpu.utils.hlo_guard import array_constants

    cfg = SlamConfig()
    rig = (Camera.create(fx=200.0, fy=200.0, cx=310.0, cy=94.0),
           Camera.create(fx=200.0, fy=200.0, cx=310.0, cy=94.0, baseline=0.54,
                         pose=np.concatenate([np.eye(3, dtype=np.float32),
                                              np.array([[-0.54], [0.0], [0.0]],
                                                       np.float32)], 1)))
    img = jnp.zeros((188, 620), jnp.float32)
    pyr = tuple(imops.build_pyramid(img, cfg.lk_num_levels))
    ms = mapmod.empty_map(cfg.max_keyframes_window, cfg.max_features,
                          cfg.max_landmarks)
    fs = fe.init_state(cfg.max_features, pyr)
    arc = fused.empty_archive(4096, 1 << 17)

    programs = {
        "fused_step": lambda: fused.fused_step.lower(
            fs, ms, arc, jnp.asarray(-1, jnp.int32), img, img,
            jnp.asarray(0, jnp.int32), rig[0], rig[1],
            num_levels=cfg.lk_num_levels, num_features=cfg.num_features,
            min_distance=cfg.gftt_min_distance,
            quality_level=cfg.gftt_quality_level,
            max_depth=cfg.max_triangulation_depth,
            num_active=cfg.num_active_keyframes,
            kf_threshold=cfg.num_features_needed_for_keyframe,
            bad_threshold=cfg.num_features_tracking_bad, chi2_th=cfg.chi2_th,
            backend_on=True, ba_iters=cfg.ba_lm_iters, detector="gftt",
            num_features_init=cfg.num_features_init),
        "track_step": lambda: fe.track_step.lower(
            fs, ms, pyr, rig[0], pyr, rig[1], chi2_th=cfg.chi2_th),
        "keyframe_step": lambda: fe.keyframe_step.lower(
            fs, ms, pyr, rig[0], rig[1], jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            num_features=cfg.num_features,
            min_distance=cfg.gftt_min_distance,
            quality_level=cfg.gftt_quality_level,
            max_depth=cfg.max_triangulation_depth,
            num_active=cfg.num_active_keyframes, detect_all=True,
            detector="gftt"),
        "optimize_window": lambda: optimize_window.lower(
            ms, rig[0], rig[1], chi2_th=cfg.chi2_th, iters=cfg.ba_lm_iters),
    }

    failed = False
    for name, build in programs.items():
        comp = build().compile()
        offenders = []
        for dt, sh, op, src in array_constants(comp, min_elements=2):
            dims = [int(x) for x in sh.split(",") if x]
            n = int(np.prod(dims)) if dims else 1
            if dt in ("s32", "u32") and n <= 8:
                continue  # dus/scatter index clamps: measured benign
            offenders.append((dt, sh, op, src))
        status = "CLEAN" if not offenders else f"{len(offenders)} OFFENDER(S)"
        print(f"{name}: {status}")
        for o in offenders:
            print("   ", o)
        failed = failed or bool(offenders)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
