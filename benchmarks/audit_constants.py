"""Audit the TPU-compiled hot-path executables for array constants.

Complements tests/test_no_array_constants.py: the CPU executable printer
elides constants, so XLA-FOLDING-created constants (the second door in
utils/hlo_guard.py) are only visible in the TPU-optimized HLO. Run this on
the TPU host each round:

    python benchmarks/audit_constants.py

Exits non-zero and lists offenders if any per-frame program embeds an array
constant (>= 2 elements; small s32/u32 index vectors allowlisted — measured
benign). See docs/PERFORMANCE.md "array-constant cliff" for why this matters.

Known-benign findings (measured clean, 2026-08-19; kept visible so changes
stand out): optimize_pose_graph carries an f32[3,3] inside a while-body
closed_call, and mnv2_embed_image carries small pred masks from XLA's conv
SAME-padding lowering — compiler-internal constants inside control-flow
bodies do not trip the cliff; entry-level folded DATA tables do.
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

    from stereovision_slam_tpu.models import mobilenet_v2 as mnv2
    from stereovision_slam_tpu.ops import stereo_bm, sor
    from stereovision_slam_tpu.slam.pnp import pnp_ransac
    from stereovision_slam_tpu.slam.pose_graph import (PoseGraph,
                                                       optimize_pose_graph)

    n_kf, n_edges = 64, 80
    ident = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1), (n_kf, 3, 4))
    graph = PoseGraph(
        poses=ident.copy(),
        pose_valid=jnp.ones((n_kf,), bool),
        edge_i=jnp.zeros((n_edges,), jnp.int32),
        edge_j=jnp.ones((n_edges,), jnp.int32),
        edge_meas=jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1),
            (n_edges, 3, 4)).copy(),
        edge_valid=jnp.ones((n_edges,), bool),
    )
    mnv2_params = mnv2.init_params(jax.random.PRNGKey(0))

    programs = {
        "pnp_ransac": lambda: pnp_ransac.lower(
            rig[0], jnp.zeros((256, 3)), jnp.zeros((256, 2)),
            jnp.ones((256,), bool), jax.random.PRNGKey(0),
            reproj_threshold=5.991, num_hypotheses=128),
        "optimize_pose_graph": lambda: optimize_pose_graph.lower(
            graph, iters=4, cg_iters=20),
        "mnv2_embed_image": lambda: mnv2.embed_image.lower(mnv2_params, img),
        "embed_image_thumbnail": lambda: mnv2.embed_image_thumbnail.lower(img),
        "stereo_bm": lambda: stereo_bm.compute_disparity.lower(
            img, img, num_disparities=128, block_size=15),
        "sor_knn_chunk": lambda: sor._mean_knn_chunk.lower(
            jnp.zeros((512, 3)), jnp.zeros((2048, 3)), k=50),
        "keyframe_step_fast": lambda: fe.keyframe_step.lower(
            fs, ms, pyr, rig[0], rig[1], jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            num_features=cfg.num_features,
            min_distance=cfg.gftt_min_distance,
            quality_level=cfg.gftt_quality_level,
            max_depth=cfg.max_triangulation_depth,
            num_active=cfg.num_active_keyframes, detect_all=True,
            detector="fast"),
        "fused_lc_step": lambda: _lower_fused_lc(),
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

    def _lower_fused_lc():
        from stereovision_slam_tpu.slam import fused_loop
        ls = fused_loop.empty_loop_state(256, cfg.max_features)
        return fused_loop.fused_lc_step.lower(
            fs, ms, fused.empty_archive(256, 4096),
            jnp.asarray(-1, jnp.int32), ls, img, img,
            jnp.asarray(0, jnp.int32), rig[0], rig[1], None,
            num_levels=cfg.lk_num_levels, num_features=cfg.num_features,
            min_distance=cfg.gftt_min_distance,
            quality_level=cfg.gftt_quality_level,
            max_depth=cfg.max_triangulation_depth,
            num_active=cfg.num_active_keyframes,
            kf_threshold=cfg.num_features_needed_for_keyframe,
            bad_threshold=cfg.num_features_tracking_bad,
            chi2_th=cfg.chi2_th, backend_on=True, ba_iters=cfg.ba_lm_iters,
            detector="gftt", num_features_init=cfg.num_features_init,
            skip=cfg.keyframes_to_skip_in_candidate_search,
            cooldown=cfg.keyframes_to_ignore_after_loop,
            strong=cfg.potential_loop_strong_threshold,
            weak=cfg.potential_loop_weak_threshold,
            max_weak=cfg.max_num_weak_threshold,
            min_match=cfg.min_num_acceptable_keypoint_match,
            min_pose_diff=cfg.min_pose_differnece_between_old_new,
            max_pose_diff=cfg.max_pose_differnece_between_old_new,
            max_loop_dist=cfg.max_pose_distance_between_loop_keyframes,
            num_hypotheses=256)

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
