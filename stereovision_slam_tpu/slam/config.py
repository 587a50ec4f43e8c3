"""SLAM configuration.

Replaces the reference's OpenCV-FileStorage singleton
(/root/reference/src/config.cpp:15-35, config.h:8-34) with a plain dataclass.
Key names match default.yaml (config/stereo_slam_configs/default.yaml:1-57) so
the reference's per-sequence YAML files drop in unchanged; the OpenCV
"%YAML:1.0" directive line is tolerated.

Static capacities (feature slots, window sizes, landmark table size) live here
too — they size every fixed-shape device buffer, which the reference's
pointer-graph design never needed.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import yaml


# The PlaceNet loop-closure operating point: ONE shared gate set used by
# both bench scenes AND every loop-closure scene test (circuit, figure-eight,
# perceptual-aliasing arena, straight corridor) unchanged — the analogue of
# the reference shipping default.yaml gates that work across KITTI 00-09
# with only small per-sequence overrides (config/stereo_slam_configs/).
# Measured basis (round 5, tests/test_loop_scenes.py + /tmp gate sweep):
#   * true revisits score 0.94-1.00 (figure-eight worst case 0.46),
#     false argmax candidates <= 0.61 even on the 4-fold aliased wall ->
#     strong 0.65 separates with margin on every scene;
#   * the self-similar straight corridor pushes 32-64 database entries above
#     0.5 -> max_weak 12 suppresses exactly that ambiguity (the reference's
#     max_num_weak_threshold mechanism, loopclosure.cpp:259-276);
#   * skip 24 keyframes excludes trivially-overlapping recent views at every
#     keyframe cadence used by the tests/bench.
# Per-scene overrides are allowed only for the keys the reference's own
# per-sequence configs touch (num_features(_init), keyframe threshold,
# strong/weak thresholds, min_match, pose-distance bounds).
PLACENET_LOOP_GATES = dict(
    potential_loop_strong_threshold=0.65,
    potential_loop_weak_threshold=0.50,
    max_num_weak_threshold=12,
    keyframes_to_skip_in_candidate_search=24,
    keyframes_to_ignore_after_loop=5,
    min_num_acceptable_keypoint_match=10,
)


@dataclass
class SlamConfig:
    # --- dataset (default.yaml:4-9) ---
    dataset_dir: str = ""
    left_cam_index: int = 0
    right_cam_index: int = 1
    is_color_input: int = 0
    output_dir: str = "./outputs/SLAM-outputs"

    # --- frontend (default.yaml:12-21) ---
    num_features: int = 150
    num_features_init: int = 50
    num_features_tracking: int = 50
    num_features_tracking_bad: int = 20
    num_features_needed_for_keyframe: int = 80
    max_triangulation_depth: float = 300.0
    keypoint_feature_detector: str = "GFTT"

    # --- map (default.yaml:26) ---
    num_active_keyframes: int = 10

    # --- backend (default.yaml:31-32) ---
    backend_on: int = 1
    chi2_th: float = 5.991

    # --- loop closure (default.yaml:37-47) ---
    loopclosure_on: int = 1
    # reference hardcodes this path (loopclosure.cpp:81); .onnx loads via the
    # built-in reader, .pth via the torchvision converter; thumbnail
    # embedder fallback when the file is absent
    dnn_weights_path: str = "./dnn_weights/mobilenet_v2.onnx"
    keyframes_to_ignore_after_loop: int = 5
    potential_loop_weak_threshold: float = 0.92
    potential_loop_strong_threshold: float = 0.95
    max_num_weak_threshold: int = 3
    min_num_acceptable_keypoint_match: int = 11
    min_pose_differnece_between_old_new: float = 1.0   # [sic] reference key
    max_pose_differnece_between_old_new: float = 50.0  # [sic] reference key
    max_pose_distance_between_loop_keyframes: float = 20.0
    global_pose_graph_optimization: int = 1

    # --- visualization (default.yaml:52) ---
    visualizer_on: int = 1

    # --- TPU-native static capacities (new; no reference analogue) ---
    max_features: int = 256          # feature slots per frame (>= num_features)
    max_landmarks: int = 4096        # active landmark table size
    max_keyframes_window: int = 16   # padded active-KF window (>= num_active_keyframes)
    max_total_keyframes: int = 4096  # pose-graph capacity
    lk_num_levels: int = 4           # cv maxLevel=3 -> 4 levels (frontend.cpp:107)
    lk_win_size: int = 11
    lk_max_iters: int = 30
    gftt_quality_level: float = 0.01
    gftt_min_distance: int = 20
    keyframes_to_skip_in_candidate_search: int = 20  # loopclosure.cpp:243-247
    pose_rounds: int = 4             # frontend.cpp:481-524
    pose_iters_per_round: int = 10
    # Documented tracking deviations from the reference, individually
    # toggleable so their effect is MEASURED, not argued
    # (tests/test_reference_faithful.py). All three off + defaults above =
    # the reference's exact tracking topology (frontend.cpp:322-392,
    # 394-558: frame-to-frame LK, single constant-velocity init, mono
    # left-camera pose solve).
    frontend_anchored_lk: int = 1    # re-localize vs anchor keyframe template
    frontend_stereo_pose: int = 1    # solve per-frame pose over L+R residuals
    frontend_multi_start: int = 1    # 3-init LM pose solve
    ba_lm_iters: int = 10            # backend.cpp:162-164
    ba_outlier_rounds: int = 5       # backend.cpp:166-193
    # BA landmark-axis compaction: the solver gathers the <= this-many
    # landmarks that actually hold observations into a dense sub-table before
    # assembling normal equations (4x memory/time at the defaults; see
    # slam/backend.py optimize_window). Must be >= the realistic active
    # landmark count (window keyframes x features tracked); 0 disables.
    ba_max_active_landmarks: int = 1024
    ba_every_kth_keyframe: int = 1   # run BA on every k-th keyframe (1 =
    #   the reference's per-keyframe cadence, backend.cpp:289-294).
    #   Measured on the circuit bench scene: k=2 degrades pre-PGO ATE
    #   ~7x (0.077 -> 0.53 m / 42 m) AND inserts ~40% more keyframes
    #   (unrefined poses shed inliers faster), eating the savings — keep 1
    #   unless a deployment tolerates the accuracy trade
    image_height: int = 188          # KITTI 2x-downsampled (dataset.cpp:126-129)
    image_width: int = 620

    @staticmethod
    def from_yaml(path: str) -> "SlamConfig":
        import os
        from stereovision_slam_tpu.utils.exceptions import ConfigError
        if not os.path.exists(path):
            raise ConfigError(f"config file not found: {path}")
        with open(path) as f:
            text = f.read()
        # tolerate the OpenCV FileStorage "%YAML:1.0" directive
        lines = [ln for ln in text.splitlines() if not ln.startswith("%YAML")]
        data = yaml.safe_load("\n".join(lines)) or {}
        cfg = SlamConfig()
        known = {f.name: f for f in dataclasses.fields(SlamConfig)}
        for key, value in data.items():
            key = key.strip()
            if key in known:
                setattr(cfg, key, type(getattr(cfg, key))(value))
        return cfg

    def get(self, key: str, default: Any = None) -> Any:
        """Config::Get<T>-style access by reference key name (config.h:29-33)."""
        return getattr(self, key, default)
