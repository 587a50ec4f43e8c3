"""Guard: no array constants embedded in the streaming hot-path programs.

The axon TPU runtime executes any program embedding a dense ARRAY constant
(>= 2 elements of float/pred data) ~100x slower AND permanently degrades
every subsequent dispatch in the process (measured; docs/PERFORMANCE.md
"array-constant cliff"). Constants sneak in two ways:

  1. closure-captured arrays — visible in the UNOPTIMIZED StableHLO, which
     this test checks on the CPU backend (the CPU executable printer elides
     constants, so the optimized-HLO audit can't run here);
  2. XLA constant-folding of trace-time-known values (the old left/right
     selector in slam/backend.py, qdwh tables inside jnp.linalg.svd — both
     eliminated structurally) — only visible in the TPU-optimized HLO;
     audited on real hardware by benchmarks/audit_constants.py, which the
     benchmark workflow runs per round.

Small s32/u32 index vectors (dynamic-slice clamp bounds, scatter dims) are
lowering artifacts, measured benign, and allowlisted.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.geometry.camera import Camera
from stereovision_slam_tpu.ops import image as imops
from stereovision_slam_tpu.slam import frontend as fe
from stereovision_slam_tpu.slam import fused, map_state as mapmod
from stereovision_slam_tpu.slam.backend import optimize_window
from stereovision_slam_tpu.slam.config import SlamConfig

cfg = SlamConfig()

_DENSE = re.compile(
    r"stablehlo\.constant.*?dense<\[.*tensor<(\d+)x([0-9x]*)(f32|f64|bf16|f16|i1|s32|u32|pred)>")


def _stablehlo_offenders(lowered_text: str, allow_int_upto: int = 8):
    """Array constants in StableHLO text; ints <= allow_int_upto elements are
    allowlisted (index vectors, measured benign)."""
    out = []
    for line in lowered_text.splitlines():
        if "stablehlo.constant" not in line:
            continue
        m = re.search(r"tensor<((?:\d+x)+)(\w+)>", line)
        if not m:
            continue  # scalar
        dims = [int(x) for x in m.group(1).split("x") if x]
        n = int(np.prod(dims))
        dt = m.group(2)
        if n < 2:
            continue
        if dt.startswith(("i", "u", "s")) and dt != "i1" and n <= allow_int_upto:
            continue
        # splat constants (dense<0.0e0>) are broadcasts, not data tables
        if "dense<[" not in line and "dense<\"" not in line:
            continue
        out.append((dt, "x".join(str(d) for d in dims), line.strip()[:120]))
    return out


def _scene():
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
    return rig, img, pyr, ms, fs


def test_guard_catches_poisoned_program():
    """Canary: a closure-captured array must be flagged."""
    const = jnp.asarray(np.arange(64, dtype=np.float32))
    txt = jax.jit(lambda v: v * const + const).lower(
        jnp.ones((64,))).as_text()
    assert _stablehlo_offenders(txt), \
        "audit failed to flag a closure-captured array constant"


def test_fused_step_has_no_array_constants():
    rig, img, pyr, ms, fs = _scene()
    arc = fused.empty_archive(256, 4096)
    txt = fused.fused_step.lower(
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
        num_features_init=cfg.num_features_init).as_text()
    assert not _stablehlo_offenders(txt), _stablehlo_offenders(txt)


def test_track_step_has_no_array_constants():
    rig, img, pyr, ms, fs = _scene()
    txt = fe.track_step.lower(fs, ms, pyr, rig[0], pyr, rig[1],
                              chi2_th=cfg.chi2_th).as_text()
    assert not _stablehlo_offenders(txt), _stablehlo_offenders(txt)


def test_keyframe_step_has_no_array_constants():
    rig, img, pyr, ms, fs = _scene()
    txt = fe.keyframe_step.lower(
        fs, ms, pyr, rig[0], rig[1], jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        num_features=cfg.num_features, min_distance=cfg.gftt_min_distance,
        quality_level=cfg.gftt_quality_level,
        max_depth=cfg.max_triangulation_depth,
        num_active=cfg.num_active_keyframes, detect_all=True,
        detector="gftt").as_text()
    assert not _stablehlo_offenders(txt), _stablehlo_offenders(txt)


def test_optimize_window_has_no_array_constants():
    rig, img, pyr, ms, fs = _scene()
    txt = optimize_window.lower(ms, rig[0], rig[1], chi2_th=cfg.chi2_th,
                                iters=cfg.ba_lm_iters).as_text()
    assert not _stablehlo_offenders(txt), _stablehlo_offenders(txt)
