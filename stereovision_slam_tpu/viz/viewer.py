"""Rerun-based visualization (with a JSONL fallback when rerun is absent).

Equivalent of the reference `Viewer` (/root/reference/src/viewer.cpp): spawns
the Rerun viewer process (:22), sets up world axes + two scalar plots
(:24-42), renders active keyframe frusta / newest-left-image / active
landmarks / full trajectory (:56-145), and writes component-colored text logs
on the `currentframe_id` and `max_keyframe_id` timelines (:147-190). Entity
paths and timeline names match the reference so recordings look the same.

The rerun Python SDK is optional: without it, every event is appended to a
JSONL file (one object per call) so pipelines remain observable and testable
headless.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

try:
    import rerun as rr
    _HAS_RERUN = True
except ImportError:  # pragma: no cover - environment-dependent
    rr = None
    _HAS_RERUN = False

# component log colors (viewer.h:60-64)
_COLORS = {
    "frontend": (255, 215, 0),
    "backend": (0, 255, 255),
    "loopclosure": (255, 0, 255),
    "vo": (255, 255, 255),
}


class Viewer:
    def __init__(self, app_id: str = "stereovision_slam_tpu",
                 spawn: bool = True, jsonl_path: str | None = None):
        self.enabled = _HAS_RERUN
        self.jsonl_path = jsonl_path
        self._jsonl = None
        if self.enabled:
            rr.init(app_id, spawn=spawn)
            # world axes + plot styling (viewer.cpp:24-42)
            rr.log("world", rr.ViewCoordinates.RIGHT_HAND_Y_DOWN, static=True)
            for name in ("plots/frontend_inlier_ratio", "plots/loop_deep_score"):
                rr.log(name, rr.SeriesLine(), static=True)
        elif jsonl_path:
            self._jsonl = open(jsonl_path, "a")

    # ------------------------------------------------------------------ #

    def _emit(self, obj: dict) -> None:
        if self._jsonl is not None:
            obj["ts"] = time.time()
            self._jsonl.write(json.dumps(obj) + "\n")
            self._jsonl.flush()

    def add_current_frame(self, frame, vo) -> None:
        """Per-frame hook from the pipeline (viewer AddCurrentFrame)."""
        if self.enabled:
            rr.set_time_sequence("currentframe_id", frame.frame_id)
        if vo.inlier_history:
            self.plot("plots/frontend_inlier_ratio",
                      vo.inlier_history[-1] / max(vo.cfg.num_features, 1),
                      frame.frame_id)

    def update_map(self, vo) -> None:
        """Keyframe-rate map rendering (viewer.cpp:56-145)."""
        ms = vo.ms
        if ms is None:
            return
        kf_valid = np.asarray(ms.kf_valid)
        lm_valid = np.asarray(ms.lm_valid)
        lms = np.asarray(ms.lm_pos)[lm_valid]
        traj = sorted(((r.frame_id, r.pose)
                       for r in vo.archived_keyframes.values()))
        centers = []
        for _, pose in traj:
            R, t = pose[:, :3], pose[:, 3]
            centers.append((-R.T @ t).tolist())
        if self.enabled:
            rr.set_time_sequence("max_keyframe_id", vo.kf_count)
            rr.log("world/landmarks", rr.Points3D(lms))
            if centers:
                rr.log("world/trajectory", rr.LineStrips3D([centers]))
            for slot in np.nonzero(kf_valid)[0]:
                pose = np.asarray(ms.kf_pose[slot])
                R, t = pose[:, :3], pose[:, 3]
                rr.log(f"world/keyframes/kf_{int(ms.kf_id[slot])}",
                       rr.Transform3D(translation=(-R.T @ t),
                                      mat3x3=R.T))
        else:
            self._emit({"event": "update_map",
                        "num_landmarks": int(lm_valid.sum()),
                        "num_active_kf": int(kf_valid.sum()),
                        "trajectory_len": len(centers)})

    def log_info(self, msg: str, component: str = "vo") -> None:
        if self.enabled:
            rr.log("logs", rr.TextLog(msg, color=_COLORS.get(component)))
        else:
            self._emit({"event": "log", "component": component, "msg": msg})

    def plot(self, name: str, value: float, t: int) -> None:
        if self.enabled:
            rr.set_time_sequence("currentframe_id", t)
            rr.log(name, rr.Scalar(float(value)))
        else:
            self._emit({"event": "plot", "name": name, "value": float(value),
                        "t": int(t)})

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None
