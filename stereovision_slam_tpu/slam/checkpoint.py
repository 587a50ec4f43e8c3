"""Mid-run checkpoint / resume of the full SLAM state.

New capability relative to the reference, which can only write terminal
outputs (SURVEY.md §5: keyframes.txt + landmarks.pcd at shutdown,
visual_odometry.cpp:198-310). The whole pipeline state — map arrays,
frontend state (including the last-frame pyramid), host archives, counters —
round-trips through one compressed .npz, so a crashed or preempted run
resumes exactly where it stopped.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.slam import frontend as fe
from stereovision_slam_tpu.slam import map_state as mapmod
from stereovision_slam_tpu.slam.pipeline import KeyframeRecord

FORMAT_VERSION = 1


def save_checkpoint(vo, path: str) -> None:
    """Serialize a VisualOdometry's complete state."""
    arrays = {}
    for name, val in vo.ms._asdict().items():
        arrays[f"ms.{name}"] = np.asarray(val)
    fs = vo.fs
    arrays["fs.T_cur"] = np.asarray(fs.T_cur)
    arrays["fs.T_rel"] = np.asarray(fs.T_rel)
    arrays["fs.feat_uv"] = np.asarray(fs.feat_uv)
    arrays["fs.feat_lm"] = np.asarray(fs.feat_lm)
    arrays["fs.feat_valid"] = np.asarray(fs.feat_valid)
    arrays["fs.ref_uv"] = np.asarray(fs.ref_uv)
    for i, level in enumerate(fs.pyr):
        arrays[f"fs.pyr.{i}"] = np.asarray(level)
    for i, level in enumerate(fs.ref_pyr):
        arrays[f"fs.ref_pyr.{i}"] = np.asarray(level)

    lc_meta = None
    lc = getattr(vo, "loop_closure", None)
    if lc is not None:
        lc_meta = {
            "entries": [],
            "loop_edges": [
                {"kf_id": e.kf_id, "loop_kf_id": e.loop_kf_id,
                 "relative_pose": np.asarray(e.relative_pose).tolist()}
                for e in lc.loop_edges],
            "last_closed_kf_id": lc.last_closed_kf_id,
            "last_deep_score": lc.last_deep_score,
        }
        for kf_id, p in lc.db.items():
            lc_meta["entries"].append(
                {"kf_id": p.kf_id, "frame_id": p.frame_id})
            for field in ("embedding", "desc", "desc_ok", "feat_uv",
                          "lm_pos", "lm_has", "lm_id", "lm_first_kf", "pose"):
                arrays[f"lc.{kf_id}.{field}"] = np.asarray(getattr(p, field))

    meta = {
        "version": FORMAT_VERSION,
        "lc": lc_meta,
        "status": vo.status.name,
        "kf_count": vo.kf_count,
        "frame_count": vo.frame_count,
        "dataset_index": getattr(vo.dataset, "current_index", 0),
        "num_pyr_levels": len(fs.pyr),
        "keyframes": [
            {"kf_id": r.kf_id, "frame_id": r.frame_id,
             "pose": r.pose.tolist(),
             "rel_to_prev": (r.rel_to_prev.tolist()
                             if r.rel_to_prev is not None else None)}
            for r in vo.archived_keyframes.values()
        ],
        "landmarks": {str(k): v.tolist()
                      for k, v in vo.archived_landmarks.items()},
        "landmark_first_kf": {str(k): v for k, v in
                              vo.archived_landmark_first_kf.items()},
        "inlier_history": vo.inlier_history,
    }
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def save_fused_checkpoint(vo, path: str) -> None:
    """Serialize a Fused/Scan/Unrolled/FusedLoop VisualOdometry's streaming
    state (fs/ms/arc/kf_count/outputs + device loop DB when present). A
    deliberate device->host sync point — see FusedVisualOdometry.state_dict."""
    arrays, meta = vo.state_dict()
    meta["version"] = FORMAT_VERSION
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_fused_checkpoint(vo, path: str) -> None:
    """Restore state saved by :func:`save_fused_checkpoint` into an
    initialize()d streaming pipeline of the same mode/config."""
    data = np.load(path)
    meta = json.loads(bytes(data["meta_json"]).decode())
    if meta["version"] != FORMAT_VERSION:
        from stereovision_slam_tpu.utils.exceptions import CheckpointError
        raise CheckpointError(
            f"checkpoint version {meta['version']} unsupported")
    if meta["mode"] != type(vo).__name__:
        from stereovision_slam_tpu.utils.exceptions import CheckpointError
        raise CheckpointError(
            f"checkpoint was written by {meta['mode']}, "
            f"loading into {type(vo).__name__}")
    vo.load_state_dict({k: data[k] for k in data.files if k != "meta_json"},
                       meta)


def load_checkpoint(vo, path: str) -> None:
    """Restore state saved by :func:`save_checkpoint` into an initialized
    VisualOdometry (dataset/config must match)."""
    data = np.load(path)
    meta = json.loads(bytes(data["meta_json"]).decode())
    if meta["version"] != FORMAT_VERSION:
        from stereovision_slam_tpu.utils.exceptions import CheckpointError
        raise CheckpointError(
            f"checkpoint version {meta['version']} unsupported")

    ms_kwargs = {name.split(".", 1)[1]: jnp.asarray(data[name])
                 for name in data.files if name.startswith("ms.")}
    vo.ms = mapmod.MapState(**ms_kwargs)

    pyr = tuple(jnp.asarray(data[f"fs.pyr.{i}"])
                for i in range(meta["num_pyr_levels"]))
    vo.fs = fe.FrontendState(
        T_cur=jnp.asarray(data["fs.T_cur"]),
        T_rel=jnp.asarray(data["fs.T_rel"]),
        feat_uv=jnp.asarray(data["fs.feat_uv"]),
        feat_lm=jnp.asarray(data["fs.feat_lm"]),
        feat_valid=jnp.asarray(data["fs.feat_valid"]),
        pyr=pyr,
        ref_uv=jnp.asarray(data["fs.ref_uv"]),
        ref_pyr=tuple(jnp.asarray(data[f"fs.ref_pyr.{i}"])
                      for i in range(meta["num_pyr_levels"])),
    )
    vo.status = fe.FrontendStatus[meta["status"]]
    vo.kf_count = meta["kf_count"]
    vo.frame_count = meta["frame_count"]
    if hasattr(vo.dataset, "current_index"):
        vo.dataset.current_index = meta["dataset_index"]
    vo.archived_keyframes = {
        kf["kf_id"]: KeyframeRecord(
            frame_id=kf["frame_id"], kf_id=kf["kf_id"],
            pose=np.asarray(kf["pose"], np.float32),
            rel_to_prev=(np.asarray(kf["rel_to_prev"], np.float32)
                         if kf["rel_to_prev"] is not None else None))
        for kf in meta["keyframes"]
    }
    vo.archived_landmarks = {int(k): np.asarray(v, np.float32)
                             for k, v in meta["landmarks"].items()}
    vo.archived_landmark_first_kf = {
        int(k): int(v) for k, v in meta["landmark_first_kf"].items()}
    vo.inlier_history = list(meta["inlier_history"])

    lc = getattr(vo, "loop_closure", None)
    lc_meta = meta.get("lc")
    if lc is not None and lc_meta is not None:
        from stereovision_slam_tpu.slam.loop_closure import (
            LoopEdge, ProcessedKeyframe)
        lc.db = {}
        for ent in lc_meta["entries"]:
            kf_id = ent["kf_id"]
            fields = {f: data[f"lc.{kf_id}.{f}"]
                      for f in ("embedding", "desc", "desc_ok", "feat_uv",
                                "lm_pos", "lm_has", "lm_id", "lm_first_kf",
                                "pose")}
            lc.db[kf_id] = ProcessedKeyframe(
                kf_id=kf_id, frame_id=ent["frame_id"], **fields)
        lc.loop_edges = [
            LoopEdge(kf_id=e["kf_id"], loop_kf_id=e["loop_kf_id"],
                     relative_pose=np.asarray(e["relative_pose"], np.float32))
            for e in lc_meta["loop_edges"]]
        lc.last_closed_kf_id = lc_meta["last_closed_kf_id"]
        lc.last_deep_score = lc_meta["last_deep_score"]
        lc.invalidate_scan_cache()
