"""Visual-odometry pipeline orchestrator.

Equivalent of the reference `VisualOdometry`
(/root/reference/src/visual_odometry.cpp:22-191): wires dataset, frontend,
backend, loop closure and viewer from a config, drives the frame loop, and
saves the outputs. The reference's thread topology (backend + loop-closure
worker threads, SURVEY.md §1) becomes a deterministic schedule: BA runs after
every keyframe insertion (synchronous but device-async — the host enqueues
the BA program and keeps feeding frames; XLA serializes on data dependencies).

Host responsibilities only: image I/O, status machine, archives of evicted
keyframes/landmarks, output files. All numerics are the jitted programs in
frontend.py / backend.py.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.ops import image as imops
from stereovision_slam_tpu.slam import frontend as fe
from stereovision_slam_tpu.slam import map_state as mapmod
from stereovision_slam_tpu.slam.config import SlamConfig
from stereovision_slam_tpu.slam import outputs as out_mod


@dataclass
class KeyframeRecord:
    frame_id: int
    kf_id: int
    pose: np.ndarray                   # (3, 4) Tcw — refreshed on archive
    rel_to_prev: np.ndarray | None = None  # (3, 4), for pose-graph edges


class VisualOdometry:
    """Drives the full SLAM pipeline over a dataset."""

    def __init__(self, config: SlamConfig, dataset, viewer=None, backend=None,
                 loop_closure=None):
        self.cfg = config
        self.dataset = dataset
        self.viewer = viewer
        self.backend = backend
        self.loop_closure = loop_closure

        self.status = fe.FrontendStatus.INITING
        self.fs: fe.FrontendState | None = None
        self.ms: mapmod.MapState | None = None
        self.kf_count = 0
        self.frame_count = 0
        # host archives (the reference's all_keyframes / all_landmarks maps)
        self.archived_keyframes: dict[int, KeyframeRecord] = {}
        self.archived_landmarks: dict[int, np.ndarray] = {}
        self.archived_landmark_first_kf: dict[int, int] = {}
        self.frame_times: list[float] = []
        self.inlier_history: list[int] = []

        self._pyramid_fn = jax.jit(
            lambda img: tuple(imops.build_pyramid(img, config.lk_num_levels)))

    # ------------------------------------------------------------------ #

    def initialize(self) -> None:
        self.dataset.initialize()
        self.cam_left = self.dataset.get_camera(self.dataset.left_cam_index)
        self.cam_right = self.dataset.get_camera(self.dataset.right_cam_index)
        cfg = self.cfg
        self.ms = mapmod.empty_map(cfg.max_keyframes_window, cfg.max_features,
                                   cfg.max_landmarks)

    def step(self) -> bool:
        """Process one frame; returns False at end of sequence
        (visual_odometry.cpp:109-156)."""
        frame = self.dataset.next_frame()
        if frame is None:
            return False
        t0 = time.perf_counter()
        self._add_frame(frame)
        self.frame_times.append(time.perf_counter() - t0)
        if self.viewer is not None:
            self.viewer.add_current_frame(frame, self)
        return True

    def run(self) -> None:
        """Full-sequence loop + shutdown (visual_odometry.cpp:158-191)."""
        while self.step():
            pass
        self.finish()

    # ------------------------------------------------------------------ #

    def _add_frame(self, frame) -> None:
        cfg = self.cfg
        left = jnp.asarray(frame.left, jnp.float32)
        pyr = self._pyramid_fn(left)

        if self.status == fe.FrontendStatus.INITING:
            self._stereo_init(frame, pyr)
            return

        if cfg.frontend_stereo_pose:
            right = jnp.asarray(frame.right, jnp.float32)
            right_pyr, cam_r = self._pyramid_fn(right), self.cam_right
        else:  # reference-faithful: mono left-camera pose solve
            right_pyr, cam_r = None, None
        fs_new, n_in, n_tracked = fe.track_step(
            self.fs, self.ms, pyr, self.cam_left, right_pyr, cam_r,
            chi2_th=cfg.chi2_th,
            rounds=cfg.pose_rounds, iters=cfg.pose_iters_per_round,
            anchored=bool(cfg.frontend_anchored_lk),
            multi_start=bool(cfg.frontend_multi_start))
        self.fs = fs_new
        num_inliers = int(n_in)
        self.inlier_history.append(num_inliers)

        # status machine (frontend.cpp:664-679)
        if num_inliers > cfg.num_features_tracking:
            self.status = fe.FrontendStatus.TRACKING_GOOD
        elif num_inliers > cfg.num_features_tracking_bad:
            self.status = fe.FrontendStatus.TRACKING_BAD
        else:
            self.status = fe.FrontendStatus.LOST

        if (num_inliers < cfg.num_features_needed_for_keyframe
                and self.status != fe.FrontendStatus.LOST):
            self._insert_keyframe(frame)
        elif self.status == fe.FrontendStatus.LOST:
            # relocalization — the reference's Frontend::Reset is an
            # unimplemented stub (frontend.cpp:723-731); here a lost frame
            # attempts descriptor matching + PnP against the last keyframe's
            # landmarks, and on success re-anchors and rebuilds features
            if self._relocalize(frame):
                self._insert_keyframe(frame)
                self.status = fe.FrontendStatus.TRACKING_BAD

        self.frame_count = frame.frame_id + 1

    def _stereo_init(self, frame, pyr) -> None:
        """StereoInit path (frontend.cpp:216-249)."""
        cfg = self.cfg
        self.fs = fe.init_state(cfg.max_features, pyr)
        right = jnp.asarray(frame.right, jnp.float32)
        right_pyr = self._pyramid_fn(right)
        fs, ms, ev, n_new, n_right = fe.keyframe_step(
            self.fs, self.ms, right_pyr, self.cam_left, self.cam_right,
            frame.frame_id, self.kf_count,
            num_features=cfg.num_features, min_distance=cfg.gftt_min_distance,
            quality_level=cfg.gftt_quality_level,
            max_depth=cfg.max_triangulation_depth,
            num_active=cfg.num_active_keyframes, detect_all=True,
            detector=cfg.keypoint_feature_detector.lower())
        if int(n_new) >= cfg.num_features_init:
            self.fs, self.ms = fs, ms
            self._register_keyframe(frame.frame_id)
            self.status = fe.FrontendStatus.TRACKING_GOOD
            self._notify_backend()
            self._snapshot_for_reloc()
            if self.viewer is not None:  # frontend.cpp:241-244
                self.viewer.log_info_mkf(
                    f"Frontend: stereo map initialized with {int(n_new)} "
                    "landmarks", self.kf_count, "frontend")
                self.viewer.update_map(self, frame)
        else:
            # stay INITING and retry next frame with a FRESH map: keyframe_step
            # donates the old MapState buffer (donate_argnums), so self.ms must
            # not keep pointing at it — on TPU the donated array is deleted and
            # the retry would crash. A fresh empty map also drops the failed
            # attempt's partial keyframe/landmarks (the reference rebuilds the
            # init map per attempt, frontend.cpp:216-249).
            self.ms = mapmod.empty_map(cfg.max_keyframes_window,
                                       cfg.max_features, cfg.max_landmarks)

    def _insert_keyframe(self, frame) -> None:
        cfg = self.cfg
        self.kf_count += 1
        right = jnp.asarray(frame.right, jnp.float32)
        right_pyr = self._pyramid_fn(right)
        self.fs, self.ms, ev, n_new, n_right = fe.keyframe_step(
            self.fs, self.ms, right_pyr, self.cam_left, self.cam_right,
            frame.frame_id, self.kf_count,
            num_features=cfg.num_features, min_distance=cfg.gftt_min_distance,
            quality_level=cfg.gftt_quality_level,
            max_depth=cfg.max_triangulation_depth,
            num_active=cfg.num_active_keyframes, detect_all=False,
            detector=cfg.keypoint_feature_detector.lower())
        self._register_keyframe(frame.frame_id)
        self._archive_eviction(ev)
        self._notify_backend()
        self._snapshot_for_reloc()
        if self.loop_closure is not None:
            self.loop_closure.add_keyframe(self, frame)
        if self.viewer is not None:
            self.viewer.log_info_mkf(
                f"Backend: optimized active window after keyframe "
                f"{self.kf_count}" if self.backend is not None else
                f"Frontend: inserted keyframe {self.kf_count}",
                self.kf_count,
                "backend" if self.backend is not None else "frontend")
            self.viewer.update_map(self, frame)

    # ------------------------------------------------------------------ #

    def _snapshot_for_reloc(self) -> None:
        """Store the new keyframe's descriptors + landmark snapshot so a
        later LOST frame can relocalize against it."""
        from stereovision_slam_tpu.ops import descriptors
        fs, ms = self.fs, self.ms
        desc, ok = descriptors.compute(fs.pyr[0], fs.feat_uv, fs.feat_valid)
        safe = jnp.clip(fs.feat_lm, 0, ms.lm_pos.shape[0] - 1)
        lm_has = fs.feat_valid & (fs.feat_lm >= 0) & ms.lm_valid[safe]
        # the extra fields let LoopClosure._process reuse this snapshot
        # instead of recomputing the descriptor kernel on the same frame
        self._reloc = {
            "desc": desc, "ok": ok,
            "lm_pos": ms.lm_pos[safe], "lm_has": lm_has,
            "lm_id": ms.lm_id[safe], "lm_first_kf": ms.lm_first_kf[safe],
            "kf_id": self.kf_count,
        }

    def _relocalize(self, frame) -> bool:
        """PnP against the last keyframe's landmarks via descriptor matching.
        Returns True when a confident pose was recovered (and set)."""
        if getattr(self, "_reloc", None) is None:
            return False
        from stereovision_slam_tpu.ops import descriptors, gftt
        from stereovision_slam_tpu.slam.pnp import pnp_ransac
        cfg = self.cfg
        left = self.fs.pyr[0]  # current frame (track_step already ran)
        pts, valid, _ = gftt.detect(left, max_corners=cfg.max_features,
                                    quality_level=cfg.gftt_quality_level,
                                    min_distance=cfg.gftt_min_distance)
        desc, ok = descriptors.compute(left, pts, valid)
        r = self._reloc
        from stereovision_slam_tpu.slam.loop_closure import _match_and_count
        idx, usable, n_match = _match_and_count(
            r["desc"], r["ok"], desc, ok, r["lm_has"])
        if int(n_match) < 10:
            return False
        T_new, inl, n_in = pnp_ransac(
            self.cam_left, r["lm_pos"], pts[idx], usable,
            jax.random.PRNGKey(frame.frame_id), reproj_threshold=5.991,
            num_hypotheses=256)
        if int(n_in) < 10:
            return False
        self.fs = self.fs._replace(T_cur=T_new,
                                   T_rel=jnp.asarray(se3.se3_identity()),
                                   feat_valid=jnp.zeros_like(self.fs.feat_valid),
                                   feat_lm=jnp.full_like(self.fs.feat_lm, -1))
        if self.viewer is not None:
            self.viewer.log_info("Frontend: relocalized after tracking loss",
                                 "frontend")
        return True

    def _register_keyframe(self, frame_id: int) -> None:
        pose = np.asarray(self.fs.T_cur)
        rel = None
        prev = self.archived_keyframes.get(self.kf_count - 1)
        if prev is not None:
            rel = np.asarray(se3.se3_compose(
                jnp.asarray(pose), se3.se3_inverse(jnp.asarray(prev.pose))))
        self.archived_keyframes[self.kf_count] = KeyframeRecord(
            frame_id=frame_id, kf_id=self.kf_count, pose=pose,
            rel_to_prev=rel)

    def _archive_eviction(self, ev: mapmod.EvictedKeyframe) -> None:
        if not bool(ev.happened):
            return
        kf_id = int(ev.kf_id)
        if kf_id in self.archived_keyframes:
            self.archived_keyframes[kf_id].pose = np.asarray(ev.pose)
        mask = np.asarray(ev.lm_archived)
        if mask.any():
            ids = np.asarray(ev.lm_id)[mask]
            pos = np.asarray(ev.lm_pos)[mask]
            firsts = np.asarray(ev.lm_first_kf)[mask]
            for i, p, fk in zip(ids, pos, firsts):
                self.archived_landmarks[int(i)] = p
                self.archived_landmark_first_kf[int(i)] = int(fk)

    def _notify_backend(self) -> None:
        if self.backend is not None:
            self.ms = self.backend.optimize(self.ms, self.cam_left,
                                            self.cam_right)
            # refresh frontend pose from the newest (BA-refined) keyframe
            newest = int(jnp.argmax(jnp.where(self.ms.kf_valid, self.ms.kf_id, -1)))
            self.fs = self.fs._replace(T_cur=self.ms.kf_pose[newest])
            self._refresh_relative_poses()

    def _refresh_relative_poses(self) -> None:
        """Refresh archive poses + consecutive relative poses of the active
        window after BA (the reference's relative_pose_pkf_ refresh,
        backend.cpp:223-247)."""
        ms = self.ms
        kf_valid = np.asarray(ms.kf_valid)
        ids = np.asarray(ms.kf_id)
        poses = np.asarray(ms.kf_pose)
        active = {int(ids[s]): poses[s] for s in np.nonzero(kf_valid)[0]}
        for kf_id, pose in active.items():
            rec = self.archived_keyframes.get(kf_id)
            if rec is None:
                continue
            rec.pose = pose
            prev = self.archived_keyframes.get(kf_id - 1)
            if prev is not None:
                rec.rel_to_prev = np.asarray(se3.se3_compose(
                    jnp.asarray(pose),
                    se3.se3_inverse(jnp.asarray(prev.pose))))

    # ------------------------------------------------------------------ #

    def _sync_active_to_archive(self) -> None:
        """Fold the live window into the host archives (end of run)."""
        ms = self.ms
        kf_valid = np.asarray(ms.kf_valid)
        for slot in np.nonzero(kf_valid)[0]:
            kf_id = int(ms.kf_id[slot])
            fid = int(ms.kf_frame_id[slot])
            rec = self.archived_keyframes.get(kf_id)
            pose = np.asarray(ms.kf_pose[slot])
            if rec is None:
                self.archived_keyframes[kf_id] = KeyframeRecord(
                    frame_id=fid, kf_id=kf_id, pose=pose)
            else:
                rec.pose = pose
        lm_valid = np.asarray(ms.lm_valid)
        ids = np.asarray(ms.lm_id)
        pos = np.asarray(ms.lm_pos)
        firsts = np.asarray(ms.lm_first_kf)
        for slot in np.nonzero(lm_valid)[0]:
            self.archived_landmarks[int(ids[slot])] = pos[slot]
            self.archived_landmark_first_kf[int(ids[slot])] = int(firsts[slot])

    def finish(self) -> None:
        """Shutdown: drain loop closure (incl. global PGO), stop backend,
        sync archives (visual_odometry.cpp:174-190)."""
        if self.loop_closure is not None:
            self.loop_closure.stop(self)
        self._sync_active_to_archive()
        if self.viewer is not None:
            self.viewer.close()

    def save_output(self, timestamped_subdir: bool = True) -> str:
        self._sync_active_to_archive()
        keyframes = [(rec.frame_id, rec.pose)
                     for rec in self.archived_keyframes.values()]
        landmarks = (np.stack(list(self.archived_landmarks.values()))
                     if self.archived_landmarks else np.zeros((0, 3)))
        return out_mod.save_slam_output(
            self.cfg.output_dir, getattr(self.dataset, "dataset_dir", ""),
            self.dataset.left_cam_index, keyframes, landmarks,
            timestamped_subdir=timestamped_subdir)

    # ------------------------------------------------------------------ #

    def trajectory(self) -> dict[int, np.ndarray]:
        """frame_id -> (3, 4) Tcw for every keyframe (latest estimates)."""
        self._sync_active_to_archive()
        return {rec.frame_id: rec.pose
                for rec in self.archived_keyframes.values()}

    def fps(self) -> float:
        if not self.frame_times:
            return 0.0
        return len(self.frame_times) / sum(self.frame_times)
