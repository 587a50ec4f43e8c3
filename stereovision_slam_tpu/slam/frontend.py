"""Tracking frontend: batched detection, LK tracking, pose solve, keyframing.

TPU-native redesign of the reference `Frontend`
(/root/reference/src/frontend.cpp): the per-frame hot path is ONE jitted
program (`track_step`) — LK last->current with landmark-reprojection initial
guesses (frontend.cpp:322-392), then the 4x10 LM pose schedule
(frontend.cpp:394-558) — and keyframe insertion is a second jitted program
(`keyframe_step`) covering DetectFeatures + FindFeaturesInRight +
TriangulateNewPoints + map insertion (frontend.cpp:576-643, 143-214).

The reference's per-feature pointer graph becomes F fixed feature slots with
(uv, landmark-slot, valid) arrays; the status machine (INITING / GOOD / BAD /
LOST, frontend.cpp:645-721) stays on the host where it belongs — it's
control flow between device programs.
"""

from __future__ import annotations

import enum
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereovision_slam_tpu.geometry import se3, jacobians
from stereovision_slam_tpu.geometry.camera import Camera, pixel2camera
from stereovision_slam_tpu.geometry import triangulation
from stereovision_slam_tpu.ops import fast, gftt, lk
from stereovision_slam_tpu.slam import map_state as mapmod
from stereovision_slam_tpu.slam.pose_solver import solve_pose, solve_pose_multi


class FrontendStatus(enum.Enum):
    INITING = 0
    TRACKING_GOOD = 1
    TRACKING_BAD = 2
    LOST = 3


class FrontendState(NamedTuple):
    T_cur: jax.Array      # (3, 4) current frame pose T_c_w
    T_rel: jax.Array      # (3, 4) constant-velocity relative motion
    feat_uv: jax.Array    # (F, 2) left-image feature positions
    feat_lm: jax.Array    # (F,) landmark slot per feature, -1 = none
    feat_valid: jax.Array # (F,) slot in use
    pyr: tuple            # last frame's left-image pyramid
    ref_uv: jax.Array     # (F, 2) feature positions at the anchor keyframe
    ref_pyr: tuple        # anchor keyframe's left-image pyramid


def init_state(F: int, pyramid, dtype=jnp.float32) -> FrontendState:
    return FrontendState(
        T_cur=se3.se3_identity(dtype),
        T_rel=se3.se3_identity(dtype),
        feat_uv=jnp.zeros((F, 2), dtype),
        feat_lm=jnp.full((F,), -1, jnp.int32),
        feat_valid=jnp.zeros((F,), bool),
        pyr=tuple(pyramid),
        ref_uv=jnp.zeros((F, 2), dtype),
        ref_pyr=tuple(pyramid),
    )


def _landmark_guesses(cam: Camera, T_guess: jax.Array, m: mapmod.MapState,
                      feat_uv: jax.Array, feat_lm: jax.Array,
                      feat_valid: jax.Array):
    """Initial LK guesses: project linked landmarks, else keep the position
    (frontend.cpp:331-352 / 82-99)."""
    safe = jnp.clip(feat_lm, 0, m.lm_pos.shape[0] - 1)
    lm_pos = m.lm_pos[safe]
    linked = feat_valid & (feat_lm >= 0) & m.lm_valid[safe]
    proj, p_cam = jacobians.project_points(cam, T_guess, lm_pos)
    use_proj = linked & (p_cam[..., 2] > 1e-3)
    guess = jnp.where(use_proj[:, None], proj, feat_uv)
    return guess, lm_pos, linked


def _blend_obs_cameras(cam_left: Camera, cam_right: Camera, n_left: int,
                       n_right: int) -> Camera:
    """Per-observation camera struct: first n_left rows left, rest right."""
    def blend(a, b):
        a_ = jnp.broadcast_to(jnp.asarray(a)[None, ...], (n_left,) + jnp.shape(a))
        b_ = jnp.broadcast_to(jnp.asarray(b)[None, ...], (n_right,) + jnp.shape(b))
        return jnp.concatenate([a_, b_], axis=0)
    return Camera(*(blend(a, b) for a, b in zip(cam_left, cam_right)))


def _stack_levels(*pyramids):
    """Stack G same-shape pyramids level-wise: list of (G, h, w) arrays."""
    return [jnp.stack(levels) for levels in zip(*pyramids)]


@partial(jax.jit, static_argnames=("chi2_th", "rounds", "iters",
                                   "anchored", "multi_start", "fused_tracks",
                                   "lk_iters", "pose_impl"))
def track_step(fs: FrontendState, m: mapmod.MapState, cur_pyr: tuple,
               cam_left: Camera, cur_right_pyr: tuple = None,
               cam_right: Camera = None, chi2_th: float = 5.991,
               rounds: int = 4, iters: int = 10,
               anchored: bool = True, multi_start: bool = True,
               fused_tracks: bool = True, lk_iters: int = 30,
               pose_impl: str | None = None):
    """Track last-frame features into the current frame and solve the pose.

    One fused device program for the reference's Track() path
    (frontend.cpp:645-688): constant-velocity pose init, LK with reprojection
    guesses, LM pose solve with outlier unlinking, motion-model update.

    Beyond the reference (which estimates the per-frame pose from the left
    camera only): when the right pyramid is supplied, features are also
    LK-matched left->right in the CURRENT frame and the pose is solved over
    both cameras' residuals. The stereo disparity pins the forward (z)
    translation absolutely — mono pose-only tracking lets coherent LK bias
    (near-field texture scaling) drag z, which was measured to diverge on
    low-parallax scenes.

    Returns (new_state, num_inliers, num_tracked). Inliers are counted on the
    left-camera residuals (reference-compatible thresholds).

    `anchored=False` / `multi_start=False` (plus `cur_right_pyr=None`)
    disable the three documented deviations and reproduce the reference's
    exact tracking topology (frame-to-frame LK, single constant-velocity
    init, mono pose solve) — the configuration the parity-bound test
    (tests/test_reference_faithful.py) measures the improvements against.

    `fused_tracks=True` (default) batches the anchored refinement and the
    right-image solve into ONE program (lk.track_batched) after the
    frame-to-frame solve: two sequential LK programs per frame instead of
    three, paying max(iterations) instead of the sum for the second pair.
    Initialization chaining is preserved — both batched solves start from
    the frame-to-frame result (the right solve's reprojection guess uses it;
    measured ATE within 11% of the sequential topology vs +80% for a fully
    independent 3-way batch, which loses the per-point chained inits).
    `fused_tracks=False` keeps the fully sequential topology.
    """
    F = fs.feat_uv.shape[0]
    T_guess = se3.se3_compose(fs.T_rel, fs.T_cur)
    stereo = cur_right_pyr is not None and cam_right is not None
    if multi_start:
        # multi-start inits for the pose solve: constant-velocity prediction,
        # zero motion, and a half-step — breaks basin-trapping when the
        # prediction drifts (see solve_pose_multi)
        half_rel = se3.se3_exp(0.5 * se3.se3_log(fs.T_rel))
        T_inits = jnp.stack([
            T_guess,
            fs.T_cur,
            se3.se3_compose(half_rel, fs.T_cur),
        ])
    else:
        T_inits = T_guess[None]
    guess, lm_pos, linked = _landmark_guesses(
        cam_left, T_guess, m, fs.feat_uv, fs.feat_lm, fs.feat_valid)

    if fused_tracks and anchored and stereo:
        # frame-to-frame first (its result seeds everything downstream) ...
        uv_a, st_a = lk.track(list(fs.pyr), list(cur_pyr), fs.feat_uv,
                              initial_pts=guess, mask=fs.feat_valid,
                              max_iters=lk_iters)
        status = st_a
        mask_c = fs.feat_valid & st_a & linked
        guess_r, _, _ = _landmark_guesses(
            cam_right, T_guess, m, uv_a, fs.feat_lm, fs.feat_valid)
        # ... then anchored refinement + right-image solve as ONE batched
        # program (max of the two iteration schedules, not the sum)
        uv_g, st_g = lk.track_batched(
            _stack_levels(fs.ref_pyr, cur_pyr),
            _stack_levels(cur_pyr, cur_right_pyr),
            jnp.stack([fs.ref_uv, uv_a]),
            jnp.stack([uv_a, guess_r]),
            jnp.stack([fs.feat_valid, mask_c]), max_iters=lk_iters)
        # trust the anchored result whenever its LK converged (see the
        # sequential branch below for rationale)
        cur_uv = jnp.where(st_g[0][:, None], uv_g[0], uv_a)
        uv_r, status_r = uv_g[1], st_g[1]
    else:
        cur_uv, status = lk.track(list(fs.pyr), list(cur_pyr), fs.feat_uv,
                                  initial_pts=guess, mask=fs.feat_valid,
                                  max_iters=lk_iters)
        if anchored:
            # drift-free refinement: re-localize against the ANCHOR
            # KEYFRAME's templates with the frame-to-frame result as
            # initialization (removes template-update drift; the reference
            # tracks frame-to-frame only, frontend.cpp:322-392, and
            # tolerates the drift)
            ref_uv, ref_status = lk.track(list(fs.ref_pyr), list(cur_pyr),
                                          fs.ref_uv, initial_pts=cur_uv,
                                          mask=fs.feat_valid,
                                          max_iters=lk_iters)
            # trust the anchored result whenever its LK converged (status
            # already encodes bounds + conditioning); an outlier gate here
            # would disable the drift correction exactly when accumulated
            # drift is largest
            cur_uv = jnp.where(ref_status[:, None], ref_uv, cur_uv)
        if stereo:
            guess_r, _, _ = _landmark_guesses(
                cam_right, T_guess, m, cur_uv, fs.feat_lm, fs.feat_valid)
            uv_r, status_r = lk.track(
                list(cur_pyr), list(cur_right_pyr), cur_uv,
                initial_pts=guess_r, mask=fs.feat_valid & status & linked,
                max_iters=lk_iters)

    tracked = fs.feat_valid & status
    num_tracked = jnp.sum(tracked).astype(jnp.int32)

    use = tracked & linked

    if pose_impl is None:
        # the fused Pallas LM solver replaces ~1.3 ms of sequential small-op
        # latency with a ~0.03 ms kernel (44x, measured v5e; see
        # ops/pose_pallas.py). CPU keeps the XLA path (fast compiles, and the
        # kernel is interpret-only there); the vmapped serving path passes
        # "xla" explicitly (slam/batched.py).
        pose_impl = "pallas" if jax.default_backend() != "cpu" else "xla"
    if stereo:
        use_r = use & status_r
        if pose_impl in ("pallas", "interpret"):
            from stereovision_slam_tpu.ops.pose_pallas import \
                solve_pose_multi_lr
            T_new, inlier2, _ = solve_pose_multi_lr(
                cam_left, cam_right, T_inits, lm_pos, cur_uv, uv_r,
                use, use_r, chi2_th=chi2_th, rounds=rounds, iters=iters,
                interpret=(pose_impl == "interpret"))
        else:
            cam_obs = _blend_obs_cameras(cam_left, cam_right, F, F)
            pts2 = jnp.concatenate([lm_pos, lm_pos], axis=0)
            obs2 = jnp.concatenate([cur_uv, uv_r], axis=0)
            valid2 = jnp.concatenate([use, use_r], axis=0)
            T_new, inlier2, _ = solve_pose_multi(
                cam_obs, T_inits, pts2, obs2, valid2, chi2_th=chi2_th,
                rounds=rounds, iters=iters)
        inlier = inlier2[:F]
        num_inliers = jnp.sum(inlier).astype(jnp.int32)
    else:
        T_new, inlier, num_inliers = solve_pose_multi(
            cam_left, T_inits, lm_pos, cur_uv, use, chi2_th=chi2_th,
            rounds=rounds, iters=iters)

    # unlink outlier features from their landmarks (frontend.cpp:544-553);
    # features that failed tracking are dead slots
    feat_lm = jnp.where(tracked & ~(use & ~inlier), fs.feat_lm, -1)

    fs_new = FrontendState(
        T_cur=T_new,
        T_rel=se3.se3_compose(T_new, se3.se3_inverse(fs.T_cur)),
        feat_uv=cur_uv,
        feat_lm=feat_lm,
        feat_valid=tracked,
        pyr=tuple(cur_pyr),
        ref_uv=fs.ref_uv,
        ref_pyr=fs.ref_pyr,
    )
    return fs_new, num_inliers, num_tracked


def track_step_serving(fs, m, cur_pyr, cam_left, cur_right_pyr, cam_right,
                       *, chi2_th: float = 5.991, rounds: int = 4,
                       iters: int = 10, lk_iters: int = 30,
                       pallas_mode=None):
    """The default tracking topology (anchored + stereo + fused tracks +
    multi-start) over B streams at once, with ALL lanes folded into the
    lane-major LK kernel.

    The serving path used to `vmap` :func:`track_step` over streams, which
    batches the Pallas LK into SEQUENTIAL per-lane grid steps — measured
    round 5 at exactly B x single-stream cost (no batching win; the kernel
    is issue-bound at 256 lanes). Here the two LK solves run as
    `track_grouped_lanes` calls with G = B and G = 2B groups, so every
    stream's points share wide lane-dense chunks (`lk_lanes._chunk_for`),
    while the cheap per-stream math (landmark guesses, pose solve, status
    bookkeeping) stays vmapped. Per-stream numerics are IDENTICAL to
    `vmap(track_step)` — asserted by tests/test_batched.py.

    Args mirror :func:`track_step` with a leading B axis on `fs`/`m` and
    (B, H, W) pyramid levels. Returns (fs', num_inliers (B,),
    num_tracked (B,)).

    MAINTENANCE CONTRACT: this function restates track_step's default
    topology with vmapped/folded variants — any semantic change to
    track_step (the anchored-trust rule, the outlier unlink rule, the
    pose branch) MUST be mirrored here; tests/test_batched.py::
    test_staggered_fold_matches_vmap_topology asserts exact equality of
    the two on CPU and will catch a missed mirror on the XLA arms.
    """
    B, F = fs.feat_uv.shape[:2]
    if pallas_mode is None:
        pallas_mode = "lanes" if jax.default_backend() != "cpu" else "xla"

    T_guess = jax.vmap(se3.se3_compose)(fs.T_rel, fs.T_cur)
    half_rel = jax.vmap(lambda r: se3.se3_exp(0.5 * se3.se3_log(r)))(
        fs.T_rel)
    T_inits = jnp.stack([
        T_guess, fs.T_cur,
        jax.vmap(se3.se3_compose)(half_rel, fs.T_cur)], axis=1)  # (B, 3, 3, 4)
    guess, lm_pos, linked = jax.vmap(
        _landmark_guesses, in_axes=(None, 0, 0, 0, 0, 0))(
        cam_left, T_guess, m, fs.feat_uv, fs.feat_lm, fs.feat_valid)

    # frame-to-frame LK, all B streams folded (G = B)
    uv_a, st_a = lk.track_batched(
        [jnp.asarray(lv) for lv in fs.pyr],
        [jnp.asarray(lv) for lv in cur_pyr],
        fs.feat_uv, guess, fs.feat_valid, max_iters=lk_iters,
        pallas_mode=pallas_mode)
    status = st_a
    mask_c = fs.feat_valid & st_a & linked
    guess_r, _, _ = jax.vmap(
        _landmark_guesses, in_axes=(None, 0, 0, 0, 0, 0))(
        cam_right, T_guess, m, uv_a, fs.feat_lm, fs.feat_valid)

    # anchored refinement + right-image solve, folded as G = 2B
    tmpl = [jnp.concatenate([r, c], axis=0)
            for r, c in zip(fs.ref_pyr, cur_pyr)]
    tgt = [jnp.concatenate([c, rr], axis=0)
           for c, rr in zip(cur_pyr, cur_right_pyr)]
    uv_g, st_g = lk.track_batched(
        tmpl, tgt,
        jnp.concatenate([fs.ref_uv, uv_a], axis=0),
        jnp.concatenate([uv_a, guess_r], axis=0),
        jnp.concatenate([fs.feat_valid, mask_c], axis=0),
        max_iters=lk_iters, pallas_mode=pallas_mode)
    cur_uv = jnp.where(st_g[:B][..., None], uv_g[:B], uv_a)
    uv_r, status_r = uv_g[B:], st_g[B:]

    tracked = fs.feat_valid & status
    num_tracked = jnp.sum(tracked, axis=1).astype(jnp.int32)
    use = tracked & linked
    use_r = use & status_r

    if pallas_mode in ("lanes", "pallas"):
        from stereovision_slam_tpu.ops.pose_pallas import solve_pose_multi_lr
        T_new, inlier2, _ = jax.vmap(
            lambda Ti, lm1, uv1, uvr1, u1, ur1: solve_pose_multi_lr(
                cam_left, cam_right, Ti, lm1, uv1, uvr1, u1, ur1,
                chi2_th=chi2_th, rounds=rounds, iters=iters))(
            T_inits, lm_pos, cur_uv, uv_r, use, use_r)
    else:
        def one_pose(T_inits1, lm1, uv1, uvr1, use1, user1):
            cam_obs = _blend_obs_cameras(cam_left, cam_right, F, F)
            pts2 = jnp.concatenate([lm1, lm1], axis=0)
            obs2 = jnp.concatenate([uv1, uvr1], axis=0)
            valid2 = jnp.concatenate([use1, user1], axis=0)
            return solve_pose_multi(cam_obs, T_inits1, pts2, obs2, valid2,
                                    chi2_th=chi2_th, rounds=rounds,
                                    iters=iters)
        T_new, inlier2, _ = jax.vmap(one_pose)(
            T_inits, lm_pos, cur_uv, uv_r, use, use_r)
    inlier = inlier2[:, :F]
    num_inliers = jnp.sum(inlier, axis=1).astype(jnp.int32)

    feat_lm = jnp.where(tracked & ~(use & ~inlier), fs.feat_lm, -1)
    fs_new = FrontendState(
        T_cur=T_new,
        T_rel=jax.vmap(lambda a, b: se3.se3_compose(a, se3.se3_inverse(b)))(
            T_new, fs.T_cur),
        feat_uv=cur_uv,
        feat_lm=feat_lm,
        feat_valid=tracked,
        pyr=tuple(cur_pyr),
        ref_uv=fs.ref_uv,
        ref_pyr=fs.ref_pyr,
    )
    return fs_new, num_inliers, num_tracked


@partial(jax.jit, static_argnames=(
    "num_features", "min_distance", "quality_level", "max_depth",
    "num_active", "detect_all", "detector", "lk_iters"), donate_argnums=(1,))
def keyframe_step(fs: FrontendState, m: mapmod.MapState, right_pyr: tuple,
                  cam_left: Camera, cam_right: Camera, frame_id, kf_id,
                  num_features: int = 150, min_distance: int = 20,
                  quality_level: float = 0.01, max_depth: float = 300.0,
                  num_active: int = 10, detect_all: bool = False,
                  detector: str = "gftt", lk_iters: int = 30):
    """Make the current frame a keyframe.

    Covers Frontend::InsertKeyframe + StereoInit (frontend.cpp:576-643,
    216-320): detect new corners (masked around survivors), LK left->right,
    triangulate unlinked features, create landmarks, insert the keyframe (with
    window eviction) into the map.

    `detect_all=True` is the StereoInit path (no masking, empty state).

    Returns (fs', m', evicted, num_new_landmarks, num_right_tracks).
    """
    F = fs.feat_uv.shape[0]
    left_img = fs.pyr[0]
    H, W = left_img.shape

    # --- 0. expire links to archived landmarks (the reference's weak_ptr
    # expiry: a landmark dropped by Map::RemoveOldKeyframe leaves the
    # feature unlinked, so it re-triangulates below). Without this, a stale
    # slot index could alias a recycled landmark from add_landmarks.
    safe_lm = jnp.clip(fs.feat_lm, 0, m.lm_valid.shape[0] - 1)
    fs = fs._replace(feat_lm=jnp.where(
        (fs.feat_lm >= 0) & m.lm_valid[safe_lm], fs.feat_lm, -1))

    # --- 1. detect new corners away from existing features ---
    if detect_all:
        mask = None
    else:
        mask = gftt.occupancy_mask((H, W), fs.feat_uv, fs.feat_valid,
                                   min_distance // 2)
    if detector.lower() in ("orb", "fast"):
        # the reference's ORB detector alternative (frontend.cpp:26-29);
        # FAST-9 corners, strongest-first like cv::ORB's retention
        new_pts, new_valid, _ = fast.detect(
            left_img, max_corners=F, min_distance=min_distance, mask=mask)
    else:
        new_pts, new_valid, _ = gftt.detect(
            left_img, max_corners=F, quality_level=quality_level,
            min_distance=min_distance, mask=mask)
    # cap at num_features detections (cv::GFTTDetector maxCorners,
    # frontend.cpp:24); detections come strongest-first
    cap = jnp.arange(F) < num_features
    new_valid = new_valid & cap

    # merge detections into free feature slots
    free_slots = jnp.nonzero(~fs.feat_valid, size=F, fill_value=-1)[0]
    order = jnp.cumsum(new_valid.astype(jnp.int32)) - 1
    dst = jnp.where(new_valid, free_slots[jnp.clip(order, 0, F - 1)], -1)
    ok = new_valid & (dst >= 0)
    # out-of-bounds + drop for masked entries (in-bounds dummies collide)
    safe_dst = jnp.where(ok, dst, F)
    feat_uv = fs.feat_uv.at[safe_dst].set(new_pts, mode="drop")
    feat_valid = fs.feat_valid.at[safe_dst].set(True, mode="drop")
    feat_lm = fs.feat_lm

    # --- 2. LK left -> right with reprojection guesses ---
    guess_r, lm_pos, linked = _landmark_guesses(
        cam_right, fs.T_cur, m, feat_uv, feat_lm, feat_valid)
    uv_r, status_r = lk.track(list(fs.pyr), list(right_pyr), feat_uv,
                              initial_pts=guess_r, mask=feat_valid,
                              max_iters=lk_iters)
    has_r = feat_valid & status_r
    num_right = jnp.sum(has_r).astype(jnp.int32)

    # --- 3. triangulate unlinked features with right tracks ---
    # in the rig frame through the two camera extrinsics (frontend.cpp:173-185,
    # 251-320), then to world through the inverse frame pose
    pl = pixel2camera(cam_left, feat_uv)[:, :2]
    pr = pixel2camera(cam_right, uv_r)[:, :2]
    poses2 = jnp.stack([cam_left.pose, cam_right.pose])
    pts2 = jnp.stack([pl, pr], axis=1)
    xyz_rig, tri_ok = triangulation.triangulate(poses2, pts2)
    depth_ok = (xyz_rig[:, 2] > 0.0) & (xyz_rig[:, 2] <= max_depth)
    world = se3.se3_apply(se3.se3_inverse(fs.T_cur), xyz_rig)
    create = feat_valid & has_r & (feat_lm < 0) & tri_ok & depth_ok

    m, slots = mapmod.add_landmarks(m, world, create,
                                    jnp.asarray(kf_id, jnp.int32))
    feat_lm = jnp.where((slots >= 0) & create, slots, feat_lm)
    num_new = jnp.sum((slots >= 0) & create).astype(jnp.int32)

    # --- 4. insert the keyframe with its observations ---
    m, ev = mapmod.insert_keyframe(
        m, fs.T_cur, jnp.asarray(frame_id, jnp.int32),
        jnp.asarray(kf_id, jnp.int32), feat_uv, uv_r, feat_lm,
        has_r & (feat_lm >= 0), feat_valid, num_active=num_active)

    # re-anchor: this keyframe becomes the tracking template
    fs_new = fs._replace(feat_uv=feat_uv, feat_lm=feat_lm,
                         feat_valid=feat_valid,
                         ref_uv=feat_uv, ref_pyr=fs.pyr)
    return fs_new, m, ev, num_new, num_right
