"""Fixed-capacity functional map store.

TPU-native redesign of the reference's `Map` (/root/reference/src/map.cpp,
map.h:22-54): instead of mutex-guarded hash tables of shared pointers, the
active map is a pytree of fixed-size masked SoA arrays threaded functionally
through jitted updates — keyframe ring window, landmark table, and a dense
(K, F) observation block. The mutable-aliasing races noted in SURVEY.md §5
(InsertKeyFrame without data_mutex_, frontend/backend write overlap) are
impossible by construction.

Semantics preserved:
  * sliding window of `num_active_keyframes` with the reference's eviction
    rule — evict the nearest active KF if its SE(3)-log distance to the newest
    is < 0.2, else the farthest (map.cpp:76-181);
  * evicting a KF removes its landmark observations; landmarks that drop to
    zero active observations leave the active table (Map::CleanMap,
    map.cpp:21-40);
  * the growing all-time stores (for keyframes.txt / landmarks.pcd / PGO) are
    host-side archives fed by the eviction outputs — they never participate in
    per-frame device compute.

Slot conventions: landmark slot index -1 = "no landmark"; invalid slots hold
zeros. `lm_first_kf` records the first observing keyframe id (MapPoint::
first_valid_obs_, mappoint.h:20-32) for PGO landmark re-anchoring.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MapState(NamedTuple):
    # --- active keyframe window (K slots) ---
    kf_pose: jax.Array       # (K, 3, 4) T_c_w
    kf_frame_id: jax.Array   # (K,) int32, dataset frame id, -1 = empty
    kf_id: jax.Array         # (K,) int32, monotonic keyframe id, -1 = empty
    kf_valid: jax.Array      # (K,) bool
    # --- landmark table (L slots) ---
    lm_pos: jax.Array        # (L, 3)
    lm_valid: jax.Array      # (L,) bool
    lm_obs_count: jax.Array  # (L,) int32 — active observation count
    lm_first_kf: jax.Array   # (L,) int32 — keyframe id of first observation
    lm_id: jax.Array         # (L,) int32 — monotonic global landmark id
    # --- observations, dense per (KF slot, feature slot) ---
    obs_uv_l: jax.Array      # (K, F, 2)
    obs_uv_r: jax.Array      # (K, F, 2)
    obs_lm: jax.Array        # (K, F) int32 landmark slot, -1 = none
    obs_has_r: jax.Array     # (K, F) bool — right-camera track exists
    obs_valid: jax.Array     # (K, F) bool
    # --- counters ---
    next_lm_id: jax.Array    # () int32


def empty_map(K: int, F: int, L: int, dtype=jnp.float32) -> MapState:
    return MapState(
        kf_pose=jnp.zeros((K, 3, 4), dtype),
        kf_frame_id=jnp.full((K,), -1, jnp.int32),
        kf_id=jnp.full((K,), -1, jnp.int32),
        kf_valid=jnp.zeros((K,), bool),
        lm_pos=jnp.zeros((L, 3), dtype),
        lm_valid=jnp.zeros((L,), bool),
        lm_obs_count=jnp.zeros((L,), jnp.int32),
        lm_first_kf=jnp.full((L,), -1, jnp.int32),
        lm_id=jnp.full((L,), -1, jnp.int32),
        obs_uv_l=jnp.zeros((K, F, 2), dtype),
        obs_uv_r=jnp.zeros((K, F, 2), dtype),
        obs_lm=jnp.full((K, F), -1, jnp.int32),
        obs_has_r=jnp.zeros((K, F), bool),
        obs_valid=jnp.zeros((K, F), bool),
        next_lm_id=jnp.asarray(0, jnp.int32),
    )


class EvictedKeyframe(NamedTuple):
    """Data the host archives when a keyframe leaves the active window."""
    happened: jax.Array      # () bool
    pose: jax.Array          # (3, 4)
    frame_id: jax.Array      # () int32
    kf_id: jax.Array         # () int32
    # landmarks that dropped to zero active observations (archived):
    lm_archived: jax.Array   # (L,) bool
    lm_pos: jax.Array        # (L, 3) positions at archival time
    lm_first_kf: jax.Array   # (L,) int32
    lm_id: jax.Array         # (L,) int32


def _evict_choice(m: MapState, new_pose: jax.Array, min_dis_th: float = 0.2):
    """Pick the KF slot to evict per the reference rule (map.cpp:120-135)."""
    from stereovision_slam_tpu.geometry import se3
    d = se3.se3_distance(m.kf_pose, new_pose[None])
    d = jnp.where(m.kf_valid, d, jnp.inf)
    near = jnp.argmin(d)
    far = jnp.argmax(jnp.where(m.kf_valid, d, -jnp.inf))
    return jnp.where(d[near] < min_dis_th, near, far)


def _remove_keyframe_slot(m: MapState, slot: jax.Array):
    """Clear a KF slot; decrement its landmarks' counts; drop zero-obs
    landmarks from the active table. Returns (map, archived_lm_mask)."""
    K, F = m.obs_lm.shape
    L = m.lm_valid.shape[0]

    obs_lm_row = m.obs_lm[slot]            # (F,)
    obs_valid_row = m.obs_valid[slot]
    has_r_row = m.obs_has_r[slot]
    # each observation contributes 1 (left) + 1 if right (MapPoint counts both,
    # mappoint.cpp:22-78 — constant offset per landmark, same zero-point)
    contrib = jnp.where(obs_valid_row & (obs_lm_row >= 0),
                        1 + has_r_row.astype(jnp.int32), 0)
    safe_idx = jnp.where(obs_lm_row >= 0, obs_lm_row, 0)
    dec = jnp.zeros((L,), jnp.int32).at[safe_idx].add(contrib)
    new_count = jnp.maximum(m.lm_obs_count - dec, 0)

    archived = m.lm_valid & (new_count == 0) & (m.lm_obs_count > 0)
    m = m._replace(
        kf_valid=m.kf_valid.at[slot].set(False),
        kf_frame_id=m.kf_frame_id.at[slot].set(-1),
        kf_id=m.kf_id.at[slot].set(-1),
        obs_valid=m.obs_valid.at[slot].set(jnp.zeros((F,), bool)),
        obs_lm=m.obs_lm.at[slot].set(jnp.full((F,), -1, jnp.int32)),
        obs_has_r=m.obs_has_r.at[slot].set(jnp.zeros((F,), bool)),
        lm_obs_count=new_count,
        lm_valid=m.lm_valid & ~archived,
    )
    return m, archived


@partial(jax.jit, static_argnames=("num_active",), donate_argnums=(0,))
def insert_keyframe(m: MapState, pose: jax.Array, frame_id: jax.Array,
                    kf_id: jax.Array, feat_uv_l: jax.Array,
                    feat_uv_r: jax.Array, feat_lm: jax.Array,
                    feat_has_r: jax.Array, feat_valid: jax.Array,
                    num_active: int = 10):
    """Insert a keyframe (with its feature->landmark links) into the window.

    Mirrors Map::InsertKeyFrame + RemoveOldKeyframe (map.cpp:53-67, 76-181):
    if the window already holds `num_active` keyframes, one is evicted first
    and returned for host-side archival.

    Args:
      m: current map.
      pose: (3, 4) keyframe T_c_w.
      frame_id / kf_id: scalars.
      feat_uv_l/feat_uv_r: (F, 2) feature pixels.
      feat_lm: (F,) landmark slot per feature (-1 none).
      feat_has_r: (F,) right-track mask.
      feat_valid: (F,) feature slot validity.

    Returns:
      (new_map, EvictedKeyframe)
    """
    K, F = m.obs_lm.shape
    L = m.lm_valid.shape[0]
    full = jnp.sum(m.kf_valid) >= num_active

    evict_slot = _evict_choice(m, pose)
    pre_pose = m.kf_pose[evict_slot]
    pre_fid = m.kf_frame_id[evict_slot]
    pre_kid = m.kf_id[evict_slot]
    lm_pos_snapshot = m.lm_pos
    lm_first_snapshot = m.lm_first_kf
    lm_id_snapshot = m.lm_id

    def do_evict(mm):
        mm2, archived = _remove_keyframe_slot(mm, evict_slot)
        return mm2, archived

    def no_evict(mm):
        return mm, jnp.zeros((L,), bool)

    m, archived = jax.lax.cond(full, do_evict, no_evict, m)
    ev = EvictedKeyframe(
        happened=full,
        pose=pre_pose, frame_id=pre_fid, kf_id=pre_kid,
        lm_archived=archived, lm_pos=lm_pos_snapshot,
        lm_first_kf=lm_first_snapshot, lm_id=lm_id_snapshot,
    )

    # place the new KF in the first free slot
    slot = jnp.argmax(~m.kf_valid)
    safe_idx = jnp.where(feat_lm >= 0, feat_lm, 0)
    # only link observations to landmarks still active AFTER the eviction:
    # linking to a just-archived slot would leave an invalid slot with
    # count > 0 whose obs row aliases a different landmark once
    # add_landmarks recycles the slot
    obs_on = feat_valid & (feat_lm >= 0) & m.lm_valid[safe_idx]
    # bump landmark observation counts (left + optional right)
    contrib = jnp.where(obs_on, 1 + feat_has_r.astype(jnp.int32), 0)
    inc = jnp.zeros((L,), jnp.int32).at[safe_idx].add(contrib)

    m = m._replace(
        kf_pose=m.kf_pose.at[slot].set(pose),
        kf_frame_id=m.kf_frame_id.at[slot].set(frame_id.astype(jnp.int32)),
        kf_id=m.kf_id.at[slot].set(kf_id.astype(jnp.int32)),
        kf_valid=m.kf_valid.at[slot].set(True),
        obs_uv_l=m.obs_uv_l.at[slot].set(feat_uv_l),
        obs_uv_r=m.obs_uv_r.at[slot].set(feat_uv_r),
        obs_lm=m.obs_lm.at[slot].set(jnp.where(obs_on, feat_lm, -1)),
        obs_has_r=m.obs_has_r.at[slot].set(feat_has_r & obs_on),
        obs_valid=m.obs_valid.at[slot].set(feat_valid),
        lm_obs_count=m.lm_obs_count + inc,
    )
    return m, ev


@partial(jax.jit, donate_argnums=(0,))
def add_landmarks(m: MapState, positions: jax.Array, create: jax.Array,
                  first_kf_id: jax.Array):
    """Allocate landmark slots for up to F new points.

    Mirrors MapPoint::CreateNewMappoint + Map::InsertMapPoint
    (mappoint.cpp:88-98, map.cpp:68-74). Allocation is a static-size
    `nonzero` over the free mask.

    Args:
      positions: (F, 3) world positions.
      create: (F,) bool — which entries actually become landmarks.
      first_kf_id: scalar keyframe id recorded as first observer.

    Returns:
      (new_map, slots): slots (F,) int32 — allocated slot per entry, -1 where
      `create` was False or the table was full.
    """
    L = m.lm_valid.shape[0]
    F = positions.shape[0]
    free_slots = jnp.nonzero(~m.lm_valid, size=F, fill_value=-1)[0]
    order = jnp.cumsum(create.astype(jnp.int32)) - 1     # rank among created
    slots = jnp.where(create, free_slots[jnp.clip(order, 0, F - 1)], -1)
    ok = create & (slots >= 0)
    # route masked-out entries to an out-of-bounds index and drop them —
    # a shared in-bounds dummy would collide and clobber real writes
    safe = jnp.where(ok, slots, L)

    new_ids = m.next_lm_id + order
    first_kf = jnp.broadcast_to(jnp.asarray(first_kf_id, jnp.int32), (F,))
    m = m._replace(
        lm_pos=m.lm_pos.at[safe].set(positions, mode="drop"),
        lm_valid=m.lm_valid.at[safe].set(True, mode="drop"),
        lm_obs_count=m.lm_obs_count.at[safe].set(0, mode="drop"),
        lm_first_kf=m.lm_first_kf.at[safe].set(first_kf, mode="drop"),
        lm_id=m.lm_id.at[safe].set(new_ids, mode="drop"),
        next_lm_id=m.next_lm_id + jnp.sum(ok),
    )
    return m, jnp.where(ok, slots, -1)


@partial(jax.jit, donate_argnums=(0,))
def merge_loop_landmarks(m: MapState, feat_lm: jax.Array,
                         feat_valid: jax.Array, kf_slot: jax.Array,
                         match_idx: jax.Array, usable: jax.Array,
                         cand_lm_pos: jax.Array, cand_lm_id: jax.Array,
                         cand_lm_first: jax.Array):
    """Duplicate-landmark merge during loop fusion (loopclosure.cpp:531-574).

    For each good match (loop-candidate feature i -> current feature
    j = match_idx[i], usable[i]), the loop keyframe's established landmark
    replaces the current keyframe's drifted duplicate — three cases, in
    priority order per feature:

      * the loop landmark is still ACTIVE in the table (tracked continuously
        since the loop keyframe) -> the feature is relinked to that existing
        slot (reference's relink to the existing map point); the previously
        linked duplicate loses this observation and leaves the table if that
        was its last one (it is a merged-away duplicate, not archived);
      * loop landmark archived, feature has a landmark -> the linked slot is
        rewritten in place to BE the loop landmark (position, global id,
        first observer); the duplicate's id disappears from the map;
      * loop landmark archived, feature unlinked -> the loop landmark is
        inserted into a free slot and linked to both the feature and the
        newest keyframe's observation row.

    When several candidate features match the same current feature, only the
    lowest-index candidate is used (targets are made unique so the pos/id/
    first-kf scatters stay mutually consistent).

    The caller must apply this AFTER the rigid pose correction: the candidate
    snapshot positions are already expressed in the loop-consistent world
    frame.

    Args:
      feat_lm / feat_valid: (F,) current frontend feature->landmark links.
      kf_slot: scalar — window slot of the newest (current) keyframe.
      match_idx: (Fc,) current-feature index per candidate feature.
      usable: (Fc,) bool — good match with a candidate landmark.
      cand_lm_pos/cand_lm_id/cand_lm_first: (Fc, 3)/(Fc,)/(Fc,) candidate
        landmark snapshots.

    Returns:
      (new_map, new_feat_lm)
    """
    L = m.lm_valid.shape[0]
    F = feat_lm.shape[0]
    Fc = match_idx.shape[0]

    # make targets unique: if several candidate features match the same
    # current feature, keep only the lowest candidate index, so the three
    # scatters below agree on the winner
    idx_i = jnp.arange(Fc, dtype=jnp.int32)
    tgt0 = jnp.where(usable, match_idx, F)
    first_i = jnp.full((F + 1,), Fc, jnp.int32).at[tgt0].min(
        jnp.where(usable, idx_i, Fc), mode="drop")
    usable = usable & (first_i[jnp.clip(tgt0, 0, F)] == idx_i)

    # scatter candidate landmark data onto current-feature slots
    tgt = jnp.where(usable, match_idx, F)
    m_pos = jnp.zeros((F, 3), m.lm_pos.dtype).at[tgt].set(
        cand_lm_pos, mode="drop")
    m_id = jnp.full((F,), -1, jnp.int32).at[tgt].set(cand_lm_id, mode="drop")
    m_first = jnp.full((F,), -1, jnp.int32).at[tgt].set(
        cand_lm_first, mode="drop")
    m_has = jnp.zeros((F,), bool).at[tgt].set(True, mode="drop") & feat_valid
    m_has = m_has & (m_id >= 0)

    has_r = m.obs_has_r[kf_slot]
    obs_contrib = 1 + has_r.astype(jnp.int32)   # per current feature

    # case C: the loop landmark is still active -> relink to its slot
    eq = (m.lm_id[None, :] == m_id[:, None]) & m.lm_valid[None, :]  # (F, L)
    exist_slot = jnp.where(m_has & eq.any(1), jnp.argmax(eq, 1), -1)
    relink = m_has & (exist_slot >= 0) & (feat_lm != exist_slot)
    # move this observation's count from the old duplicate to the loop slot
    old_slot = jnp.where(relink & (feat_lm >= 0), feat_lm, L)
    gain_slot = jnp.where(relink, exist_slot, L)
    new_count = (m.lm_obs_count
                 .at[gain_slot].add(jnp.where(relink, obs_contrib, 0),
                                    mode="drop")
                 .at[old_slot].add(jnp.where(relink, -obs_contrib, 0),
                                   mode="drop"))
    new_count = jnp.maximum(new_count, 0)
    # a duplicate that lost its last observation is merged away (not archived)
    m = m._replace(
        lm_obs_count=new_count,
        lm_valid=m.lm_valid & ~((new_count == 0) & (m.lm_obs_count > 0)),
    )

    # case A: loop landmark not active, feature linked -> rewrite in place
    repl = m_has & (exist_slot < 0) & (feat_lm >= 0)
    slot_a = jnp.where(repl, feat_lm, L)
    m = m._replace(
        lm_pos=m.lm_pos.at[slot_a].set(m_pos, mode="drop"),
        lm_id=m.lm_id.at[slot_a].set(m_id, mode="drop"),
        lm_first_kf=m.lm_first_kf.at[slot_a].set(m_first, mode="drop"),
    )

    # case B: loop landmark not active, feature unlinked -> insert + link
    ins = m_has & (exist_slot < 0) & (feat_lm < 0)
    free_slots = jnp.nonzero(~m.lm_valid, size=F, fill_value=-1)[0]
    order = jnp.cumsum(ins.astype(jnp.int32)) - 1
    slots = jnp.where(ins, free_slots[jnp.clip(order, 0, F - 1)], -1)
    ok = ins & (slots >= 0)
    safe = jnp.where(ok, slots, L)
    contrib = jnp.where(ok, obs_contrib, 0)
    m = m._replace(
        lm_pos=m.lm_pos.at[safe].set(m_pos, mode="drop"),
        lm_valid=m.lm_valid.at[safe].set(True, mode="drop"),
        lm_id=m.lm_id.at[safe].set(m_id, mode="drop"),
        lm_first_kf=m.lm_first_kf.at[safe].set(m_first, mode="drop"),
        lm_obs_count=m.lm_obs_count.at[safe].set(contrib, mode="drop"),
    )
    new_link = jnp.where(ok, slots, jnp.where(relink, exist_slot, feat_lm))
    m = m._replace(obs_lm=m.obs_lm.at[kf_slot].set(
        jnp.where(ok | relink, new_link, m.obs_lm[kf_slot])))
    return m, new_link


def active_counts(m: MapState):
    """(num keyframes, num landmarks) in the active window."""
    return jnp.sum(m.kf_valid), jnp.sum(m.lm_valid)
