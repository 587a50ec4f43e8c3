import jax
import jax.numpy as jnp
import numpy as np

from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.slam import map_state as mapmod

K, F, L = 8, 16, 64


def make_kf_features(n_feats, lm_slots):
    uv = jnp.tile(jnp.array([[10.0, 10.0]]), (F, 1))
    lm = jnp.full((F,), -1, jnp.int32).at[:len(lm_slots)].set(jnp.array(lm_slots, jnp.int32))
    has_r = jnp.zeros((F,), bool).at[:n_feats].set(True)
    valid = jnp.zeros((F,), bool).at[:n_feats].set(True)
    return uv, uv + 1.0, lm, has_r, valid


def test_add_landmarks_allocates_slots():
    m = mapmod.empty_map(K, F, L)
    pos = jnp.arange(F * 3, dtype=jnp.float32).reshape(F, 3)
    create = jnp.zeros((F,), bool).at[:5].set(True)
    m, slots = mapmod.add_landmarks(m, pos, create, jnp.asarray(0))
    assert int(jnp.sum(slots >= 0)) == 5
    assert int(jnp.sum(m.lm_valid)) == 5
    assert int(m.next_lm_id) == 5
    s = np.asarray(slots[:5])
    np.testing.assert_allclose(np.asarray(m.lm_pos[s]), np.asarray(pos[:5]))


def test_insert_keyframe_and_window_eviction():
    m = mapmod.empty_map(K, F, L)
    num_active = 4
    poses = []
    for i in range(6):
        pose = se3.se3_exp(jnp.array([2.0 * i, 0, 0, 0, 0, 0.0]))
        poses.append(pose)
        uv, uv_r, lm, has_r, valid = make_kf_features(4, [])
        m, ev = mapmod.insert_keyframe(
            m, pose, jnp.asarray(i), jnp.asarray(i), uv, uv_r, lm, has_r,
            valid, num_active=num_active)
        if i < num_active:
            assert not bool(ev.happened)
        else:
            assert bool(ev.happened)
    assert int(jnp.sum(m.kf_valid)) == num_active
    # poses are far apart (distance 2.0 > 0.2) -> farthest evicted each time:
    # after inserting kf4, kf0 (farthest from kf4) leaves; then kf1
    remaining = sorted(np.asarray(m.kf_id)[np.asarray(m.kf_valid)].tolist())
    assert remaining == [2, 3, 4, 5]


def test_eviction_nearest_when_close():
    m = mapmod.empty_map(K, F, L)
    num_active = 3
    # kf0 far, kf1 and kf2 nearly identical, then insert kf3 near kf1/2
    xs = [0.0, 5.0, 5.05, 5.1]
    for i, x in enumerate(xs):
        pose = se3.se3_exp(jnp.array([x, 0, 0, 0, 0, 0.0]))
        uv, uv_r, lm, has_r, valid = make_kf_features(2, [])
        m, ev = mapmod.insert_keyframe(
            m, pose, jnp.asarray(i), jnp.asarray(i), uv, uv_r, lm, has_r,
            valid, num_active=num_active)
    # kf2 (x=5.05) is nearest to the new kf3 (x=5.1), distance 0.05 < 0.2 ->
    # nearest is evicted, the far kf0 survives
    remaining = sorted(np.asarray(m.kf_id)[np.asarray(m.kf_valid)].tolist())
    assert remaining == [0, 1, 3]


def test_landmark_obs_counting_and_archive():
    m = mapmod.empty_map(K, F, L)
    pos = jnp.zeros((F, 3))
    create = jnp.zeros((F,), bool).at[:3].set(True)
    m, slots = mapmod.add_landmarks(m, pos, create, jnp.asarray(0))
    s0, s1, s2 = [int(v) for v in slots[:3]]

    # kf0 observes lm0, lm1 (with right), kf1 observes lm1, lm2
    uv = jnp.zeros((F, 2))
    lm_a = jnp.full((F,), -1, jnp.int32).at[0].set(s0).at[1].set(s1)
    valid_a = jnp.zeros((F,), bool).at[:2].set(True)
    has_r_a = jnp.zeros((F,), bool).at[:2].set(True)
    m, _ = mapmod.insert_keyframe(m, se3.se3_identity(), jnp.asarray(0),
                                  jnp.asarray(0), uv, uv, lm_a, has_r_a,
                                  valid_a, num_active=2)
    lm_b = jnp.full((F,), -1, jnp.int32).at[0].set(s1).at[1].set(s2)
    valid_b = jnp.zeros((F,), bool).at[:2].set(True)
    has_r_b = jnp.zeros((F,), bool)
    pose_b = se3.se3_exp(jnp.array([3.0, 0, 0, 0, 0, 0]))
    m, _ = mapmod.insert_keyframe(m, pose_b, jnp.asarray(1), jnp.asarray(1),
                                  uv, uv, lm_b, has_r_b, valid_b, num_active=2)
    assert int(m.lm_obs_count[s0]) == 2   # left + right in kf0
    assert int(m.lm_obs_count[s1]) == 3   # 2 in kf0, 1 in kf1
    assert int(m.lm_obs_count[s2]) == 1

    # inserting kf2 (far) evicts one; with both far apart, farthest goes (kf0)
    pose_c = se3.se3_exp(jnp.array([6.0, 0, 0, 0, 0, 0]))
    lm_c = jnp.full((F,), -1, jnp.int32).at[0].set(s2)
    valid_c = jnp.zeros((F,), bool).at[:1].set(True)
    m, ev = mapmod.insert_keyframe(m, pose_c, jnp.asarray(2), jnp.asarray(2),
                                   uv, uv, lm_c, jnp.zeros((F,), bool),
                                   valid_c, num_active=2)
    assert bool(ev.happened) and int(ev.kf_id) == 0
    # lm0 lost both its observations -> archived, removed from active table
    archived = np.asarray(ev.lm_archived)
    assert archived[s0] and not archived[s1] and not archived[s2]
    assert not bool(m.lm_valid[s0])
    assert int(m.lm_obs_count[s1]) == 1


def test_landmark_table_full_graceful():
    m = mapmod.empty_map(K, F, 4)
    pos = jnp.zeros((F, 3))
    create = jnp.zeros((F,), bool).at[:8].set(True)
    m, slots = mapmod.add_landmarks(m, pos, create, jnp.asarray(0))
    assert int(jnp.sum(slots >= 0)) == 4  # only 4 slots existed
    assert int(jnp.sum(m.lm_valid)) == 4


def test_merge_loop_landmarks_replace_and_insert():
    """Case A: a matched feature with a landmark gets its slot rewritten to
    the loop landmark (pos + id + first-kf). Case B: a matched feature
    without a landmark gets the loop landmark inserted and linked."""
    m = mapmod.empty_map(K, F, L)
    pos = jnp.arange(F * 3, dtype=jnp.float32).reshape(F, 3)
    create = jnp.zeros((F,), bool).at[:3].set(True)
    m, slots = mapmod.add_landmarks(m, pos, create, jnp.asarray(7))
    s = np.asarray(slots[:3])

    # newest keyframe in slot 0, features 0..3 valid; 0-2 linked, 3 unlinked
    feat_lm = jnp.full((F,), -1, jnp.int32).at[0].set(int(s[0])) \
        .at[1].set(int(s[1])).at[2].set(int(s[2]))
    feat_valid = jnp.zeros((F,), bool).at[:4].set(True)
    uv = jnp.zeros((F, 2))
    m, _ = mapmod.insert_keyframe(m, se3.se3_identity(), jnp.asarray(9),
                                  jnp.asarray(9), uv, uv, feat_lm,
                                  jnp.zeros((F,), bool).at[3].set(True),
                                  feat_valid, num_active=4)
    kf_slot = jnp.argmax(jnp.where(m.kf_valid, m.kf_id, -1))

    # candidate: feature 0 matches current feature 0 (linked -> replace),
    # feature 1 matches current feature 3 (unlinked -> insert+link)
    match_idx = jnp.zeros((F,), jnp.int32).at[1].set(3)
    usable = jnp.zeros((F,), bool).at[0].set(True).at[1].set(True)
    cand_pos = jnp.zeros((F, 3)).at[0].set(jnp.array([10., 11., 12.])) \
        .at[1].set(jnp.array([20., 21., 22.]))
    cand_id = jnp.full((F,), -1, jnp.int32).at[0].set(100).at[1].set(101)
    cand_first = jnp.full((F,), -1, jnp.int32).at[0].set(2).at[1].set(3)

    m2, new_feat_lm = mapmod.merge_loop_landmarks(
        m, feat_lm, feat_valid, kf_slot, match_idx, usable,
        cand_pos, cand_id, cand_first)

    # case A: slot s[0] now IS loop landmark 100
    np.testing.assert_allclose(np.asarray(m2.lm_pos[s[0]]), [10., 11., 12.])
    assert int(m2.lm_id[s[0]]) == 100
    assert int(m2.lm_first_kf[s[0]]) == 2
    assert int(new_feat_lm[0]) == int(s[0])  # link unchanged
    # untouched landmarks keep their data
    assert int(m2.lm_id[s[1]]) == 1 and int(m2.lm_id[s[2]]) == 2

    # case B: feature 3 linked to a fresh slot holding loop landmark 101
    s_new = int(new_feat_lm[3])
    assert s_new >= 0 and s_new not in s.tolist()
    assert bool(m2.lm_valid[s_new])
    np.testing.assert_allclose(np.asarray(m2.lm_pos[s_new]), [20., 21., 22.])
    assert int(m2.lm_id[s_new]) == 101
    assert int(m2.lm_first_kf[s_new]) == 3
    # observation row of the newest keyframe points at the new slot
    assert int(m2.obs_lm[kf_slot, 3]) == s_new
    # only the left observation counts: the insert masked obs_has_r to
    # linked features, so the unlinked feature's right track was not kept
    assert int(m2.lm_obs_count[s_new]) == 1
    # unmatched features untouched
    assert int(new_feat_lm[2]) == int(s[2])


def test_merge_loop_landmarks_duplicate_targets_consistent():
    """Two candidate features matching the same current feature: only the
    lowest-index candidate wins, and pos/id/first stay mutually consistent."""
    m = mapmod.empty_map(K, F, L)
    pos = jnp.ones((F, 3))
    create = jnp.zeros((F,), bool).at[0].set(True)
    m, slots = mapmod.add_landmarks(m, pos, create, jnp.asarray(0))
    s0 = int(slots[0])
    feat_lm = jnp.full((F,), -1, jnp.int32).at[0].set(s0)
    feat_valid = jnp.zeros((F,), bool).at[0].set(True)
    uv = jnp.zeros((F, 2))
    m, _ = mapmod.insert_keyframe(m, se3.se3_identity(), jnp.asarray(5),
                                  jnp.asarray(5), uv, uv, feat_lm,
                                  jnp.zeros((F,), bool), feat_valid,
                                  num_active=4)
    kf_slot = jnp.argmax(jnp.where(m.kf_valid, m.kf_id, -1))

    # candidates 2 and 5 both match current feature 0
    match_idx = jnp.zeros((F,), jnp.int32)
    usable = jnp.zeros((F,), bool).at[2].set(True).at[5].set(True)
    cand_pos = jnp.zeros((F, 3)).at[2].set(jnp.array([1., 2., 3.])) \
        .at[5].set(jnp.array([9., 9., 9.]))
    cand_id = jnp.full((F,), -1, jnp.int32).at[2].set(200).at[5].set(500)
    cand_first = jnp.full((F,), -1, jnp.int32).at[2].set(2).at[5].set(5)

    m2, nl = mapmod.merge_loop_landmarks(m, feat_lm, feat_valid, kf_slot,
                                         match_idx, usable, cand_pos,
                                         cand_id, cand_first)
    # candidate 2 (lowest index) wins consistently on all three fields
    np.testing.assert_allclose(np.asarray(m2.lm_pos[s0]), [1., 2., 3.])
    assert int(m2.lm_id[s0]) == 200
    assert int(m2.lm_first_kf[s0]) == 2


def test_merge_loop_landmarks_relinks_to_active_loop_landmark():
    """When the loop landmark is still in the active table, the matched
    feature is relinked to its slot (no duplicate global id), and the
    drifted duplicate that lost its last observation is merged away."""
    m = mapmod.empty_map(K, F, L)
    pos = jnp.zeros((F, 3)).at[0].set(jnp.array([1., 1., 10.])) \
        .at[1].set(jnp.array([1.2, 1.1, 10.3]))
    create = jnp.zeros((F,), bool).at[:2].set(True)
    m, slots = mapmod.add_landmarks(m, pos, create, jnp.asarray(0))
    sY, sX = int(slots[0]), int(slots[1])  # Y = loop landmark, X = duplicate

    # keyframe: feature 0 linked to the DUPLICATE slot X; Y observed by an
    # earlier keyframe (simulate with a direct count bump)
    m = m._replace(lm_obs_count=m.lm_obs_count.at[sY].set(2))
    feat_lm = jnp.full((F,), -1, jnp.int32).at[0].set(sX)
    feat_valid = jnp.zeros((F,), bool).at[0].set(True)
    uv = jnp.zeros((F, 2))
    m, _ = mapmod.insert_keyframe(m, se3.se3_identity(), jnp.asarray(30),
                                  jnp.asarray(30), uv, uv, feat_lm,
                                  jnp.zeros((F,), bool), feat_valid,
                                  num_active=4)
    kf_slot = jnp.argmax(jnp.where(m.kf_valid, m.kf_id, -1))
    assert int(m.lm_obs_count[sX]) == 1

    # candidate feature 0 observes landmark with Y's global id (0)
    match_idx = jnp.zeros((F,), jnp.int32)
    usable = jnp.zeros((F,), bool).at[0].set(True)
    cand_pos = jnp.zeros((F, 3)).at[0].set(jnp.array([1., 1., 10.]))
    gid = int(m.lm_id[sY])
    cand_id = jnp.full((F,), -1, jnp.int32).at[0].set(gid)
    cand_first = jnp.full((F,), -1, jnp.int32).at[0].set(0)

    m2, nl = mapmod.merge_loop_landmarks(m, feat_lm, feat_valid, kf_slot,
                                         match_idx, usable, cand_pos,
                                         cand_id, cand_first)
    assert int(nl[0]) == sY, "feature must relink to the active loop slot"
    assert int(m2.obs_lm[kf_slot, 0]) == sY
    assert int(m2.lm_obs_count[sY]) == 3  # gained this observation
    # duplicate X lost its only observation -> merged away, NOT archived
    assert not bool(m2.lm_valid[sX])
    # exactly one active slot carries Y's global id
    n_with_id = int(jnp.sum(m2.lm_valid & (m2.lm_id == gid)))
    assert n_with_id == 1


def test_stale_link_to_archived_slot_not_counted():
    """Regression: a feature still linked to a landmark whose slot was just
    archived by this insertion's eviction must NOT bump that slot's count or
    appear in the new keyframe's obs row (otherwise the slot is recycled by
    add_landmarks while the stale obs row aliases the new landmark)."""
    m = mapmod.empty_map(K, F, L)
    num_active = 2

    # landmark 0 observed ONLY by keyframe 0
    pos = jnp.zeros((F, 3), jnp.float32)
    create = jnp.zeros((F,), bool).at[0].set(True)
    m, slots = mapmod.add_landmarks(m, pos, create, jnp.asarray(0))
    s0 = int(slots[0])

    uv, uv_r, _, has_r, valid = make_kf_features(4, [])
    lm_link = jnp.full((F,), -1, jnp.int32).at[0].set(s0)
    m, _ = mapmod.insert_keyframe(
        m, se3.se3_identity(), jnp.asarray(0), jnp.asarray(0), uv, uv_r,
        lm_link, has_r, valid, num_active=num_active)
    assert bool(m.lm_valid[s0])

    # keyframes 1, 2 don't observe it; window of 2 -> inserting 2 evicts 0,
    # archiving s0. The inserted keyframe 2 STILL carries the stale link.
    far1 = se3.se3_exp(jnp.array([50.0, 0, 0, 0, 0, 0.0]))
    m, _ = mapmod.insert_keyframe(
        m, far1, jnp.asarray(1), jnp.asarray(1), uv, uv_r,
        jnp.full((F,), -1, jnp.int32), has_r, valid, num_active=num_active)
    far2 = se3.se3_exp(jnp.array([100.0, 0, 0, 0, 0, 0.0]))
    m, ev = mapmod.insert_keyframe(
        m, far2, jnp.asarray(2), jnp.asarray(2), uv, uv_r,
        lm_link, has_r, valid, num_active=num_active)

    assert bool(ev.happened)
    assert bool(ev.lm_archived[s0]), "s0 should be archived with KF 0"
    assert not bool(m.lm_valid[s0])
    # the stale link must not resurrect the archived slot's count...
    assert int(m.lm_obs_count[s0]) == 0
    # ...and the new keyframe's obs row must not reference it
    kf2_slot = int(jnp.argmax(m.kf_id == 2))
    assert int(m.obs_lm[kf2_slot, 0]) == -1

    # the slot is then safely recyclable with a clean count
    m, slots2 = mapmod.add_landmarks(
        m, pos, jnp.zeros((F,), bool).at[0].set(True), jnp.asarray(2))
    assert int(slots2[0]) == s0
    assert int(m.lm_obs_count[s0]) == 0
