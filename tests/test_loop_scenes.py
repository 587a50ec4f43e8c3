"""Loop-closure validation beyond the single circuit (VERDICT r3 #6):

* a figure-eight whose crossing pose is revisited with the same heading at
  the end of each lobe — the scored fused pipeline must close >= 2 loops;
* a perceptual-aliasing arena (4-fold symmetric wall low-frequency texture,
  unique fine detail): the place embedder's look-alike sectors must NOT
  survive the match/PnP gates as LocalFusions at distant keyframes;
* embedder precision/recall measured at the bench gates on the circuit.

Matches /root/reference/src/loopclosure.cpp:227-437's gate semantics: the
embedding proposes, Hamming matching + PnP RANSAC + pose gates dispose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
from stereovision_slam_tpu.models import mobilenet_v2 as mnv2
from stereovision_slam_tpu.slam.config import SlamConfig
from stereovision_slam_tpu.slam.fused_loop import FusedLoopVisualOdometry
from tests import synthetic

pytestmark = pytest.mark.slow  # e2e renders + full pipeline runs


def _run_fused(lefts, rights, cfg, mnv2_params=None):
    rig = synthetic.make_stereo_rig()
    vo = FusedLoopVisualOdometry(
        cfg, ArraySequenceDataset(np.asarray(lefts), np.asarray(rights),
                                  [rig[0], rig[1]]),
        prefetch_depth=0, max_total_keyframes=256,
        max_total_landmarks=1 << 15)
    vo.initialize()
    if mnv2_params is not None:
        vo.mnv2_params = mnv2_params
    vo._queue = [(i, jnp.asarray(np.asarray(lefts[i])),
                  jnp.asarray(np.asarray(rights[i])))
                 for i in range(len(lefts))]
    while vo.step():
        pass
    return vo


def test_two_loops_close_on_figure_eight():
    T = 112
    poses = synthetic.figure_eight_poses(T, step=0.5)
    lefts, rights = synthetic.render_arena_stereo_sequence(
        poses, rig=synthetic.make_stereo_rig(), center=(0.0, 6.0),
        radius=25.0)
    cfg = SlamConfig(num_features=250,
                     num_features_needed_for_keyframe=1000,  # kf every frame
                     keyframes_to_skip_in_candidate_search=30,
                     keyframes_to_ignore_after_loop=10,
                     potential_loop_strong_threshold=0.85,
                     potential_loop_weak_threshold=0.75,
                     max_num_weak_threshold=100,
                     min_num_acceptable_keypoint_match=10,
                     lk_max_iters=12, pose_rounds=3, pose_iters_per_round=6,
                     ba_lm_iters=6)
    vo = _run_fused(lefts, rights, cfg)
    edges = vo.loop_edges()
    assert len(edges) >= 2, f"only {len(edges)} loop(s) on the figure-eight"
    spans = sorted(e.kf_id - e.loop_kf_id for e in edges)
    # at least one intra-lobe revisit and the cross-lobe return
    assert spans[-1] >= 40, spans
    # the shutdown PGO must not degrade the trajectory (same gate as bench)
    keyframes, _, _ = vo.drain()
    traj_pgo = vo.run_pgo()

    def center(p):
        p = np.asarray(p)
        return -p[:, :3].T @ p[:, 3]

    gt = np.asarray(poses)
    pre = [np.linalg.norm(center(pose) - center(gt[fid]))
           for fid, pose in keyframes.values()]
    post = [np.linalg.norm(center(p) - center(gt[fid]))
            for fid, p in traj_pgo.items()]
    ate_pre = float(np.sqrt(np.mean(np.square(pre))))
    ate_post = float(np.sqrt(np.mean(np.square(post))))
    assert np.isfinite(ate_post)
    assert ate_post <= ate_pre + 1e-6, (ate_pre, ate_post)


def test_no_false_fusion_on_aliased_arena():
    """4-fold symmetric wall: sectors 90 degrees apart look alike to the
    pooled embedder, but their fine structure (and 3-D geometry) differs.
    Drive 3/4 of a circuit — every revisit candidate is a FALSE one (the
    true revisit never happens) — and require zero accepted loops."""
    T = 72
    yaw = 2 * np.pi / 96          # 3/4 circle over 72 frames
    poses = synthetic.forward_motion_poses(T, step=0.5, yaw_rate=yaw)
    lefts, rights = synthetic.render_arena_stereo_sequence(
        poses, rig=synthetic.make_stereo_rig(), center=(0.0, 6.0),
        radius=25.0, wall_symmetry=4)
    cfg = SlamConfig(num_features=250,
                     num_features_needed_for_keyframe=1000,
                     keyframes_to_skip_in_candidate_search=15,
                     keyframes_to_ignore_after_loop=5,
                     potential_loop_strong_threshold=0.90,
                     potential_loop_weak_threshold=0.85,
                     max_num_weak_threshold=100,
                     min_num_acceptable_keypoint_match=10,
                     lk_max_iters=12, pose_rounds=3, pose_iters_per_round=6,
                     ba_lm_iters=6)
    vo = _run_fused(lefts, rights, cfg)
    edges = vo.loop_edges()
    gt = np.asarray(poses)
    kfs, _, _ = vo.drain()
    for e in edges:
        # if anything closed, it must be geometrically TRUE (gt distance of
        # the pair small) — on this 3/4 arc nothing qualifies
        fi = kfs[e.kf_id][0]
        fj = kfs[e.loop_kf_id][0]
        d = np.linalg.norm(
            (-gt[fi][:, :3].T @ gt[fi][:, 3])
            - (-gt[fj][:, :3].T @ gt[fj][:, 3]))
        assert d < 2.0, (
            f"false LocalFusion: kf {e.kf_id}->{e.loop_kf_id} "
            f"gt distance {d:.1f} m")
    assert len(edges) == 0, f"{len(edges)} aliased loop(s) accepted"


def test_embedder_precision_recall_on_circuit():
    """Thumbnail-embedder discrimination at the bench gates (0.52 strong),
    measured the way the pipeline consumes it: per frame, does the ARGMAX
    candidate beyond the skip window fire, and is it a true revisit
    (< 2 m)? Measured on this circuit: candidate precision ~0.32, recall
    ~0.77 — a high-recall proposer whose precision the PnP/match gates
    supply (exactly the bench's max_weak=100 operating point; the
    reference's MobileNet runs much tighter gates, 0.95/0.92/3)."""
    T = 96
    yaw = 2 * np.pi / (T - 8)
    poses = synthetic.forward_motion_poses(T, step=0.35, yaw_rate=yaw)
    lefts, _ = synthetic.render_arena_stereo_sequence(
        poses, rig=synthetic.make_stereo_rig(), center=(0.0, 6.0),
        radius=25.0)
    embs = np.stack([np.asarray(mnv2.embed_image_thumbnail(
        jnp.asarray(np.asarray(l)))) for l in lefts])
    gt = np.asarray(poses)
    cen = np.stack([-p[:, :3].T @ p[:, 3] for p in gt])
    sims = embs @ embs.T
    skip = 24
    fired = correct = have_revisit = hit = 0
    for i in range(skip + 1, T):
        js = sims[i, :i - skip]
        j = int(np.argmax(js))
        true_exists = bool((np.linalg.norm(
            cen[i][None] - cen[:i - skip], axis=1) < 2.0).any())
        have_revisit += true_exists
        if js[j] >= 0.52:
            fired += 1
            good = np.linalg.norm(cen[i] - cen[j]) < 2.0
            correct += good
            hit += true_exists and good
    assert have_revisit > 0, "scene produced no ground-truth revisits"
    recall = hit / have_revisit
    precision = correct / max(fired, 1)
    assert recall >= 0.6, f"candidate recall {recall:.2f}"
    assert precision >= 0.25, f"candidate precision {precision:.2f}"


def test_mnv2_path_at_reference_gates():
    """The MobileNet-V2 embedding path (fabricated weights — no pretrained
    artifact ships in this environment) runs END TO END inside the fused
    program at the reference's own gates (0.95/0.92/max_weak 3,
    loopclosure.cpp defaults): exercises preprocess -> conv stack -> embed
    -> database scan -> gating plumbing on the scored path."""
    T = 40
    yaw = 2 * np.pi / T
    poses = synthetic.forward_motion_poses(T, step=0.5, yaw_rate=yaw)
    lefts, rights = synthetic.render_arena_stereo_sequence(
        poses, rig=synthetic.make_stereo_rig(), center=(0.0, 6.0),
        radius=25.0)
    cfg = SlamConfig(num_features=250,
                     num_features_needed_for_keyframe=1000,
                     keyframes_to_skip_in_candidate_search=15,
                     potential_loop_strong_threshold=0.95,
                     potential_loop_weak_threshold=0.92,
                     max_num_weak_threshold=3,
                     min_num_acceptable_keypoint_match=10,
                     lk_max_iters=12, pose_rounds=3, pose_iters_per_round=6,
                     ba_lm_iters=6)
    params = mnv2.init_params(seed=0)
    vo = _run_fused(lefts, rights, cfg, mnv2_params=params)
    keyframes, landmarks, frames = vo.drain()
    assert len(keyframes) >= T - 5
    assert all(np.isfinite(np.asarray(p)).all()
               for _, p in keyframes.values())
    # random weights give near-constant embeddings -> everything is a "weak"
    # candidate and the max_weak=3 gate must hold (no spurious fusions)
    assert len(vo.loop_edges()) == 0
