"""Full-pipeline loop closure on a synthetic arena circuit.

Drives the classic VisualOdometry with backend + LoopClosure (thumbnail
embedder — no pretrained weights needed) around a closed circle in the
cylindrical arena: place recognition must fire on the revisit, geometric
verification must accept it, and the shutdown pose-graph optimization must
run — the reference's full LoopClosurePipeline + PoseGraphOptimization flow
(loopclosure.cpp:801-879, 641-799) at the package surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereovision_slam_tpu.geometry import se3
from stereovision_slam_tpu.io.kitti import ArraySequenceDataset
from stereovision_slam_tpu.parallel.mesh import make_ba_mesh
from stereovision_slam_tpu.slam.backend import Backend
from stereovision_slam_tpu.slam.config import SlamConfig
from stereovision_slam_tpu.slam.loop_closure import LoopClosure
from stereovision_slam_tpu.slam.pipeline import VisualOdometry
from tests import synthetic


pytestmark = pytest.mark.slow  # >30 s e2e; -m "not slow" for the quick suite


@pytest.mark.parametrize("pgo", ["single", "sharded"])
def test_loop_closes_on_arena_circuit(pgo):
    T = 56
    yaw = 2 * np.pi / T
    rig = synthetic.make_stereo_rig()
    poses = synthetic.forward_motion_poses(T + 8, step=0.5, yaw_rate=yaw)
    lefts, rights = synthetic.render_arena_stereo_sequence(
        poses, rig=rig, center=(0.0, 6.0), radius=25.0)
    ds = ArraySequenceDataset(np.asarray(lefts), np.asarray(rights),
                              [rig[0], rig[1]])

    cfg = SlamConfig(num_features_needed_for_keyframe=1000,  # kf every frame
                     keyframes_to_skip_in_candidate_search=25,
                     potential_loop_strong_threshold=0.90,
                     potential_loop_weak_threshold=0.85,
                     max_num_weak_threshold=100,
                     min_num_acceptable_keypoint_match=10)
    vo = VisualOdometry(cfg, ds, backend=Backend())
    vo.initialize()
    mesh = make_ba_mesh(8) if pgo == "sharded" else None
    lc = LoopClosure(cfg, vo.dataset.get_camera(0), embedder="thumbnail",
                     pgo_mesh=mesh)
    vo.loop_closure = lc
    vo.run()

    assert len(lc.loop_edges) >= 1, "no loop detected on the revisit"
    # the loop must span (nearly) the whole circle
    e = lc.loop_edges[0]
    assert e.kf_id - e.loop_kf_id >= 40
    assert lc.pgo_ran, "shutdown PGO did not run"

    traj = vo.trajectory()
    errs = [float(se3.se3_distance(jnp.asarray(traj[f]), poses[f]))
            for f in traj]
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.3, f"post-PGO ATE {ate:.3f} too large"
