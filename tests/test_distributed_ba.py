"""Distributed BA across a REAL process boundary (VERDICT r3 #8 /
BASELINE.json configs[4] "map sharded across 2+ hosts").

Two OS processes x 4 virtual CPU devices each form an 8-device global mesh
via `jax.distributed.initialize` (Gloo collectives over TCP — the CPU
stand-in for a pod's DCN axis). The dp-axis observation shard spans the
process boundary, so the Schur-block psum is a genuine cross-process
collective. The result must agree with the single-process solver.
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_ba_matches_single_chip():
    from stereovision_slam_tpu.slam.backend import optimize_window
    from tests.test_backend_ba import build_window

    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "dist_ba_worker.py")
    port = _free_port()
    with tempfile.TemporaryDirectory() as tmp:
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        procs = [subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), tmp],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for i in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode(errors="replace"))
        for i, p in enumerate(procs):
            assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-3000:]}"
        d = np.load(os.path.join(tmp, "result.npz"))

    # single-process (this test process: 8 local virtual devices) reference
    m, poses_gt, lms_gt, lm_slots, cams = build_window(
        seed=5, pose_noise=0.03, lm_noise=0.2, px_noise=0.2)
    m_single, _ = optimize_window(m, cams[0], cams[1], iters=8,
                                  outlier_rounds=0)
    valid = np.asarray(m_single.kf_valid)
    np.testing.assert_allclose(d["kf"][valid],
                               np.asarray(m_single.kf_pose)[valid],
                               atol=5e-3)
    lmv = np.asarray(m_single.lm_valid)
    np.testing.assert_allclose(d["lm"][lmv],
                               np.asarray(m_single.lm_pos)[lmv], atol=5e-2)
