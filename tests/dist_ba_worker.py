"""Worker for the multi-process distributed-BA test (test_distributed_ba.py).

Run as: python dist_ba_worker.py <process_id> <num_processes> <port> <outdir>

Each process owns 4 virtual CPU devices; the 2-process global mesh has 8.
Process 0 writes the sharded result (and the problem seed's single-chip
reference computed locally) to <outdir>/result.npz.
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = int(sys.argv[3])
outdir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereovision_slam_tpu.parallel.sharded_ba import build_sharded_ba  # noqa: E402
from tests.test_backend_ba import K, F, L, build_window  # noqa: E402

assert len(jax.devices()) == 4 * nproc, len(jax.devices())
assert len(jax.local_devices()) == 4

# dp axis spans BOTH processes: the observation-shard Schur reduction's
# psum crosses the process boundary (the DCN axis of a real pod)
mesh = Mesh(np.array(jax.devices()).reshape(4 * nproc, 1), ("dp", "mp"))

# identical problem in every process (deterministic seed)
m, poses_gt, lms_gt, lm_slots, cams = build_window(
    seed=5, pose_noise=0.03, lm_noise=0.2, px_noise=0.2)

run = build_sharded_ba(mesh, K, F, L, iters=8)
kf, lm = run(m, cams[0], cams[1])
kf = np.asarray(jax.device_get(kf))
lm = np.asarray(jax.device_get(lm))

if pid == 0:
    np.savez(os.path.join(outdir, "result.npz"), kf=kf, lm=lm,
             kf_valid=np.asarray(m.kf_valid), lm_valid=np.asarray(m.lm_valid))
print(f"worker {pid} done", flush=True)
jax.distributed.shutdown()
