"""Device-mesh helpers for distributed SLAM.

The reference has no distributed runtime at all (SURVEY.md §2: 3 pthreads +
Rerun IPC). This module is the new TPU-native scaling layer: meshes over
which bundle adjustment shards observations (data-parallel axis ``dp``) and
landmark blocks (map-shard axis ``mp`` — the SLAM analogue of tensor/sequence
parallelism), with Schur reductions as `psum`/`all_gather` collectives over
ICI (BASELINE.json configs[4]).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Initialize JAX multi-host execution (one process per host).

    Call before any other JAX API on every host of the pod slice; afterwards
    `jax.devices()` spans all hosts and `make_ba_mesh` lays the (dp, mp) mesh
    over the global device set so the Schur-reduction `psum`s ride ICI within
    a slice and DCN across slices. On single-host TPU or with the
    `xla_force_host_platform_device_count` test mesh this is a no-op.

    Args mirror `jax.distributed.initialize` (auto-detected on Cloud TPU).
    """
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_ba_mesh(n_devices: int | None = None, dp: int | None = None,
                 mp: int | None = None, devices=None) -> Mesh:
    """A (dp, mp) mesh over the available devices.

    dp shards observations, mp shards landmark blocks. Default split: the
    largest power-of-two dp that divides the device count, mp takes the rest.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None or mp is None:
        mp = 1
        dp = n
        # prefer a 2-D split when the device count allows it
        for cand in (2, 4):
            if n % cand == 0 and n // cand >= 2:
                mp = cand
                dp = n // cand
                break
    assert dp * mp == n, f"dp({dp}) * mp({mp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))
