"""Statistical outlier removal (SOR) for point clouds, TPU-native.

Equivalent of PCL's StatisticalOutlierRemoval as used by the reference
(/root/reference/src/dense_reconstruction.cpp:175-200, meanK 50, sigma 1.0):
for every point compute the mean distance to its k nearest neighbors, then
drop points whose mean distance exceeds (global mean + std_ratio * global
stddev) of those per-point means.

PCL walks a k-d tree per query — branchy pointer chasing that maps terribly
onto a TPU. Here the k-NN search is brute force against a reference set:
pairwise squared distances are one (chunk, 3) x (3, R) matmul per chunk
(||q-r||^2 = ||q||^2 + ||r||^2 - 2 q.r — MXU work), followed by `top_k`.
Chunking over queries bounds the distance-matrix working set; for clouds
larger than `max_ref` the neighbor set is a uniform random subsample, which
leaves the filter's decision unchanged in distribution: every point's mean
k-NN distance scales by the same subsampling factor, and the threshold is
relative (mean + sigma * std over all points).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "method"))
def _mean_knn_chunk(q: jax.Array, ref: jax.Array, k: int,
                    method: str = "exact") -> jax.Array:
    """Mean distance of each query to its k nearest reference points.

    One (C, 3) query chunk against a fixed (R, 3) reference set — compiled
    once per (C, R, k); the host loops chunks so arbitrary cloud sizes don't
    trigger recompiles. A zero-distance hit (the query itself, when it is in
    `ref`) is dropped as "self"; queries NOT in the reference set keep their
    true 1..k neighbors by dropping the (k+1)-th instead — so subsampled
    reference sets introduce no in-sample/out-of-sample asymmetry.

    `method="approx"` uses the TPU-optimized `lax.approx_min_k` (recall
    ~0.95, candidates refined by an exact final top-k, so the returned
    neighbor distances are sorted): measured 0.72 ms vs 31.9 ms for the
    exact variadic top_k at (8192, 8192) k=50 — 44x. A missed true
    neighbor replaces a k-NN distance with a slightly larger one; the SOR
    threshold is RELATIVE (global mean + sigma*std of the same statistic),
    so the keep/drop decision is stable in distribution — the same
    argument the subsampled reference set already relies on (module
    docstring). PCL's k-d tree is exact; this is a documented deviation
    on the TPU path only.
    """
    r2 = jnp.sum(ref * ref, axis=1)
    q2 = jnp.sum(q * q, axis=1)
    d2 = q2[:, None] + r2[None, :] - 2.0 * (q @ ref.T)
    d2 = jnp.maximum(d2, 0.0)
    if method == "approx":
        vals, _ = jax.lax.approx_min_k(d2, k + 1)
        d = jnp.sqrt(vals)          # ascending (aggregated exact top-k)
    else:
        neg, _ = jax.lax.top_k(-d2, k + 1)
        d = jnp.sqrt(-neg)          # ascending: d[:, 0] is the closest
    is_self = d[:, 0] < 1e-6
    drop = jnp.where(is_self, d[:, 0], d[:, k])
    return (jnp.sum(d, axis=1) - drop) / k


def statistical_outlier_removal(points: np.ndarray, mean_k: int = 50,
                                std_ratio: float = 1.0,
                                max_ref: int = 16384, chunk: int = 1024,
                                seed: int = 0,
                                method: str | None = None) -> np.ndarray:
    """Boolean keep-mask over `points` (N, 3), PCL SOR semantics.

    Args:
      mean_k: neighbors per point (PCL setMeanK; reference uses 50).
      std_ratio: sigma multiplier (PCL setStddevMulThresh; reference 1.0).
      max_ref: neighbor search runs against at most this many points;
        larger clouds are subsampled (keeps cost linear in N).
      chunk: queries per distance-matrix tile (C x R floats live at once).
      method: "exact" | "approx" k-NN (see _mean_knn_chunk); None picks
        approx on TPU (44x faster, decision-stable) and exact on CPU
        (deterministic tests, PCL-exact).
    """
    N = len(points)
    if N == 0:
        return np.zeros((0,), bool)
    pts = np.asarray(points, np.float32)
    k = min(mean_k, N - 1, min(N, max_ref) - 1)
    if k < 1:
        return np.ones((N,), bool)

    if N > max_ref:
        sel = np.random.default_rng(seed).choice(N, max_ref, replace=False)
        ref = jnp.asarray(pts[sel])
    else:
        ref = jnp.asarray(pts)

    if method is None:
        method = "approx" if jax.default_backend() == "tpu" else "exact"
    nc = -(-N // chunk)
    pad = nc * chunk - N
    padded = np.concatenate([pts, np.zeros((pad, 3), np.float32)]) \
        if pad else pts
    chunks = jnp.asarray(padded.reshape(nc, chunk, 3))
    mean_d = np.concatenate(
        [np.asarray(_mean_knn_chunk(chunks[i], ref, k, method=method))
         for i in range(nc)]
    )[:N]

    mu = float(mean_d.mean())
    sigma = float(mean_d.std())
    return mean_d <= mu + std_ratio * sigma
