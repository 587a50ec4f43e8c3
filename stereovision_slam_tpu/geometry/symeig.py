"""Batched symmetric eigendecomposition for tiny matrices (cyclic Jacobi).

Why this exists: ``jnp.linalg.svd``/``jnp.linalg.eigh`` lower to LAPACK-style
algorithms (qdwh) whose implementation embeds small dense ARRAY CONSTANTS in
the compiled executable. The axon TPU runtime executes any program containing
an array constant (>= 2 elements) through a pathological slow path — measured
~100x per-dispatch degradation that also poisons every subsequent dispatch in
the process (see docs/PERFORMANCE.md "array-constant cliff"). The SLAM hot
path needs eigenvectors of 3x3/4x4 Gram matrices (DLT triangulation
null vectors, PnP rotation extraction), so this module provides a
constant-free alternative: one-sided cyclic Jacobi rotations built from
``jnp.eye`` + one-hot outer products (iota-based, never folded into data
constants), batched over the leading axis.

For d<=4 and PSD Gram matrices, 8 sweeps reach float32 machine precision
(Jacobi converges quadratically); validated against numpy in
tests/test_camera_triangulation.py and tests/test_symeig.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _one_hot(i: int, d: int, dtype) -> jax.Array:
    # iota-based one-hot: never becomes a data constant in the executable
    return (jax.lax.broadcasted_iota(jnp.int32, (d,), 0) == i).astype(dtype)


def _jacobi_rotation(B: jax.Array, p: int, q: int, d: int):
    """Batched Jacobi rotation zeroing B[:, p, q]; returns the (d, d) rotation
    as a batched matrix G so B' = G^T B G (p, q are static Python ints)."""
    dtype = B.dtype
    app = B[:, p, p]
    aqq = B[:, q, q]
    apq = B[:, p, q]

    # classic stable formulas (Golub & Van Loan 8.4)
    small = jnp.abs(apq) <= 1e-20 * (jnp.abs(app) + jnp.abs(aqq) + 1e-30)
    tau = (aqq - app) / (2.0 * jnp.where(small, 1.0, apq))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(jnp.sign(tau) == 0.0, 1.0 / (tau + jnp.sqrt(1.0 + tau * tau)), t)
    t = jnp.where(small, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c

    ep = _one_hot(p, d, dtype)
    eq = _one_hot(q, d, dtype)
    Epp = jnp.outer(ep, ep)
    Eqq = jnp.outer(eq, eq)
    Epq = jnp.outer(ep, eq)
    Eqp = jnp.outer(eq, ep)
    eye = jnp.eye(d, dtype=dtype)
    # G = I + (c-1)(Epp+Eqq) + s Epq - s Eqp, batched over the leading axis
    G = (eye[None]
         + (c - 1.0)[:, None, None] * (Epp + Eqq)[None]
         + s[:, None, None] * Epq[None]
         - s[:, None, None] * Eqp[None])
    return G


@partial(jax.jit, static_argnames=("sweeps",))
def symeig_small(B: jax.Array, sweeps: int = 8):
    """Eigendecomposition of a batch of small symmetric matrices.

    Args:
      B: (N, d, d) symmetric (d <= ~6; intended for 3x3 / 4x4).
      sweeps: cyclic Jacobi sweeps (8 reaches f32 precision for d=4).

    Returns:
      (eigvals, eigvecs): eigvals (N, d) ASCENDING, eigvecs (N, d, d) with
      eigvecs[n, :, i] the eigenvector of eigvals[n, i] (same convention as
      ``jnp.linalg.eigh``).
    """
    N, d, _ = B.shape
    dtype = B.dtype
    V = jnp.broadcast_to(jnp.eye(d, dtype=dtype), (N, d, d))

    for _ in range(sweeps):
        for p in range(d - 1):
            for q in range(p + 1, d):
                G = _jacobi_rotation(B, p, q, d)
                B = jnp.einsum("nji,njk,nkl->nil", G, B, G)
                V = jnp.einsum("nij,njk->nik", V, G)

    lam = jnp.diagonal(B, axis1=-2, axis2=-1)  # (N, d)

    # ascending sort WITHOUT lax.sort (avoids sort-lowering constants):
    # for tiny d, a one-hot permutation built from pairwise rank counting.
    # rank[i] = #{j : lam[j] < lam[i]} + #{j < i : lam[j] == lam[i]} (stable)
    less = (lam[:, None, :] < lam[:, :, None]).astype(jnp.int32)   # (N, i, j): lam[j] < lam[i]
    eq = (lam[:, None, :] == lam[:, :, None]).astype(jnp.int32)
    jlt = (jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
           < jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)).astype(jnp.int32)
    rank = (less + eq * jlt[None]).sum(-1)                         # (N, d)
    # permutation one-hot: P[n, r, i] = 1 iff rank[n, i] == r
    P = (rank[:, None, :] == jax.lax.broadcasted_iota(
        jnp.int32, (1, d, 1), 1)).astype(dtype)                    # (N, d, d)
    lam_sorted = jnp.einsum("nri,ni->nr", P, lam)
    V_sorted = jnp.einsum("nri,nci->ncr", P, V)
    return lam_sorted, V_sorted
