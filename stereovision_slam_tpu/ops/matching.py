"""Hamming matching of binary descriptors.

TPU-native replacement for the reference's BruteForce-Hamming cv::BFMatcher
(/root/reference/src/loopclosure.cpp:60-66, 286-326): the full distance matrix
is one XOR + popcount broadcast, best-match selection is an argmin, and the
reference's distance gate (keep d <= max(2 * d_min, 30)) is a mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _popcount32(x: jax.Array) -> jax.Array:
    """Per-element popcount of uint32."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def hamming_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """(Na, W) x (Nb, W) packed descriptors -> (Na, Nb) int32 distances."""
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jnp.sum(_popcount32(x), axis=-1).astype(jnp.int32)


def match(query: jax.Array, query_ok: jax.Array, train: jax.Array,
          train_ok: jax.Array, dist_floor: float = 30.0):
    """Best-match per query row with the reference's distance gate.

    Mirrors matcher_->match(candidate, current) + the
    max(2 * d_min, 30) threshold (loopclosure.cpp:286-326).

    Returns:
      idx: (Na,) best train index per query.
      dist: (Na,) its Hamming distance.
      good: (Na,) bool — both sides valid and distance within the gate.
    """
    BIG = jnp.int32(10_000)
    d = hamming_matrix(query, train)
    d = jnp.where(train_ok[None, :], d, BIG)
    d = jnp.where(query_ok[:, None], d, BIG)
    idx = jnp.argmin(d, axis=1)
    dist = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
    valid = query_ok & (dist < BIG)
    d_min = jnp.min(jnp.where(valid, dist, BIG))
    thresh = jnp.maximum(2 * d_min, jnp.int32(dist_floor))
    good = valid & (dist <= thresh)
    return idx, dist, good
