"""Street histogram builders (the k-means feature vectors).

TPU-native counterpart of the reference's ``Histogram``/``Bins`` dense
arrays (ref: crates/lloyd/src/histogram.rs:27-60, bins.rs:6-18) and the
``projections()`` parent-street construction (ref: lookup.rs:43-60):

- river: exact equity → one of 101 buckets (the terminal abstraction)
- turn: [B, 101] distribution of river-child equity buckets (≤46 rivers)
- flop: [B, 256] distribution of turn-child clusters (≤47 turns),
  children resolved through the canonical-iso lookup table
- preflop: [B, 256] distribution over flop-child clusters

All builders enumerate children as a masked 52-card axis — no dynamic
shapes; cards already seen mask out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..deuce.isomorphism import canonical_key
from ..deuce.observation import equity_bucket, river_equity
from .lookup import IsoLookup, lookup_device

N_EQ_BINS = 101


def _seen_mask(pocket: jnp.ndarray, board: jnp.ndarray) -> jnp.ndarray:
    """[B, 52] True where the card is already in (pocket, board)."""
    B = pocket.shape[0]
    cards = jnp.concatenate([pocket, board], axis=1).astype(jnp.int32)
    m = jnp.zeros((B, 53), bool)
    idx = jnp.where(cards >= 0, cards, 52)
    m = m.at[jnp.arange(B)[:, None], idx].set(True)
    return m[:, :52]


@jax.jit
def turn_histograms(pocket: jnp.ndarray, board4: jnp.ndarray) -> jnp.ndarray:
    """[B, 101] equity-bucket distribution over the 46 river children.

    For each unseen card as river: exact equity, quantized, one-hot
    accumulated, normalized.
    """
    B = pocket.shape[0]
    seen = _seen_mask(pocket, board4)

    def per_river(c, acc):
        board5 = jnp.concatenate(
            [board4.astype(jnp.int32), jnp.full((B, 1), c, jnp.int32)], axis=1
        )
        eq = river_equity(pocket, board5)
        b = equity_bucket(eq, N_EQ_BINS)
        live = ~seen[:, c]
        return acc.at[jnp.arange(B), b].add(live.astype(jnp.float32))

    acc = jax.lax.fori_loop(
        0, 52, per_river, jnp.zeros((B, N_EQ_BINS), jnp.float32)
    )
    return acc / jnp.maximum(acc.sum(axis=1, keepdims=True), 1e-30)


def child_cluster_histograms(pocket: jnp.ndarray, board: jnp.ndarray,
                             lookup: IsoLookup, n_bins: int) -> jnp.ndarray:
    """[B, n_bins] distribution of next-street child clusters.

    Appends each unseen card to the board, canonicalizes the child
    observation, and resolves its cluster through the lookup table
    (the reference's projections(), ref: lookup.rs:43-60).
    """
    B = pocket.shape[0]
    seen = _seen_mask(pocket, board)
    # hash with the version the lookup table was BUILT with — a mismatch
    # would silently miss every key (uniform histograms)
    from ..deuce.isomorphism import hash_for_version

    hash_fn = hash_for_version(lookup.hash_version)

    def per_child(c, acc):
        childb = jnp.concatenate(
            [board.astype(jnp.int32), jnp.full((B, 1), c, jnp.int32)], axis=1
        )
        words = canonical_key(pocket, childb)
        h1, h2 = hash_fn(words)
        cl = lookup_device(lookup, h1, h2)
        live = ~seen[:, c]
        return acc.at[jnp.arange(B), jnp.clip(cl, 0, n_bins - 1)].add(
            live.astype(jnp.float32)
        )

    acc = jax.lax.fori_loop(
        0, 52, per_child, jnp.zeros((B, n_bins), jnp.float32)
    )
    return acc / jnp.maximum(acc.sum(axis=1, keepdims=True), 1e-30)
