"""Flat infoset/regret table in HBM.

TPU-native counterpart of the reference's ``HashMap<Info, HashMap<Edge,
Encounter>>`` profile (ref: crates/mccfr/src/strategy/book.rs:14-146) and
its Postgres row key ``(past, present, choices, edge, weight, regret,
payoff, visits)`` (ref: crates/daybook/src/traits/row.rs:47-57).

Design (SURVEY §7.1 "No HashMap profile"): one dense ``[T, 9]`` table per
accumulator, rows addressed by a **multiplicative hash of the infoset
key** (bucket u16, current-street path 60b, choices mask 9b). Round-1
uses lossy addressing — colliding infosets share a row — with the
collision probability held down by sizing T ≥ 4× live infosets; the
stored key words let collisions be *measured* (``collision_stats``) and a
probing insert kernel is the planned upgrade. This is the classic
hashed-CFR tradeoff: regret pollution on collisions degrades the
blueprint gracefully rather than crashing it.

All updates are fused masked scatter-adds — the TPU replacement for the
reference's per-row UPSERTs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

N_COLS = 9


class InfoTable(NamedTuple):
    regret: jnp.ndarray   # f32 [T, 9]
    weight: jnp.ndarray   # f32 [T, 9]
    payoff: jnp.ndarray   # f32 [T, 9]
    visits: jnp.ndarray   # i32 [T]
    key_lo: jnp.ndarray   # i32 [T]  stored key words (collision audit)
    key_hi: jnp.ndarray   # i32 [T]
    epoch: jnp.ndarray    # i32 scalar

    @property
    def capacity(self) -> int:
        return self.regret.shape[0]


def init_table(capacity_log2: int = 20) -> InfoTable:
    t = 1 << capacity_log2
    return InfoTable(
        regret=jnp.zeros((t, N_COLS), jnp.float32),
        weight=jnp.zeros((t, N_COLS), jnp.float32),
        payoff=jnp.zeros((t, N_COLS), jnp.float32),
        visits=jnp.zeros(t, jnp.int32),
        key_lo=jnp.zeros(t, jnp.int32),
        key_hi=jnp.zeros(t, jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )


def make_key(bucket: jnp.ndarray, subgame: jnp.ndarray,
             choices_mask: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mix (bucket u16, packed subgame [.., 2] i32, choices 9b) → 2 words.

    64-bit avalanche built from 32-bit ops (JAX default lanes):
    two rounds of the murmur3-style fmix on each word with cross-feeding.
    """
    def _i32(c: int) -> jnp.int32:
        return jnp.int32(c - (1 << 32) if c >= (1 << 31) else c)

    lo = subgame[..., 0]
    hi = subgame[..., 1]
    a = lo ^ (bucket.astype(jnp.int32) * _i32(0x9E3779B1))
    b = hi ^ (choices_mask.astype(jnp.int32) * _i32(0x85EBCA6B))

    def fmix(x):
        x = x ^ (jnp.right_shift(x.astype(jnp.uint32), 16)).astype(jnp.int32)
        x = x * _i32(0x85EBCA6B)
        x = x ^ (jnp.right_shift(x.astype(jnp.uint32), 13)).astype(jnp.int32)
        x = x * _i32(0xC2B2AE35)
        x = x ^ (jnp.right_shift(x.astype(jnp.uint32), 16)).astype(jnp.int32)
        return x

    a2 = fmix(a + b)
    b2 = fmix(b + a2)
    return a2, b2


def slot_of(key_lo: jnp.ndarray, key_hi: jnp.ndarray, capacity: int) -> jnp.ndarray:
    mask = capacity - 1
    return (key_lo ^ key_hi) & mask


def collision_stats(table: InfoTable, sample_keys: np.ndarray) -> dict:
    """Host-side audit: fraction of sampled keys whose slot stores a
    different key (a live collision)."""
    lo = np.asarray(table.key_lo)
    hi = np.asarray(table.key_hi)
    kl, kh = sample_keys[:, 0], sample_keys[:, 1]
    s = (kl ^ kh) & (table.capacity - 1)
    occupied = (lo[s] != 0) | (hi[s] != 0)
    mismatch = occupied & ((lo[s] != kl) | (hi[s] != kh))
    return {
        "sampled": int(len(kl)),
        "collided": int(mismatch.sum()),
        "occupancy": float(((lo != 0) | (hi != 0)).mean()),
    }
