"""Flat infoset/regret table in HBM.

TPU-native counterpart of the reference's ``HashMap<Info, HashMap<Edge,
Encounter>>`` profile (ref: crates/mccfr/src/strategy/book.rs:14-146) and
its Postgres row key ``(past, present, choices, edge, weight, regret,
payoff, visits)`` (ref: crates/daybook/src/traits/row.rs:47-57).

Design (SURVEY §7.1 "No HashMap profile"): one dense ``[T, 9]`` table per
accumulator, rows addressed by a hash of the infoset key (bucket u16,
current-street path 60b, choices mask 9b) resolved with **vectorized
open addressing** (``probe_rows``): a fixed ladder of double-hashed
candidate slots, first-match-else-first-empty-else-shared. New keys
claim the first empty candidate (the trainer persists the key words on
update, guarded so a resident key is never overwritten); only keys that
exhaust the whole ladder share a row, and that event is counted
(``fallbacks`` metric / ``collision_stats``). Two distinct keys claiming
the same empty slot in the same epoch pollute it for that one epoch,
then the scatter's surviving key keeps the row and the loser re-probes
to its next candidate — transient, self-healing, and measured.

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
    # sidecar words persisted with the key claim so analysis endpoints
    # can attribute rows (the reference keeps these in its Postgres row
    # key, ref: crates/daybook/src/traits/row.rs:47-57; a hash-addressed
    # table must store them explicitly): bucket = abstraction word + 1
    # (0 = unknown/legacy checkpoint), choices = 9-bit legal-column mask
    bucket: jnp.ndarray   # i32 [T]
    choices: jnp.ndarray  # i32 [T]
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
        bucket=jnp.zeros(t, jnp.int32),
        choices=jnp.zeros(t, jnp.int32),
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
    """Lossy single-shot addressing — kept for small short-lived tables
    that do not persist key words (the subgame resolver's local table)."""
    mask = capacity - 1
    return (key_lo ^ key_hi) & mask


N_PROBES = 8


def probe_rows(stored_lo: jnp.ndarray, stored_hi: jnp.ndarray,
               klo: jnp.ndarray, khi: jnp.ndarray,
               n_probes: int = N_PROBES) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact open-addressed row resolution over the stored key words.

    TPU formulation of the reference's ``HashMap`` probe (ref:
    crates/mccfr/src/strategy/book.rs): instead of a data-dependent walk,
    gather a fixed ladder of ``n_probes`` double-hashed candidates and
    select the first that matches this key, else the first empty (a
    claim), else share the last candidate lossily. Because slots are
    never vacated, a key's earlier candidates stay occupied after it
    claims — so first-hit is always the right row.

    Returns ``(rows, fallback)`` where ``fallback`` marks ladder-
    exhausted keys (the only remaining source of regret pollution).
    """
    capacity = stored_lo.shape[0]
    mask = capacity - 1
    base = klo ^ khi
    stride = (khi << 1) | 1  # odd stride => full cycle on a 2^k table
    offs = jnp.arange(n_probes, dtype=jnp.int32)
    cand = (base[..., None] + offs * stride[..., None]) & mask
    slo = stored_lo[cand]
    shi = stored_hi[cand]
    hit = ((slo == klo[..., None]) & (shi == khi[..., None])) | (
        (slo == 0) & (shi == 0)
    )
    any_hit = hit.any(-1)
    pick = jnp.where(any_hit, jnp.argmax(hit, axis=-1), n_probes - 1)
    rows = jnp.take_along_axis(cand, pick[..., None], axis=-1)[..., 0]
    return rows, ~any_hit


def collision_stats(table: InfoTable, sample_keys: np.ndarray,
                    n_probes: int = N_PROBES) -> dict:
    """Host-side audit mirroring ``probe_rows``: fraction of sampled keys
    that exhaust the probe ladder (live collision) and fraction resolved
    past the base slot (displaced)."""
    lo = np.asarray(table.key_lo)
    hi = np.asarray(table.key_hi)
    kl = sample_keys[:, 0].astype(np.int32)
    kh = sample_keys[:, 1].astype(np.int32)
    mask = table.capacity - 1
    base = kl ^ kh
    stride = (kh << 1) | np.int32(1)
    cand = (base[:, None] + np.arange(n_probes, dtype=np.int32)
            * stride[:, None]) & mask
    slo, shi = lo[cand], hi[cand]
    hit = ((slo == kl[:, None]) & (shi == kh[:, None])) | (
        (slo == 0) & (shi == 0)
    )
    any_hit = hit.any(1)
    first = np.argmax(hit, axis=1)
    return {
        "sampled": int(len(kl)),
        "collided": int((~any_hit).sum()),
        "displaced": int((any_hit & (first > 0)).sum()),
        "occupancy": float(((lo != 0) | (hi != 0)).mean()),
    }
