"""Stack-to-pot-ratio geometry buckets.

TPU-native counterpart of the reference's SPR axis
(ref: crates/kicker/src/geometry.rs:1-26): four log-spaced SPR buckets
(committed / low / mid / deep) — a V2-only infoset feature, dropped in
V3 but kept available for lineage parity (SURVEY §2.1).
"""

from __future__ import annotations

import jax.numpy as jnp

COMMITTED, LOW, MID, DEEP = 0, 1, 2, 3
# log-spaced cut points on effective-stack / pot
CUTS = (0.5, 2.0, 8.0)


def spr(state) -> jnp.ndarray:
    """Effective stack over pot per game [B] (ref: game.rs:682-698)."""
    eff = state.stack.min(axis=1).astype(jnp.float32)
    return jnp.where(state.pot > 0, eff / state.pot.astype(jnp.float32), 0.0)


def spr_bucket(state) -> jnp.ndarray:
    s = spr(state)
    return (
        (s >= CUTS[0]).astype(jnp.int32)
        + (s >= CUTS[1]).astype(jnp.int32)
        + (s >= CUTS[2]).astype(jnp.int32)
    )
