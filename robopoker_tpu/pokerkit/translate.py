"""Action translation: snapping off-tree bets onto the abstraction grid.

TPU-native counterpart of the reference's translation lattice
(ref: crates/pokerkit/src/translate/lattice.rs:19-189, translation.rs:36-90).
Formulas are identical:

- SNAP       L1-nearest anchor
- HARMONIC   randomized pseudo-harmonic (Ganzfried & Sandholm 2013):
             P(lower) = (B−x)(1+A) / ((B−A)(1+x)), clamped brackets
             collapse to the boundary anchor
- PHARGMAX   deterministic argmax of the pseudo-harmonic weight
             (lower anchor iff p ≥ 0.5)

Implemented as vectorized jnp over batched observations against a static
ascending anchor vector — translation happens on the serving path for
every off-grid opponent bet (ref: crates/spar/src/translate.rs,
kicker/src/game.rs:779-830).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .regime import Translation


def _bracket(anchors: jnp.ndarray, x: jnp.ndarray):
    """Indices (lo, hi) of the anchors bracketing each x (clamped at the
    ends, lo == hi when outside the lattice)."""
    n = anchors.shape[0]
    hi = jnp.searchsorted(anchors, x, side="left")
    hi = jnp.clip(hi, 0, n - 1)
    lo = jnp.clip(hi - 1, 0, n - 1)
    # x below the first anchor → clamp both to 0; above last → both n-1
    below = x <= anchors[0]
    above = x >= anchors[n - 1]
    lo = jnp.where(below, 0, jnp.where(above, n - 1, lo))
    hi = jnp.where(below, 0, jnp.where(above, n - 1, hi))
    # exact hits collapse
    exact = anchors[hi] == x
    lo = jnp.where(exact, hi, lo)
    return lo, hi


def snap(anchors: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-anchor index (L1), first wins ties like the reference's
    min_by (lattice.rs:141-150 keeps the earliest minimum)."""
    d = jnp.abs(anchors[None, :] - x[..., None])
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def pharmonic_weight(anchors: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """P(map to lower anchor) under the pseudo-harmonic rule; 1.0 for
    clamped brackets (lattice.rs:159-168)."""
    lo, hi = _bracket(anchors, x)
    a = anchors[lo]
    b = anchors[hi]
    clamped = lo == hi
    p = jnp.where(
        clamped, 1.0,
        ((b - x) * (1.0 + a)) / jnp.maximum((b - a) * (1.0 + x), 1e-30),
    )
    return jnp.clip(p, 0.0, 1.0)


def harmonic(anchors: jnp.ndarray, x: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
    """Randomized pseudo-harmonic anchor index (lattice.rs:170-180)."""
    lo, hi = _bracket(anchors, x)
    p = pharmonic_weight(anchors, x)
    u = jax.random.uniform(key, x.shape)
    return jnp.where(u < p, lo, hi).astype(jnp.int32)


def phargmax(anchors: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Deterministic pseudo-harmonic argmax (lattice.rs:182-189)."""
    lo, hi = _bracket(anchors, x)
    p = pharmonic_weight(anchors, x)
    return jnp.where(p >= 0.5, lo, hi).astype(jnp.int32)


def translate(anchors, x, policy: Translation, key=None) -> jnp.ndarray:
    """Dispatch on the configured translation scheme
    (ref: translation.rs:36-90)."""
    anchors = jnp.asarray(anchors, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    if policy is Translation.SNAP:
        return snap(anchors, x)
    if policy is Translation.HARMONIC:
        assert key is not None, "harmonic translation draws randomness"
        return harmonic(anchors, x, key)
    return phargmax(anchors, x)
