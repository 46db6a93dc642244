"""Observations and equity kernels.

TPU-native counterpart of the reference's ``Observation`` equity methods
(ref: crates/deuce/src/observation.rs:26-145): exact river equity over
all C(45,2) = 990 opponent pockets, and Monte-Carlo equity for earlier
streets. The reference computes one observation at a time; here a batch
of observations is evaluated against the full opponent set at once —
[B, 990] strength comparisons as one fused evaluator call (the SURVEY
§3.1 HOT LOOP #1 kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .cards import suit_masks
from .evaluator import strength_from_masks

# all C(52,2) = 1326 pocket pairs, as a static [1326, 2] table
_P = [(a, b) for a in range(52) for b in range(a + 1, 52)]
ALL_POCKETS = np.array(_P, dtype=np.int32)  # [1326, 2]


@jax.jit
def river_equity(pocket: jnp.ndarray, board: jnp.ndarray) -> jnp.ndarray:
    """Exact river equity for batched observations.

    pocket [B, 2], board [B, 5] → f32 [B]: (wins + ties/2) / 990 against
    every opponent pocket drawn from the 45 unseen cards
    (ref: observation.rs:45-62 ``equity``).
    """
    B = pocket.shape[0]
    pocket = pocket.astype(jnp.int32)
    board = board.astype(jnp.int32)

    hero = jnp.concatenate([pocket, board], axis=1)           # [B, 7]
    hero_code = strength_from_masks(suit_masks(hero))         # [B]

    opp = jnp.asarray(ALL_POCKETS)                            # [1326, 2]
    # opponent hand = opp pocket + board
    opp_cards = jnp.concatenate(
        [
            jnp.broadcast_to(opp[None, :, :], (B, 1326, 2)),
            jnp.broadcast_to(board[:, None, :], (B, 1326, 5)),
        ],
        axis=2,
    )                                                         # [B, 1326, 7]
    opp_code = strength_from_masks(suit_masks(opp_cards))     # [B, 1326]

    # exclude opponent pockets overlapping hero's 7 seen cards
    seen = jnp.concatenate([pocket, board], axis=1)           # [B, 7]
    overlap = (
        (opp[None, :, :, None] == seen[:, None, None, :]).any(axis=(2, 3))
    )                                                         # [B, 1326]
    live = ~overlap

    win = (hero_code[:, None] > opp_code) & live
    tie = (hero_code[:, None] == opp_code) & live
    n = live.sum(axis=1)  # = 990 when board/pocket disjoint
    return (win.sum(axis=1) + 0.5 * tie.sum(axis=1)) / jnp.maximum(n, 1)


def equity_mc(pocket: jnp.ndarray, board: jnp.ndarray, n_board: jnp.ndarray,
              key: jnp.ndarray, n_samples: int = 64) -> jnp.ndarray:
    """Monte-Carlo equity for pre-river observations: deal the remaining
    board uniformly, then exact river equity (ref: observation.rs equity_vs
    MC runouts). Deterministic given key."""
    B = pocket.shape[0]

    def one(i, acc):
        k = jax.random.fold_in(key, i)
        # complete the board: draw (5 - n_board) unseen cards
        used = jnp.zeros((B, 53), bool)
        used = used.at[jnp.arange(B)[:, None], pocket.astype(jnp.int32)].set(True)
        bidx = jnp.where(board >= 0, board.astype(jnp.int32), 52)
        used = used.at[jnp.arange(B)[:, None], bidx].set(True)
        u = jax.random.uniform(k, (B, 52))
        u = jnp.where(used[:, :52], jnp.inf, u)
        order = jnp.argsort(u, axis=1).astype(jnp.int32)
        pos = jnp.arange(5)[None, :]
        fill = pos >= n_board[:, None]
        srcidx = jnp.clip(pos - n_board[:, None], 0, 4)
        filled = jnp.where(fill, jnp.take_along_axis(order, srcidx, axis=1),
                           board.astype(jnp.int32))
        return acc + river_equity(pocket, filled)

    total = jax.lax.fori_loop(0, n_samples, one, jnp.zeros(B, jnp.float32))
    return total / n_samples


def equity_bucket(equity: jnp.ndarray, bins: int = 101) -> jnp.ndarray:
    """River abstraction: equity quantized to 0..=100
    (ref: crates/kicker/src/abstraction.rs:89-103)."""
    return jnp.clip((equity * (bins - 1) + 0.5).astype(jnp.int32), 0, bins - 1)


def pack_observation(pocket, board) -> int:
    """Observation → i64: bytes of (card+1) folded public-then-pocket
    (ref: crates/deuce/src/observation.rs:134-141). Host-side wire/DB
    format; 0x00 bytes terminate so card 2c packs as 0x01."""
    acc = 0
    for c in list(board) + list(pocket):
        if c is None or c < 0:
            continue
        acc = (acc << 8) | (int(c) + 1)
    return acc


def unpack_observation(bits: int) -> tuple[list[int], list[int]]:
    """i64 → (pocket, board), inverse of :func:`pack_observation`."""
    cards = []
    while bits > 0:
        cards.append((bits & 0xFF) - 1)
        bits >>= 8
    cards.reverse()  # stored public-first, pocket-last
    return cards[-2:], cards[:-2]
