"""Card primitives.

TPU-native counterpart of the reference's ``Card``/``Hand`` types
(ref: crates/deuce/src/card.rs:24-90, hand.rs:24-90). The reference packs a
hand as one ``u64`` bitset; JAX lanes are 32-bit, so our canonical batched
hand layout is **four 13-bit per-suit rank masks** in an int32 ``[..., 4]``
array — the same 52 bits, pre-split along the axis every evaluator op needs
(flush = per-suit popcount, rank collapse = OR across the suit axis). All
set-algebra stays O(1) bitwise, and the layout vectorizes on the VPU with
no 64-bit emulation.

Card encoding matches the reference bijection: ``card = rank*4 + suit``
with ranks 2..A = 0..12 and suits c,d,h,s = 0..3
(ref: crates/deuce/src/card.rs:39-55, suit.rs:12-17).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import jax.numpy as jnp
import numpy as np

RANK_CHARS = "23456789TJQKA"
SUIT_CHARS = "cdhs"
N_RANKS = 13
N_SUITS = 4
N_CARDS = 52

# Named ranks for test readability (Two=0 .. Ace=12).
TWO, THREE, FOUR, FIVE, SIX, SEVEN, EIGHT, NINE, TEN, JACK, QUEEN, KING, ACE = range(13)


def card(rank: int, suit: int) -> int:
    return rank * 4 + suit


def rank_of(c: int) -> int:
    return c >> 2


def suit_of(c: int) -> int:
    return c & 3


def parse_card(s: str) -> int:
    """'As' -> card int. Case-sensitive ranks, lowercase suits."""
    r = RANK_CHARS.index(s[0].upper())
    u = SUIT_CHARS.index(s[1].lower())
    return card(r, u)


def parse_cards(s: str | Iterable[str]) -> np.ndarray:
    """'As Kh Qd' (or iterable of 2-char strings) -> int8 card array."""
    toks = s.split() if isinstance(s, str) else list(s)
    return np.array([parse_card(t) for t in toks], dtype=np.int8)


def card_str(c: int) -> str:
    return RANK_CHARS[rank_of(c)] + SUIT_CHARS[suit_of(c)]


def cards_str(cs: Sequence[int]) -> str:
    return " ".join(card_str(int(c)) for c in cs if c >= 0)


def suit_masks_np(cards: np.ndarray) -> np.ndarray:
    """Host-side: card array [..., K] (pad -1) -> per-suit rank masks [..., 4].

    numpy mirror of :func:`suit_masks` for test oracles and enumeration.
    """
    cards = np.asarray(cards, dtype=np.int64)
    valid = cards >= 0
    r = np.where(valid, cards >> 2, 0)
    s = np.where(valid, cards & 3, 0)
    bits = np.where(valid, 1 << r, 0)
    out = np.zeros(cards.shape[:-1] + (4,), dtype=np.int32)
    for suit in range(4):
        out[..., suit] = np.where(s == suit, bits, 0).sum(axis=-1).astype(np.int32)
    return out


def suit_masks(cards: jnp.ndarray) -> jnp.ndarray:
    """Device-side: card array [..., K] (pad -1) -> per-suit masks [..., 4] int32.

    This is the layout conversion at the edge of every evaluator call; under
    jit it fuses into the consuming kernel.
    """
    cards = cards.astype(jnp.int32)
    valid = cards >= 0
    r = jnp.where(valid, cards >> 2, 0)
    s = jnp.where(valid, cards & 3, 0)
    bits = jnp.where(valid, jnp.left_shift(1, r), 0)
    # one-hot over suit axis, then OR-accumulate (sum works: a card appears once)
    per_suit = jnp.where(
        s[..., None] == jnp.arange(4, dtype=jnp.int32), bits[..., None], 0
    )
    return per_suit.sum(axis=-2).astype(jnp.int32)


def hand_u64(cards: Sequence[int]) -> int:
    """Host-side u64 bitset (bit i = card i), the reference's Hand repr."""
    h = 0
    for c in cards:
        if c >= 0:
            h |= 1 << int(c)
    return h


def u64_cards(h: int) -> list[int]:
    return [i for i in range(N_CARDS) if (h >> i) & 1]


ALL_CARDS = np.arange(N_CARDS, dtype=np.int8)
