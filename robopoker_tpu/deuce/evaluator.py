"""Vectorized hand-strength evaluator.

TPU-native counterpart of the reference's bitwise evaluator
(ref: crates/deuce/src/evaluator.rs:27-177). The reference evaluates one
hand at a time with an early-exit cascade (straight flush → ... → high
card). On TPU, branching per hand is poison: instead we compute **every
category's candidate in parallel** with pure bitwise/VPU ops over batched
``[..., 4]`` per-suit rank masks and select the best by priority — no
lookup tables, no gathers, fully fused by XLA. Throughput goal is the
"nanosecond evaluation" class of the reference, but for millions of hands
per call.

The result is one packed int32 **strength code** per hand that compares
correctly with ``<``/``>``:

    [ranking:4 | primary:4 | secondary:4 | kicker_mask:13]

- ``ranking``   category 0..8 (see below)
- ``primary``   main rank (pair rank, straight-high, flush-high, trips...)
- ``secondary`` second rank (two-pair low, full-house pair), else 0
- ``kickers``   13-bit rank mask of tie-break cards (mask order = correct
  lexicographic kicker order, as in ref: crates/deuce/src/kicks.rs)

Category order follows **standard poker** (full house > flush):
HighCard=0, OnePair=1, TwoPair=2, Trips=3, Straight=4, Flush=5,
FullHouse=6, Quads=7, StraightFlush=8. NOTE: the reference's standard-mode
``Ranking`` enum (ref: crates/deuce/src/ranking.rs:31-43) accidentally
swaps FullHouse/Flush between its shortdeck/standard cfg variants; we
implement real poker for both and treat that as a reference quirk, not a
behavior to reproduce. With ``shortdeck=True`` the wheel becomes A6789
(ref: crates/deuce/src/evaluator.rs:7-15) and flush ranks above full house.

Flush strengths carry only the top flush rank with no kickers, matching
the reference exactly (ref: crates/deuce/src/evaluator.rs:104-110 — a
deliberate, documented lossy comparison shared by both implementations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .cards import suit_masks

# Ranking category codes (standard order; shortdeck swaps FLUSH/FULL_HOUSE).
HIGH_CARD = 0
ONE_PAIR = 1
TWO_PAIR = 2
THREE_OAK = 3
STRAIGHT = 4
FLUSH = 5
FULL_HOUSE = 6
FOUR_OAK = 7
STRAIGHT_FLUSH = 8

WHEEL = 0b1_0000_0000_1111          # A5432 (ref: evaluator.rs:8)
WHEEL_SHORT = 0b1_0000_1111_0000    # A9876 (ref: evaluator.rs:13)
WHEEL_HIGH = 3                      # Five
WHEEL_HIGH_SHORT = 7                # Nine

_popcount = jax.lax.population_count


def _msb_index(x: jnp.ndarray) -> jnp.ndarray:
    """Index of highest set bit of a ≤16-bit mask (undefined for 0 → -1)."""
    y = x
    y = y | (y >> 1)
    y = y | (y >> 2)
    y = y | (y >> 4)
    y = y | (y >> 8)
    return _popcount(y) - 1


def _top_k_mask(mask: jnp.ndarray, k: jnp.ndarray | int) -> jnp.ndarray:
    """Keep only the k highest set bits (clears lowest-first, like the
    reference's trailing-zeros trim, ref: evaluator.rs:56-70)."""
    out = mask
    for _ in range(8):  # ≤8 distinct ranks in any ≤8-card hand
        out = jnp.where(_popcount(out) > k, out & (out - 1), out)
    return out


def _straight_high(ranks: jnp.ndarray, wheel: int, wheel_high: int) -> jnp.ndarray:
    """Highest straight-top rank in a 13-bit rank mask, or -1.

    Same recurrence as the reference's 4× ``bits &= bits << 1``
    (ref: evaluator.rs:120-135): after the folds, bit r survives iff ranks
    r-4..r are all present.
    """
    bits = ranks
    bits = bits & (bits << 1)
    bits = bits & (bits << 1)
    bits = bits & (bits << 1)
    bits = bits & (bits << 1)
    hi = _msb_index(bits & 0x1FFF)
    is_wheel = (ranks & wheel) == wheel
    return jnp.where(hi >= 0, hi, jnp.where(is_wheel, wheel_high, -1))


def _pack(code, primary, secondary, kickers):
    return (
        (code.astype(jnp.int32) << 21)
        | (primary.astype(jnp.int32) << 17)
        | (secondary.astype(jnp.int32) << 13)
        | kickers.astype(jnp.int32)
    )


@functools.partial(jax.jit, static_argnames=("shortdeck",))
def strength_from_masks(suits: jnp.ndarray, shortdeck: bool = False) -> jnp.ndarray:
    """Packed strength codes for batched per-suit masks ``[..., 4]`` int32."""
    wheel = WHEEL_SHORT if shortdeck else WHEEL
    wheel_high = WHEEL_HIGH_SHORT if shortdeck else WHEEL_HIGH

    s0, s1, s2, s3 = (suits[..., i] for i in range(4))
    ranks = s0 | s1 | s2 | s3

    # multiplicity masks: ranks held by ≥2 / ≥3 / 4 suits
    ge2 = (s0 & s1) | (s0 & s2) | (s0 & s3) | (s1 & s2) | (s1 & s3) | (s2 & s3)
    ge3 = (
        (s0 & s1 & s2) | (s0 & s1 & s3) | (s0 & s2 & s3) | (s1 & s2 & s3)
    )
    ge4 = s0 & s1 & s2 & s3

    # flush: the (unique, ≤7 cards) suit holding ≥5 cards
    counts = jnp.stack([_popcount(s) for s in (s0, s1, s2, s3)], axis=-1)
    has5 = counts >= 5
    has_flush = has5.any(axis=-1)
    flush_mask = jnp.where(has5, suits, 0).sum(axis=-1)  # 0 or the flush suit

    straight_hi = _straight_high(ranks, wheel, wheel_high)
    sflush_hi = _straight_high(flush_mask, wheel, wheel_high)

    quad_rank = _msb_index(ge4)
    trips_rank = _msb_index(ge3)
    pair_hi = _msb_index(ge2)
    ge2_wo_hi = ge2 & ~jnp.where(pair_hi >= 0, 1 << jnp.maximum(pair_hi, 0), 0)
    pair_lo = _msb_index(ge2_wo_hi)
    # full-house pair: best rank with ≥2, excluding the trips rank
    ge2_wo_trips = ge2 & ~jnp.where(trips_rank >= 0, 1 << jnp.maximum(trips_rank, 0), 0)
    fh_pair = _msb_index(ge2_wo_trips)
    flush_hi = _msb_index(flush_mask)

    zero = jnp.zeros_like(ranks)

    def bit(r):
        return jnp.where(r >= 0, 1 << jnp.maximum(r, 0), 0)

    # per-category packed candidates (kickers trimmed like the reference)
    cand_sf = _pack(jnp.full_like(ranks, STRAIGHT_FLUSH), jnp.maximum(sflush_hi, 0), zero, zero)
    cand_q = _pack(
        jnp.full_like(ranks, FOUR_OAK), jnp.maximum(quad_rank, 0), zero,
        _top_k_mask(ranks & ~bit(quad_rank), 1),
    )
    code_fh = FLUSH if shortdeck else FULL_HOUSE
    code_fl = FULL_HOUSE if shortdeck else FLUSH
    cand_fh = _pack(jnp.full_like(ranks, code_fh), jnp.maximum(trips_rank, 0), jnp.maximum(fh_pair, 0), zero)
    cand_fl = _pack(jnp.full_like(ranks, code_fl), jnp.maximum(flush_hi, 0), zero, zero)
    cand_st = _pack(jnp.full_like(ranks, STRAIGHT), jnp.maximum(straight_hi, 0), zero, zero)
    cand_3 = _pack(
        jnp.full_like(ranks, THREE_OAK), jnp.maximum(trips_rank, 0), zero,
        _top_k_mask(ranks & ~bit(trips_rank), 2),
    )
    cand_2p = _pack(
        jnp.full_like(ranks, TWO_PAIR), jnp.maximum(pair_hi, 0), jnp.maximum(pair_lo, 0),
        _top_k_mask(ranks & ~bit(pair_hi) & ~bit(pair_lo), 1),
    )
    cand_1p = _pack(
        jnp.full_like(ranks, ONE_PAIR), jnp.maximum(pair_hi, 0), zero,
        _top_k_mask(ranks & ~bit(pair_hi), 3),
    )
    hi_rank = _msb_index(ranks)
    cand_hc = _pack(
        jnp.full_like(ranks, HIGH_CARD), jnp.maximum(hi_rank, 0), zero,
        _top_k_mask(ranks & ~bit(hi_rank), 4),
    )

    # priority cascade (same order as ref find_ranking, evaluator.rs:39-50);
    # full house and flush cannot coexist in ≤8 cards, so the fh-before-fl
    # order is inert and the packed codes already sort categories correctly.
    is_sf = has_flush & (sflush_hi >= 0)
    is_q = quad_rank >= 0
    is_fh = (trips_rank >= 0) & (fh_pair >= 0)
    is_st = straight_hi >= 0
    is_3 = trips_rank >= 0
    is_2p = pair_lo >= 0
    is_1p = pair_hi >= 0

    out = cand_hc
    out = jnp.where(is_1p, cand_1p, out)
    out = jnp.where(is_2p, cand_2p, out)
    out = jnp.where(is_3, cand_3, out)
    out = jnp.where(is_st, cand_st, out)
    out = jnp.where(has_flush, cand_fl, out)
    out = jnp.where(is_fh, cand_fh, out)
    out = jnp.where(is_q, cand_q, out)
    out = jnp.where(is_sf, cand_sf, out)
    return out


def strength(cards: jnp.ndarray, shortdeck: bool = False) -> jnp.ndarray:
    """Packed strength codes for card arrays ``[..., K]`` (pad -1)."""
    return strength_from_masks(suit_masks(cards), shortdeck=shortdeck)


# --- unpacking helpers (host/test use) -------------------------------------

def ranking_of(code) -> np.ndarray:
    return np.asarray(code) >> 21 & 0xF


def primary_of(code) -> np.ndarray:
    return np.asarray(code) >> 17 & 0xF


def secondary_of(code) -> np.ndarray:
    return np.asarray(code) >> 13 & 0xF


def kickers_of(code) -> np.ndarray:
    """13-bit kicker rank mask."""
    return np.asarray(code) & 0x1FFF


def kicker_ranks(code) -> list[int]:
    """Kicker ranks, highest first."""
    m = int(kickers_of(code))
    return [r for r in range(12, -1, -1) if (m >> r) & 1]
