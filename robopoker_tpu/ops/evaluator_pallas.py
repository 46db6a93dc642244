"""Pallas TPU kernel for batched hand-strength evaluation.

The BASELINE north-star "vectorized rank kernel": the same category-
parallel bitwise evaluation as robopoker_tpu.deuce.evaluator, written as
an explicit Pallas kernel so the whole cascade runs register-resident on
the VPU over (8,128)-tiled blocks with no intermediate HBM traffic. The
jnp version already fuses well under XLA; this kernel exists to (a) pin
the layout/tiling explicitly for the settle/bucket hot path and (b)
serve as the template for further fused kernels (settle = evaluate +
compare + pnl in one pass).

Correctness contract: bit-identical to ``deuce.evaluator
.strength_from_masks`` (tested in tests/test_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..deuce.evaluator import (
    FLUSH,
    FOUR_OAK,
    FULL_HOUSE,
    HIGH_CARD,
    ONE_PAIR,
    STRAIGHT,
    STRAIGHT_FLUSH,
    THREE_OAK,
    TWO_PAIR,
    WHEEL,
    WHEEL_HIGH,
)

BLOCK = 1024  # rows per grid step ((8,128)-aligned when viewed as 8x128)


def _popcount(x):
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def _msb_index(x):
    y = x
    y = y | (y >> 1)
    y = y | (y >> 2)
    y = y | (y >> 4)
    y = y | (y >> 8)
    return _popcount(y) - 1


def _top_k(mask, k):
    out = mask
    for _ in range(8):
        out = jnp.where(_popcount(out) > k, out & (out - 1), out)
    return out


def _straight_high(ranks):
    bits = ranks
    bits = bits & (bits << 1)
    bits = bits & (bits << 1)
    bits = bits & (bits << 1)
    bits = bits & (bits << 1)
    hi = _msb_index(bits & 0x1FFF)
    is_wheel = (ranks & WHEEL) == WHEEL
    return jnp.where(hi >= 0, hi, jnp.where(is_wheel, WHEEL_HIGH, -1))


def _strength_from_suits(s0, s1, s2, s3):
    ranks = s0 | s1 | s2 | s3
    ge2 = (s0 & s1) | (s0 & s2) | (s0 & s3) | (s1 & s2) | (s1 & s3) | (s2 & s3)
    ge3 = (s0 & s1 & s2) | (s0 & s1 & s3) | (s0 & s2 & s3) | (s1 & s2 & s3)
    ge4 = s0 & s1 & s2 & s3

    # elementwise selects + ors, NOT a [.., 4]-stacked bool reduce: a
    # bool (i1) minor-axis reduction lowers to an i1->i32 vreg bitcast
    # that Mosaic rejects ("Invalid vector register cast", seen on the
    # real chip). At most one suit of 7 cards can hold >=5, so OR of
    # per-suit selects is bit-identical to the masked sum.
    h0 = _popcount(s0) >= 5
    h1 = _popcount(s1) >= 5
    h2 = _popcount(s2) >= 5
    h3 = _popcount(s3) >= 5
    zero32 = jnp.zeros_like(s0)
    flush_mask = (jnp.where(h0, s0, zero32) | jnp.where(h1, s1, zero32)
                  | jnp.where(h2, s2, zero32) | jnp.where(h3, s3, zero32))
    has_flush = h0 | h1 | h2 | h3

    straight_hi = _straight_high(ranks)
    sflush_hi = _straight_high(flush_mask)
    quad = _msb_index(ge4)
    trips = _msb_index(ge3)
    p_hi = _msb_index(ge2)

    def bit(r):
        return jnp.where(r >= 0, 1 << jnp.maximum(r, 0), 0)

    p_lo = _msb_index(ge2 & ~bit(p_hi))
    fh_pair = _msb_index(ge2 & ~bit(trips))
    flush_hi = _msb_index(flush_mask)
    hc = _msb_index(ranks)
    zero = jnp.zeros_like(ranks)

    def pack(code, primary, secondary, kick):
        return (code << 21) | (jnp.maximum(primary, 0) << 17) | \
               (jnp.maximum(secondary, 0) << 13) | kick

    out = pack(jnp.full_like(ranks, HIGH_CARD), hc, zero,
               _top_k(ranks & ~bit(hc), 4))
    out = jnp.where(p_hi >= 0, pack(
        jnp.full_like(ranks, ONE_PAIR), p_hi, zero,
        _top_k(ranks & ~bit(p_hi), 3)), out)
    out = jnp.where(p_lo >= 0, pack(
        jnp.full_like(ranks, TWO_PAIR), p_hi, p_lo,
        _top_k(ranks & ~bit(p_hi) & ~bit(p_lo), 1)), out)
    out = jnp.where(trips >= 0, pack(
        jnp.full_like(ranks, THREE_OAK), trips, zero,
        _top_k(ranks & ~bit(trips), 2)), out)
    out = jnp.where(straight_hi >= 0, pack(
        jnp.full_like(ranks, STRAIGHT), straight_hi, zero, zero), out)
    out = jnp.where(has_flush, pack(
        jnp.full_like(ranks, FLUSH), flush_hi, zero, zero), out)
    out = jnp.where((trips >= 0) & (fh_pair >= 0), pack(
        jnp.full_like(ranks, FULL_HOUSE), trips, fh_pair, zero), out)
    out = jnp.where(quad >= 0, pack(
        jnp.full_like(ranks, FOUR_OAK), quad, zero,
        _top_k(ranks & ~bit(quad), 1)), out)
    out = jnp.where(has_flush & (sflush_hi >= 0), pack(
        jnp.full_like(ranks, STRAIGHT_FLUSH), sflush_hi, zero, zero), out)
    return out


def _strength_kernel(s_ref, out_ref):
    out_ref[:] = _strength_from_suits(
        s_ref[:, 0], s_ref[:, 1], s_ref[:, 2], s_ref[:, 3]
    )


def _settle_kernel(cards_ref, spent_ref, folded_ref, out_ref):
    """Fused terminal settlement: per-seat suit-mask build + the full
    strength cascade (twice) + compare + heads-up side-pot PnL, one HBM
    read of (cards, spent, folded) and one write of pnl — the
    "settle = evaluate + compare + pnl in one pass" prize named in this
    module's docstring. Semantics are kicker.game.settle exactly
    (ref: crates/kicker/src/showdown.rs:18-40)."""
    codes = []
    for seat in (0, 1):
        masks = [jnp.zeros_like(spent_ref[:, 0])] * 4
        for j in range(7):
            c = cards_ref[:, seat * 7 + j]
            valid = c >= 0
            bit = jnp.where(valid, 1 << jnp.where(valid, c >> 2, 0), 0)
            suit = jnp.where(valid, c & 3, 0)
            masks = [
                jnp.where(suit == s, m | bit, m)
                for s, m in enumerate(masks)
            ]
        codes.append(_strength_from_suits(*masks))
    win0 = codes[0] > codes[1]
    tie = codes[0] == codes[1]
    spent0 = spent_ref[:, 0]
    spent1 = spent_ref[:, 1]
    matched = jnp.minimum(spent0, spent1)
    show_pnl0 = jnp.where(tie, 0, jnp.where(win0, matched, -matched))
    folded0 = folded_ref[:, 0] != 0
    folded1 = folded_ref[:, 1] != 0
    any_fold = folded0 | folded1
    # fold: survivor wins the loser's entire spend. Winner-is-seat-0
    # mirrors argmax(~folded) — seat 0 also "wins" the (unreachable)
    # both-folded row, keeping bit-identity with kicker.game.settle
    fold_winner0 = ~folded0 | folded1
    fold_pnl0 = jnp.where(fold_winner0, spent1, -spent0)
    pnl0 = jnp.where(any_fold, fold_pnl0, show_pnl0).astype(jnp.float32)
    out_ref[:, 0] = pnl0
    out_ref[:, 1] = -pnl0


@functools.partial(jax.jit, static_argnames=("interpret",))
def _strength_pallas(suit_masks: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    n = suit_masks.shape[0]
    pad = (-n) % BLOCK
    x = jnp.pad(suit_masks, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _strength_kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[0],), jnp.int32),
        grid=(x.shape[0] // BLOCK,),
        # default (VMEM) memory space: blocked specs auto-pipeline
        # HBM->VMEM; pltpu.ANY rejects non-trivial index maps on the
        # real Mosaic backend. VERIFIED on the real chip (round 4,
        # logs/settle_r4b.log): both kernels compile and run under
        # Mosaic after the i1-bitcast fix in _strength_from_suits.
        in_specs=[pl.BlockSpec((BLOCK, 4), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BLOCK,), lambda i: (i,)),
        interpret=interpret,
    )(x)
    return out[:n]


def strength_pallas(suit_masks: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] int32 per-suit rank masks → [N] packed strength codes.

    Compiles to Mosaic on TPU; interpreter mode on CPU test backends.
    """
    # interpret only on the CPU test backend — the remote-TPU platform
    # registers as "axon", which must take the real Mosaic path
    interpret = jax.default_backend() == "cpu"
    return _strength_pallas(suit_masks, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _settle_pallas(cards, spent, folded, interpret: bool):
    n = cards.shape[0]
    pad = (-n) % BLOCK
    cards = jnp.pad(cards, ((0, pad), (0, 0)), constant_values=-1)
    spent = jnp.pad(spent, ((0, pad), (0, 0)))
    folded = jnp.pad(folded, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _settle_kernel,
        out_shape=jax.ShapeDtypeStruct((cards.shape[0], 2), jnp.float32),
        grid=(cards.shape[0] // BLOCK,),
        # default (VMEM) space — see _strength_pallas note
        in_specs=[
            pl.BlockSpec((BLOCK, 14), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK, 2), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK, 2), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK, 2), lambda i: (i, 0)),
        interpret=interpret,
    )(cards, spent, folded)
    return out[:n]


def settle_pallas(state) -> jnp.ndarray:
    """Fused terminal settlement for a kicker.game.TableState batch:
    bit-identical to ``kicker.game.settle`` (tested), with the suit-mask
    build, both seats' strength cascades, the comparison, and the
    side-pot PnL in ONE kernel — no [B, 2] strength codes or [B, 2, 4]
    masks ever round-trip HBM."""
    from ..kicker.game import FOLDING

    B = state.board.shape[0]
    cards = jnp.concatenate(
        [
            jnp.concatenate(
                [state.hole[:, seat].astype(jnp.int32),
                 state.board.astype(jnp.int32)], axis=1)
            for seat in (0, 1)
        ], axis=1,
    )  # [B, 14] = seat0 7 cards ++ seat1 7 cards
    folded = (state.status == FOLDING).astype(jnp.int32)
    interpret = jax.default_backend() == "cpu"
    return _settle_pallas(cards, state.spent.astype(jnp.int32), folded,
                          interpret)
