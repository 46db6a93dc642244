"""Pallas kernel tests: bit-parity with the jnp reference implementations.

On the CPU test backend Pallas runs in interpreter-equivalent lowering;
the same code compiles to Mosaic on the real chip.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from robopoker_tpu.deuce.cards import suit_masks_np
from robopoker_tpu.deuce.evaluator import strength_from_masks
from robopoker_tpu.ops import strength_pallas


def test_strength_pallas_bit_parity():
    rng = np.random.default_rng(0)
    hands = np.stack([rng.permutation(52)[:7] for _ in range(3000)])
    masks = suit_masks_np(hands).astype(np.int32)
    ref = np.asarray(strength_from_masks(jnp.asarray(masks)))
    got = np.asarray(strength_pallas(jnp.asarray(masks)))
    assert (ref == got).all()


def test_strength_pallas_ragged_batch():
    # non-multiple-of-block sizes pad internally
    rng = np.random.default_rng(1)
    hands = np.stack([rng.permutation(52)[:5] for _ in range(77)])
    masks = suit_masks_np(hands).astype(np.int32)
    ref = np.asarray(strength_from_masks(jnp.asarray(masks)))
    got = np.asarray(strength_pallas(jnp.asarray(masks)))
    assert got.shape == (77,)
    assert (ref == got).all()


def test_settle_pallas_bit_parity():
    """Fused settle kernel vs kicker.game.settle on real playout
    terminals (folds, showdowns, all-ins)."""
    import jax

    from robopoker_tpu.kicker import MENU_PLURIBUS, game as G
    from robopoker_tpu.ops import settle_pallas

    MENU = jnp.asarray(MENU_PLURIBUS)
    key = jax.random.PRNGKey(5)
    state = G.root(key, 512)
    rng = np.random.default_rng(7)
    for k in range(24):
        t = np.asarray(G.turn_of(state))
        acting = t <= G.TURN_P1
        legal = np.asarray(G.legal_cols(state, MENU))
        # random legal action per lane (mixes folds/calls/raises/shoves)
        noise = rng.random(legal.shape) * legal
        col = noise.argmax(axis=1).astype(np.int32)
        state = G.apply_cols(state, jnp.asarray(col), MENU,
                             jnp.asarray(acting))
        state = G.deal_board(state, jax.random.fold_in(key, k))
    done = np.asarray(G.turn_of(state)) == G.TURN_TERMINAL
    assert done.sum() > 200  # plenty of terminals of all kinds
    ref = np.asarray(G.settle(state))
    got = np.asarray(settle_pallas(state))
    assert (ref[done] == got[done]).all()
