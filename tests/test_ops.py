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
