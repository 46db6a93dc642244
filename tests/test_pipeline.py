"""Reduced-scale hierarchical abstraction pipeline test.

Exercises the full reverse-street flow (turn → flop) end-to-end at small
N/K — the same structure as the reference's PreTraining::run
(ref: crates/forge/src/pretraining.rs:21-63), with artifacts flowing
between streets (turn lookup + metric feed the flop Sinkhorn k-means).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robopoker_tpu.lloyd import (
    cluster_flop,
    cluster_turn,
    lookup_device,
    sample_observations,
)
from robopoker_tpu.pokerkit.hyperparams import KmeansHyperParams


@pytest.mark.slow
def test_turn_then_flop_pipeline():
    hp = KmeansHyperParams(iterations=6)
    key = jax.random.PRNGKey(0)

    p4, b4 = sample_observations(key, 512, 4, rng_seed=10)
    turn = cluster_turn(p4, b4, k=8, key=key, chunk=256, hp=hp)
    assert turn.centroids.shape == (8, 101)
    assert turn.metric.shape == (8, 8)
    assert np.allclose(turn.metric, turn.metric.T, atol=1e-5)
    assert np.allclose(np.diag(turn.metric), 0.0, atol=1e-6)
    # lookup resolves training points to their assignment
    from robopoker_tpu.deuce.isomorphism import canonical_key, hash_key
    from robopoker_tpu.lloyd.pipeline import dedupe_canonical

    pu, bu, h1, h2 = dedupe_canonical(p4, b4)
    got = np.asarray(lookup_device(
        turn.lookup, jnp.asarray(h1), jnp.asarray(h2)
    ))
    assert (got == turn.assignment).all()

    p3, b3 = sample_observations(key, 256, 3, rng_seed=11)
    flop = cluster_flop(p3, b3, turn, k=6, key=key, chunk=128, hp=hp)
    assert flop.centroids.shape == (6, 8)
    assert flop.metric.shape == (6, 6)
    # flop metric is a debiased sinkhorn divergence: symmetric-ish, ~0 diag
    assert np.allclose(flop.metric, flop.metric.T, atol=1e-3)
    assert np.abs(np.diag(flop.metric)).max() < 1e-3
    # every flop point got a cluster
    assert (flop.assignment >= 0).all() and (flop.assignment < 6).all()
