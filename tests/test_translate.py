"""Action translation tests (ref: crates/pokerkit/src/translate/lattice.rs
tests + translation.rs:139-151 Monte-Carlo statistical test)."""

import numpy as np

import jax
import jax.numpy as jnp

from robopoker_tpu.pokerkit.regime import Translation
from robopoker_tpu.pokerkit.translate import (
    harmonic,
    pharmonic_weight,
    phargmax,
    snap,
    translate,
)

ANCH = jnp.asarray([0.25, 0.5, 1.0, 2.0], jnp.float32)


def test_snap_nearest():
    x = jnp.asarray([0.3, 0.6, 1.6, 5.0, 0.01], jnp.float32)
    got = np.asarray(snap(ANCH, x))
    assert got.tolist() == [0, 1, 3, 3, 0]


def test_pharmonic_formula_exact():
    # ref: lattice.rs:274-280
    anchors = jnp.asarray([0.5, 1.0], jnp.float32)
    p = float(pharmonic_weight(anchors, jnp.asarray([0.75]))[0])
    expected = (1.0 - 0.75) * (1.0 + 0.5) / ((1.0 - 0.5) * (1.0 + 0.75))
    assert abs(p - expected) < 1e-6


def test_clamping():
    # outside the lattice: both schemes pin to the boundary anchor
    x = jnp.asarray([0.01, 9.9], jnp.float32)
    assert np.asarray(phargmax(ANCH, x)).tolist() == [0, 3]
    p = np.asarray(pharmonic_weight(ANCH, x))
    assert (p == 1.0).all()


def test_exact_hit_maps_to_anchor():
    x = jnp.asarray([0.5, 2.0], jnp.float32)
    assert np.asarray(phargmax(ANCH, x)).tolist() == [1, 3]


def test_harmonic_statistical():
    # MC frequency of the lower anchor matches the closed form
    # (ref: translation.rs:139-151, 200k trials tol 0.005)
    anchors = jnp.asarray([0.5, 1.0], jnp.float32)
    x = jnp.full((200_000,), 0.75, jnp.float32)
    got = np.asarray(harmonic(anchors, x, jax.random.PRNGKey(0)))
    freq = (got == 0).mean()
    expected = (1.0 - 0.75) * (1.0 + 0.5) / ((1.0 - 0.5) * (1.0 + 0.75))
    assert abs(freq - expected) < 0.005


def test_dispatch():
    x = jnp.asarray([0.6], jnp.float32)
    assert int(translate(ANCH, x, Translation.SNAP)[0]) == 1
    assert int(translate(ANCH, x, Translation.PHARGMAX)[0]) in (1, 2)
    assert int(translate(ANCH, x, Translation.HARMONIC,
                         jax.random.PRNGKey(1))[0]) in (1, 2)
