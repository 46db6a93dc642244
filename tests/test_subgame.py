"""Subgame re-solving tests: posterior replay, belief partition, resolve
step, harvest/blend.

Mirrors the reference's subgame test strategy (SURVEY §4.3): posterior
reach behavior, world partition invariants, and a full re-solve smoke
against a (lightly trained) blueprint.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robopoker_tpu.kicker import MENU_PLURIBUS, apply_cols, root, turn_of
from robopoker_tpu.mccfr import LINEAR_REGRET, LINEAR_WEIGHT, PLURIBUS_SAMPLING
from robopoker_tpu.nlhe import TrainerConfig, init_table, make_nlhe_step, proxy_bucket
from robopoker_tpu.subgame import (
    ResolveConfig,
    belief_partition,
    harvest_blend,
    make_posterior_fn,
    make_resolve_step,
    world_weights,
)

MENU = jnp.asarray(MENU_PLURIBUS)


@pytest.fixture(scope="module")
def blueprint():
    cfg = TrainerConfig(batch=8, level_cap=32, cap=128, max_levels=3,
                        roll_steps=4, tail_steps=8, table_log2=14)
    table = init_table(14)
    step = make_nlhe_step(proxy_bucket, LINEAR_REGRET, LINEAR_WEIGHT,
                          PLURIBUS_SAMPLING, cfg)
    for _ in range(4):
        table, _ = step(table, jax.random.PRNGKey(0))
    return table


def test_posterior_uniform_before_villain_acts(blueprint):
    # hero (seat 0) is first to act preflop: villain has revealed nothing,
    # so the posterior over live holes must be uniform
    posterior = make_posterior_fn(proxy_bucket, MENU_PLURIBUS, seq_len=4)
    kind = np.full(4, 2, np.int32)   # all padding
    col = np.zeros(4, np.int32)
    cards = np.full((4, 3), -1, np.int32)
    hero_hole = np.array([48, 49], np.int32)  # AcAd-ish
    probs, live, head = posterior(
        blueprint, jnp.asarray(kind), jnp.asarray(col), jnp.asarray(cards),
        jnp.int32(0), jnp.asarray(hero_hole),
    )
    probs, live = np.asarray(probs), np.asarray(live)
    # C(50,2) = 1225 live holes, uniform
    assert live.sum() == 1225
    assert np.allclose(probs[live], 1.0 / 1225, atol=1e-6)
    assert probs[~live].sum() == 0.0


def test_posterior_shifts_after_villain_action(blueprint):
    # villain (seat 1, BB) responds to hero's open: the posterior now
    # weights holes by the blueprint's policy for the taken action
    posterior = make_posterior_fn(proxy_bucket, MENU_PLURIBUS, seq_len=4)
    # hero (dealer/seat 0) opens 2bb = col 4; villain calls = col 2
    kind = np.array([0, 0, 2, 2], np.int32)
    col = np.array([4, 2, 0, 0], np.int32)
    cards = np.full((4, 3), -1, np.int32)
    hero_hole = np.array([0, 1], np.int32)
    probs, live, head = posterior(
        blueprint, jnp.asarray(kind), jnp.asarray(col), jnp.asarray(cards),
        jnp.int32(0), jnp.asarray(hero_hole),
    )
    probs = np.asarray(probs)
    assert abs(probs.sum() - 1.0) < 1e-5
    # with a (lightly trained) nonuniform blueprint the posterior need not
    # be uniform; it must remain a valid distribution over live holes
    live = np.asarray(live)
    assert probs[~live].max() == 0.0


def test_belief_partition_invariants():
    rng = np.random.default_rng(0)
    probs = rng.random(1326).astype(np.float32) ** 4
    probs[100:] *= 0.01
    probs /= probs.sum()
    world = belief_partition(probs, 4)
    assert world.shape == (1326,)
    assert set(np.unique(world)) <= {0, 1, 2, 3}
    w = world_weights(probs, world, 4)
    # equal-mass quantiles: each world holds ~1/4 of the posterior
    assert np.allclose(w, 0.25, atol=0.05)
    # world 0 contains the highest-reach hole
    assert world[probs.argmax()] == 0


def test_resolve_step_and_blend(blueprint):
    # head: fresh root (hero seat 0 to act preflop)
    head = root(jax.random.PRNGKey(3), 1)
    probs = np.full(1326, 1.0 / 1326, np.float32)
    world = belief_partition(probs, 4)
    ww = world_weights(probs, world, 4)

    cfg = ResolveConfig(batch=16, level_cap=24, cap=96, max_levels=3,
                        roll_steps=3, table_log2=12)
    step = make_resolve_step(proxy_bucket, cfg)
    local = init_table(12)
    for _ in range(3):
        local = step(
            local, blueprint, head, jnp.int32(0), jnp.asarray(probs),
            jnp.asarray(world), jnp.asarray(ww), jax.random.PRNGKey(1),
        )
    assert int(local.epoch) == 3
    assert int((np.abs(np.asarray(local.regret)).sum(axis=1) > 0).sum()) > 0

    pol = harvest_blend(local, blueprint, head, proxy_bucket, 0)
    legal = np.asarray(
        jnp.asarray(MENU_PLURIBUS)[0, 0]  # sanity only
    )
    assert pol.shape == (9,)
    assert abs(pol.sum() - 1.0) < 1e-5
    assert (pol >= 0).all()
    # illegal columns carry no mass (preflop open spot: no check=col1)
    assert pol[1] == 0.0


def test_resolve_with_frontier_picks(blueprint):
    # adapt_full: the L×L biased-continuation pick game at depth frontiers
    head = root(jax.random.PRNGKey(5), 1)
    probs = np.full(1326, 1.0 / 1326, np.float32)
    world = belief_partition(probs, 4)
    ww = world_weights(probs, world, 4)
    cfg = ResolveConfig(batch=8, level_cap=16, cap=64, max_levels=2,
                        roll_steps=3, table_log2=12,
                        frontier_picks=True, frontier_rollouts=2,
                        frontier_roll_steps=10)
    step = make_resolve_step(proxy_bucket, cfg)
    local = init_table(12)
    for _ in range(2):
        local = step(
            local, blueprint, head, jnp.int32(0), jnp.asarray(probs),
            jnp.asarray(world), jnp.asarray(ww), jax.random.PRNGKey(4),
        )
    assert int(local.epoch) == 2
    r = np.asarray(local.regret)
    assert np.isfinite(r).all()
    assert (np.abs(r).sum(axis=1) > 0).sum() > 0
    # pick infosets live on the first 4 columns only: rows whose regret
    # mass sits entirely in cols 0..3 with cols 4+ zero exist
    mass_lo = np.abs(r[:, :4]).sum(axis=1)
    mass_hi = np.abs(r[:, 4:]).sum(axis=1)
    assert ((mass_lo > 0) & (mass_hi == 0)).any()


def test_resolve_multi_step_matches_single(blueprint):
    """Chunked multi-dispatch (multi=True, dynamic trip count) must be
    BIT-IDENTICAL to the same number of single-step dispatches — the
    chunking is a pure dispatch-latency optimization (VERDICT r4 #2)."""
    head = root(jax.random.PRNGKey(3), 1)
    probs = np.full(1326, 1.0 / 1326, np.float32)
    world = belief_partition(probs, 4)
    ww = world_weights(probs, world, 4)
    cfg = ResolveConfig(batch=8, level_cap=16, cap=64, max_levels=3,
                        roll_steps=3, table_log2=12)
    step1 = make_resolve_step(proxy_bucket, cfg)
    stepn = make_resolve_step(proxy_bucket, cfg, multi=True)
    key = jax.random.PRNGKey(7)
    args = (blueprint, head, jnp.int32(0), jnp.asarray(probs),
            jnp.asarray(world), jnp.asarray(ww), key)
    a = init_table(12)
    for _ in range(5):
        a = step1(a, *args)
    b = stepn(init_table(12), *args, jnp.int32(5))
    assert int(b.epoch) == 5
    for name in ("regret", "weight", "payoff", "visits",
                 "key_lo", "key_hi"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name)


def test_fused_harvest_matches_harvest_blend(blueprint):
    """make_harvest_fn (one dispatch / one fetch) reproduces the eager
    harvest_blend policy."""
    from robopoker_tpu.subgame.solver import make_harvest_fn

    head = root(jax.random.PRNGKey(3), 1)
    probs = np.full(1326, 1.0 / 1326, np.float32)
    world = belief_partition(probs, 4)
    ww = world_weights(probs, world, 4)
    cfg = ResolveConfig(batch=16, level_cap=24, cap=96, max_levels=3,
                        roll_steps=3, table_log2=12)
    step = make_resolve_step(proxy_bucket, cfg)
    local = init_table(12)
    for _ in range(3):
        local = step(
            local, blueprint, head, jnp.int32(0), jnp.asarray(probs),
            jnp.asarray(world), jnp.asarray(ww), jax.random.PRNGKey(1))
    eager = harvest_blend(local, blueprint, head, proxy_bucket, 0)
    fused = make_harvest_fn(proxy_bucket)(local, blueprint, head)
    np.testing.assert_allclose(fused, eager, rtol=1e-5, atol=1e-7)
