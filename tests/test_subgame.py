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


def test_resolver_pool_solves_many(blueprint):
    """ResolverPool: S simultaneous decisions in one shared budget —
    valid distributions for every witness, preflop delegation intact."""
    from robopoker_tpu.serving.policy import Blueprint, ResolverPool, Witness

    bp = Blueprint(blueprint)
    pool = ResolverPool(
        bp, ResolveConfig(batch=8, level_cap=16, cap=64, max_levels=3,
                          roll_steps=3, table_log2=12),
        budget_s=1.5, use_worlds=False)
    ws = [
        # preflop spot → delegated to the blueprint
        Witness(hero_seat=0, hero_hole=np.array([48, 49]), events=[]),
        # two distinct postflop spots → pooled re-solve
        Witness(hero_seat=0, hero_hole=np.array([48, 35]),
                events=[("col", 2), ("col", 1),
                        ("deal", [45, 20, 8]), ("col", 1)]),
        Witness(hero_seat=0, hero_hole=np.array([30, 31]),
                events=[("col", 2), ("col", 1),
                        ("deal", [10, 21, 40]), ("col", 1)]),
    ]
    outs = pool.solve_many(ws)
    assert outs[0]["delegated"] == "preflop-blueprint"
    assert outs[1]["iterations"] >= 1
    assert outs[1]["iterations"] == outs[2]["iterations"]  # shared budget
    for o in outs:
        p = np.asarray(o["policy"])
        assert p.shape == (9,) and abs(p.sum() - 1.0) < 1e-4
        assert (p >= 0).all()
    # pooled postflop policies differ across distinct spots
    assert not np.allclose(outs[1]["policy"], outs[2]["policy"])


def test_resolve_pool_matches_independent_solves(blueprint):
    """make_resolve_pool is bit-identical to advancing each subgame
    alone with its own key (the session axis is pure batching)."""
    from robopoker_tpu.subgame.solver import make_resolve_pool

    cfg = ResolveConfig(batch=8, level_cap=16, cap=64, max_levels=3,
                        roll_steps=3, table_log2=12)
    stepn = make_resolve_step(proxy_bucket, cfg, multi=True)
    pool = make_resolve_pool(proxy_bucket, cfg)
    S = 3
    heads = [root(jax.random.PRNGKey(10 + s), 1) for s in range(S)]
    probs = np.full((S, 1326), 1 / 1326, np.float32)
    worlds = np.stack([belief_partition(probs[s], 4) for s in range(S)])
    wws = np.stack([world_weights(probs[s], worlds[s], 4) for s in range(S)])
    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(0), s)
                      for s in range(S)])
    stack = lambda parts: jax.tree.map(lambda *a: jnp.stack(a), *parts)
    out = pool(stack([init_table(12) for _ in range(S)]), blueprint,
               stack(heads), jnp.zeros(S, jnp.int32),
               jnp.asarray(probs), jnp.asarray(worlds), jnp.asarray(wws),
               keys, jnp.int32(4))
    for s in range(S):
        solo = stepn(init_table(12), blueprint, heads[s], jnp.int32(0),
                     jnp.asarray(probs[s]), jnp.asarray(worlds[s]),
                     jnp.asarray(wws[s]), keys[s], jnp.int32(4))
        for name in ("regret", "weight", "visits", "key_lo", "key_hi"):
            np.testing.assert_array_equal(
                np.asarray(getattr(solo, name)),
                np.asarray(getattr(out, name)[s]), err_msg=f"{s}:{name}")
