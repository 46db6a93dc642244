"""Regression guard for the HLO-constant trap.

A jitted program that CLOSES OVER a LookupBucket's device arrays embeds
them as HLO constants: with full artifacts that is gigabytes of program
(round-1: trainer, HTTP 413; round-3/4: resolver + posterior, 3.7 GB
lowered constants that killed every full-artifact chip resolve). Every
factory that touches bucket tables must thread them through jit as
ARGUMENTS (the `_bound` rebind pattern).

This test builds a bucket whose tables are ~4 MB of incompressible
random data, lowers each factory's program, and asserts the lowered
module text stays far below the table size — if someone reintroduces a
closure capture, the constants show up in the StableHLO and the module
balloons past the bound.
"""

import numpy as np
import pytest


def _big_bucket():
    from robopoker_tpu.lloyd.lookup import IsoLookup
    from robopoker_tpu.nlhe.abstraction import LookupBucket

    rng = np.random.default_rng(0)
    cap = 1 << 20  # 3 x 4 MB int32 arrays per street
    def one():
        return IsoLookup(
            key1=rng.integers(1, 2**31 - 1, cap, dtype=np.int32),
            key2=rng.integers(1, 2**31 - 1, cap, dtype=np.int32),
            value=rng.integers(0, 255, cap, dtype=np.int32),
            probes=8, hash_version=2,
        )

    return LookupBucket(flop_lookup=one(), turn_lookup=one())


LIMIT = 2 << 20  # 2 MB of module text vs ~24 MB of table data


def _assert_small(text_len, what):
    assert text_len < LIMIT, (
        f"{what} lowered to {text_len/1e6:.1f} MB of module text — a "
        f"LookupBucket is being captured as HLO constants; thread the "
        f"tables through jit as arguments (rebind pattern)")


def test_resolve_step_threads_tables():
    import jax
    import jax.numpy as jnp

    from robopoker_tpu.nlhe.table import init_table
    from robopoker_tpu.subgame.solver import ResolveConfig, make_resolve_step
    from robopoker_tpu.subgame.posterior import belief_partition, world_weights
    from robopoker_tpu.kicker import game as G

    bucket = _big_bucket()
    cfg = ResolveConfig(batch=4, level_cap=8, cap=32, table_log2=8,
                        frontier_rollouts=2, frontier_roll_steps=2)
    step = make_resolve_step(bucket, cfg)
    assert hasattr(step, "jitted"), "expected the table-threading wrapper"
    local = init_table(cfg.table_log2)
    blueprint = init_table(cfg.table_log2)
    head = jax.tree.map(lambda a: a[:1], G.root(jax.random.PRNGKey(0), 2))
    probs = np.full(1326, 1.0 / 1326, np.float32)
    world = belief_partition(probs)
    ww = world_weights(probs, world)
    lowered = step.jitted.lower(
        local, blueprint, head, jnp.int32(0), jnp.asarray(probs),
        jnp.asarray(world), jnp.asarray(ww), jax.random.PRNGKey(0),
        *step.extra_args)
    _assert_small(len(lowered.as_text()), "make_resolve_step")


def test_posterior_threads_tables():
    import jax
    import jax.numpy as jnp

    from robopoker_tpu.kicker import MENU_PLURIBUS
    from robopoker_tpu.nlhe.table import init_table
    from robopoker_tpu.subgame.posterior import make_posterior_fn

    bucket = _big_bucket()
    post = make_posterior_fn(bucket, MENU_PLURIBUS, seq_len=4)
    assert hasattr(post, "jitted"), "expected the table-threading wrapper"
    table = init_table(8)
    kind = jnp.full(4, 2, jnp.int32)
    col = jnp.zeros(4, jnp.int32)
    cards = jnp.full((4, 3), -1, jnp.int32)
    lowered = post.jitted.lower(
        table, kind, col, cards, jnp.int32(0),
        jnp.asarray(np.array([0, 5], np.int32)), *post.extra_args)
    _assert_small(len(lowered.as_text()), "make_posterior_fn")


def test_nlhe_step_threads_tables():
    import jax

    from robopoker_tpu.mccfr import (LINEAR_REGRET, LINEAR_WEIGHT,
                                     PLURIBUS_SAMPLING)
    from robopoker_tpu.nlhe.table import init_table
    from robopoker_tpu.nlhe.trainer import TrainerConfig, make_nlhe_step

    bucket = _big_bucket()
    cfg = TrainerConfig(batch=2, work_cap=64, cap=32, max_levels=3,
                        roll_steps=2, tail_steps=2, table_log2=8)
    step = make_nlhe_step(bucket, LINEAR_REGRET, LINEAR_WEIGHT,
                          PLURIBUS_SAMPLING, cfg)
    table = init_table(cfg.table_log2)
    lowered = step.jitted.lower(
        table, jax.random.PRNGKey(0), *step.extra_args)
    _assert_small(len(lowered.as_text()), "make_nlhe_step")
