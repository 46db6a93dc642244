"""Production bucket-provider wiring: artifacts → LookupBucket → trainer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robopoker_tpu.lloyd import cluster_turn, sample_observations
from robopoker_tpu.nlhe import init_table, make_nlhe_step, TrainerConfig
from robopoker_tpu.nlhe.abstraction import LookupBucket, proxy_bucket
from robopoker_tpu.nlhe.table import collision_stats
from robopoker_tpu.mccfr import LINEAR_REGRET, LINEAR_WEIGHT, EXTERNAL_SAMPLING
from robopoker_tpu.pokerkit.hyperparams import KmeansHyperParams


def test_lookup_bucket_resolves_trained_points():
    key = jax.random.PRNGKey(0)
    p4, b4 = sample_observations(key, 256, 4, rng_seed=20)
    art = cluster_turn(p4, b4, k=8, key=key, chunk=128,
                       hp=KmeansHyperParams(iterations=4))
    bucket = LookupBucket(turn_lookup=art.lookup)

    from robopoker_tpu.lloyd.pipeline import dedupe_canonical

    pu, bu, h1, h2 = dedupe_canonical(p4, b4)
    street = jnp.full(len(pu), 2, jnp.int32)
    board5 = np.concatenate(
        [bu, np.full((len(bu), 1), -1, np.int32)], axis=1
    )
    got = np.asarray(bucket(jnp.asarray(pu), jnp.asarray(board5), street))
    assert ((got >> 8) == 2).all()
    assert ((got & 0xFF) == art.assignment).all()
    # coverage on the training points is total
    assert bucket.coverage(jnp.asarray(pu), jnp.asarray(board5), 2) == 1.0


def test_lookup_bucket_feeds_trainer():
    key = jax.random.PRNGKey(1)
    p4, b4 = sample_observations(key, 128, 4, rng_seed=21)
    art = cluster_turn(p4, b4, k=4, key=key, chunk=64,
                       hp=KmeansHyperParams(iterations=2))
    bucket = LookupBucket(turn_lookup=art.lookup)
    cfg = TrainerConfig(batch=4, work_cap=256, cap=64, max_levels=3,
                        roll_steps=3, tail_steps=6, table_log2=12)
    step = make_nlhe_step(bucket, LINEAR_REGRET, LINEAR_WEIGHT,
                          EXTERNAL_SAMPLING, cfg)
    table = init_table(12)
    table, m = step(table, jax.random.PRNGKey(2))
    assert int(m["nodes"]) > 0
    assert int(table.epoch) == 1


def test_collision_stats():
    table = init_table(12)
    keys = np.stack([
        np.arange(100, dtype=np.int32) * 7 + 3,
        np.arange(100, dtype=np.int32) * 13 + 5,
    ], axis=1)
    stats = collision_stats(table, keys)
    assert stats["sampled"] == 100
    assert stats["collided"] == 0        # empty table: no live collisions
    assert stats["occupancy"] == 0.0


def test_lookup_bucket_miss_falls_back_to_proxy():
    """Classes outside the artifact resolve to the proxy bucket in a
    disjoint tag range — never to cluster 0, never aliasing trained ids."""
    key = jax.random.PRNGKey(5)
    p4, b4 = sample_observations(key, 64, 4, rng_seed=30)
    art = cluster_turn(p4, b4, k=4, key=key, chunk=64,
                       hp=KmeansHyperParams(iterations=2))
    bucket = LookupBucket(turn_lookup=art.lookup)

    # fresh observations almost surely outside the 64-point artifact
    p_new, b_new = sample_observations(key, 128, 4, rng_seed=31)
    board5 = np.concatenate(
        [b_new, np.full((len(b_new), 1), -1, np.int32)], axis=1
    )
    street = jnp.full(len(p_new), 2, jnp.int32)
    got = np.asarray(bucket(jnp.asarray(p_new), jnp.asarray(board5), street))
    prox = np.asarray(proxy_bucket(jnp.asarray(p_new), jnp.asarray(board5),
                                   street))
    trained = (got >> 8) == 2
    miss = ~trained
    assert miss.any()  # 64-point artifact can't cover fresh samples
    # misses carry proxy identity shifted into the (street+4) tag range
    assert np.array_equal(got[miss], prox[miss] + (4 << 8))
    # trained hits use genuine cluster ids
    if trained.any():
        assert ((got[trained] & 0xFF) < 4).all()
