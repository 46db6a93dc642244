"""Multi-chip training-step correctness on the virtual CPU mesh.

The contract (SURVEY §2.5 P3): the InfoTable is replicated; per-device
tree shards produce deltas that psum into one identical update applied
by every replica. Two properties pin it:

1. mesh-of-1 ≡ plain single-device step (bit-equal tables given the
   same derived RNG key) — validates the shard_map plumbing;
2. after several 8-way sharded steps, every device's table replica is
   bit-identical — validates the delta psum + all-gathered row subset
   (this is exactly the invariant an apply-only-my-rows bug breaks).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robopoker_tpu.mccfr import LINEAR_REGRET, LINEAR_WEIGHT, EXTERNAL_SAMPLING
from robopoker_tpu.nlhe import TrainerConfig, init_table, make_nlhe_step, proxy_bucket
from robopoker_tpu.parallel import make_mesh, make_sharded_nlhe_step

CFG = TrainerConfig(batch=4, work_cap=512, cap=128, max_levels=3,
                    roll_steps=3, tail_steps=6, table_log2=12)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_mesh_of_one_matches_plain_step():
    mesh = make_mesh(1)
    sharded = make_sharded_nlhe_step(
        proxy_bucket, LINEAR_REGRET, LINEAR_WEIGHT, EXTERNAL_SAMPLING,
        mesh, CFG,
    )
    plain = make_nlhe_step(
        proxy_bucket, LINEAR_REGRET, LINEAR_WEIGHT, EXTERNAL_SAMPLING, CFG,
    )
    key = jax.random.PRNGKey(3)
    t1, _ = sharded(init_table(12), key)
    # the shard body folds the device index into the key
    t2, _ = plain(init_table(12), jax.random.fold_in(key, 0))
    assert np.array_equal(np.asarray(t1.regret), np.asarray(t2.regret))
    assert np.array_equal(np.asarray(t1.weight), np.asarray(t2.weight))
    assert np.array_equal(np.asarray(t1.visits), np.asarray(t2.visits))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_replicas_stay_identical_across_8_shards():
    mesh = make_mesh(8)
    step = make_sharded_nlhe_step(
        proxy_bucket, LINEAR_REGRET, LINEAR_WEIGHT, EXTERNAL_SAMPLING,
        mesh, CFG,
    )
    table = init_table(12)
    for i in range(3):
        table, m = step(table, jax.random.PRNGKey(7))
    # every device must hold the same replica
    shards = table.regret.addressable_shards
    base = np.asarray(shards[0].data)
    for s in shards[1:]:
        assert np.array_equal(np.asarray(s.data), base)
    vshards = table.visits.addressable_shards
    vbase = np.asarray(vshards[0].data)
    for s in vshards[1:]:
        assert np.array_equal(np.asarray(s.data), vbase)
    # and learning actually happened across shards
    assert (np.abs(base).sum(axis=1) > 0).sum() > 0


# --- mesh-sharded clustering (SURVEY §2.5 P2) ---------------------------------

def test_sharded_assign_matches_single_device():
    import numpy as np
    from robopoker_tpu.lloyd.kmeans import EmdSpec, assign
    from robopoker_tpu.parallel import make_mesh, sharded_assign

    rng = np.random.default_rng(0)
    pts = rng.random((97, 16)).astype(np.float32)  # non-divisible N → pad path
    pts /= pts.sum(1, keepdims=True)
    cents = rng.random((8, 16)).astype(np.float32)
    cents /= cents.sum(1, keepdims=True)
    cost = np.abs(np.arange(16)[:, None] - np.arange(16)[None, :]).astype(
        np.float32) / 16.0

    mesh = make_mesh(8)
    for spec in (EmdSpec("variation"), EmdSpec("sinkhorn", cost=cost)):
        a1 = np.asarray(assign(jnp.asarray(pts), jnp.asarray(cents), spec,
                               chunk=32))
        a8 = np.asarray(sharded_assign(jnp.asarray(pts), jnp.asarray(cents),
                                       spec, mesh, chunk=32))
        assert np.array_equal(a1, a8), spec.kind


def test_sharded_cluster_reproduces_single_device():
    import numpy as np
    from robopoker_tpu.lloyd.kmeans import EmdSpec, cluster
    from robopoker_tpu.parallel import make_mesh, sharded_cluster
    from robopoker_tpu.pokerkit.hyperparams import KmeansHyperParams

    rng = np.random.default_rng(1)
    pts = rng.random((128, 12)).astype(np.float32)
    pts /= pts.sum(1, keepdims=True)
    key = jax.random.PRNGKey(3)
    hp = KmeansHyperParams(iterations=6)
    spec = EmdSpec("variation")

    r1 = cluster(jnp.asarray(pts), 6, spec, key, hp, chunk=64)
    r8 = sharded_cluster(jnp.asarray(pts), 6, spec, key, make_mesh(8), hp,
                         chunk=64)
    assert np.array_equal(r1.assignment, r8.assignment)
    assert np.allclose(r1.centroids, r8.centroids, atol=1e-6)


def test_sharded_table_matches_replicated():
    """Row-sharded learner table (SURVEY §5.8): device d owns rows
    [d*T/D, (d+1)*T/D), reads go through a per-step all_gather, deltas
    psum_scatter to their owner. Must produce the same table as the
    replicated step — with real LookupBucket artifacts threaded."""
    import pathlib

    import numpy as np

    from robopoker_tpu.mccfr import (LINEAR_REGRET, LINEAR_WEIGHT,
                                     PLURIBUS_SAMPLING)
    from robopoker_tpu.nlhe import TrainerConfig, init_table, proxy_bucket
    from robopoker_tpu.parallel import (make_mesh, make_sharded_nlhe_step,
                                        make_sharded_table_step, shard_table)

    art = pathlib.Path(__file__).parent.parent / "artifacts" / "abstraction"
    if art.exists():
        from robopoker_tpu.nlhe.abstraction import LookupBucket

        bucket = LookupBucket.load(art)
    else:
        bucket = proxy_bucket
    mesh = make_mesh(8)
    cfg = TrainerConfig(batch=2, level_cap=16, cap=64, max_levels=2,
                        roll_steps=3, tail_steps=6, table_log2=12)
    rep_step = make_sharded_nlhe_step(bucket, LINEAR_REGRET, LINEAR_WEIGHT,
                                      PLURIBUS_SAMPLING, mesh, cfg)
    sh_step = make_sharded_table_step(bucket, LINEAR_REGRET, LINEAR_WEIGHT,
                                      PLURIBUS_SAMPLING, mesh, cfg)
    t_rep = init_table(12)
    t_sh = shard_table(init_table(12), mesh)
    key = jax.random.PRNGKey(0)
    for i in range(3):
        t_rep, m_rep = rep_step(t_rep, jax.random.fold_in(key, i))
        t_sh, m_sh = sh_step(t_sh, jax.random.fold_in(key, i))
    assert int(m_rep["nodes"]) == int(m_sh["nodes"])
    assert int(m_sh["touched_rows"]) > 0
    for f in ("regret", "weight", "payoff", "visits",
              "key_lo", "key_hi", "bucket", "choices"):
        a = np.asarray(getattr(t_rep, f))
        b = np.asarray(getattr(t_sh, f))
        assert np.allclose(a, b, atol=1e-4), f
