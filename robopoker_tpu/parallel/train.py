"""Multi-chip / multi-host training step.

TPU-native counterpart of the reference's distributed "Slow mode" — N
async workers sharing PostgreSQL as a parameter server with last-write-
wins UPSERTs (ref: crates/forge/src/workers/worker.rs:25-140, pool.rs,
crates/mccfr/src/strategy/async_profile.rs). The TPU redesign (SURVEY
§2.5 P3, §5.8): rollout batches shard over the ``dp`` mesh axis, each
device builds its own walker-node trees against the replicated infoset
table, and the per-epoch regret/weight delta tables are **psum'd over
ICI** before a replicated schedule application — exact synchronous
updates instead of eventual consistency, no database in the loop.

Scaling contract (BASELINE.md): ≥80% env-steps/s scaling at N ≥ 2 hosts;
cross-host the same program runs under ``jax.distributed`` with the dp
axis spanning DCN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mccfr.sampling import SamplingConfig
from ..mccfr.schedules import RegretSchedule, WeightSchedule
from ..nlhe.table import InfoTable
from ..nlhe.trainer import TrainerConfig, make_nlhe_step


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def make_sharded_nlhe_step(
    bucket_fn,
    regret_schedule: RegretSchedule,
    weight_schedule: WeightSchedule,
    sampling: SamplingConfig,
    mesh: Mesh,
    config: TrainerConfig = TrainerConfig(),
    axis: str = "dp",
    **kwargs,
):
    """Jitted data-parallel step over ``mesh``.

    ``config.batch`` is the **per-device** tree count; the global batch is
    ``batch * mesh.size``. The InfoTable is replicated; per-device keys
    are derived inside the shard so no sharded inputs are needed.

    Returns ``step(table, key) -> (table, metrics)``.
    """
    inner = make_nlhe_step(
        bucket_fn, regret_schedule, weight_schedule, sampling,
        config=config, axis_name=axis, **kwargs,
    )

    if getattr(inner, "takes_tables", False):
        # lookup-bucket artifacts thread through shard_map as replicated
        # operands — closing over them would embed the (up to GBs of)
        # tables as HLO constants and blow up the remote compile (the
        # single-chip path learned this as HTTP 413; VERDICT round-1 #4)
        btree = inner.btree

        def shard_body_t(table: InfoTable, key: jnp.ndarray, bt):
            me = jax.lax.axis_index(axis)
            return inner(table, jax.random.fold_in(key, me), bt)

        sharded = jax.shard_map(
            shard_body_t,
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        jitted = jax.jit(sharded)
        return lambda table, key: jitted(table, key, btree)

    def shard_body(table: InfoTable, key: jnp.ndarray):
        # decorrelate per-device rollouts (same table, different trees)
        me = jax.lax.axis_index(axis)
        return inner(table, jax.random.fold_in(key, me))

    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def table_sharding_spec(axis: str = "dp") -> InfoTable:
    """PartitionSpecs for a row-sharded InfoTable: every per-row array
    splits on the row axis; the epoch scalar replicates."""
    return InfoTable(
        regret=P(axis, None), weight=P(axis, None), payoff=P(axis, None),
        visits=P(axis), key_lo=P(axis), key_hi=P(axis),
        bucket=P(axis), choices=P(axis), epoch=P(),
    )


def make_sharded_table_step(
    bucket_fn,
    regret_schedule: RegretSchedule,
    weight_schedule: WeightSchedule,
    sampling: SamplingConfig,
    mesh: Mesh,
    config: TrainerConfig = TrainerConfig(),
    axis: str = "dp",
    **kwargs,
):
    """Data-parallel step with a ROW-SHARDED learner table (SURVEY §5.8).

    Device d owns table rows [d·T/D, (d+1)·T/D): schedules, key claims
    and the payoff/visit/bucket/choices state live only on the owner.
    Each step all_gathers the four read-path arrays (regret, weight, key
    words) for the rollouts — the ZeRO-style gather-for-compute flow —
    and ``psum_scatter``s the delta table so every owner applies exactly
    its block. Use when the table + abstraction artifacts exceed
    replication headroom (the reference's 3 GB river lookup + 200M-row
    blueprint scenario); the replicated :func:`make_sharded_nlhe_step`
    is faster while everything fits.

    Pass the table through ``shard_table(table, mesh)`` (or any
    equivalent ``jax.device_put`` with :func:`table_sharding_spec`) so
    the arrays are physically distributed.
    """
    inner = make_nlhe_step(
        bucket_fn, regret_schedule, weight_schedule, sampling,
        config=config, axis_name=axis, shard_rows=True, **kwargs,
    )
    tspec = table_sharding_spec(axis)

    if getattr(inner, "takes_tables", False):
        btree = inner.btree

        def shard_body_t(table: InfoTable, key: jnp.ndarray, bt):
            me = jax.lax.axis_index(axis)
            return inner(table, jax.random.fold_in(key, me), bt)

        sharded = jax.shard_map(
            shard_body_t, mesh=mesh,
            in_specs=(tspec, P(), P()), out_specs=(tspec, P()),
            check_vma=False,
        )
        jitted = jax.jit(sharded)
        return lambda table, key: jitted(table, key, btree)

    def shard_body(table: InfoTable, key: jnp.ndarray):
        me = jax.lax.axis_index(axis)
        return inner(table, jax.random.fold_in(key, me))

    sharded = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(tspec, P(), ), out_specs=(tspec, P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_table(table: InfoTable, mesh: Mesh, axis: str = "dp") -> InfoTable:
    """Physically distribute an InfoTable row-wise over the mesh."""
    spec = table_sharding_spec(axis)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        table, spec,
    )
