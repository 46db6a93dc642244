"""Mesh/sharding utilities, multi-chip training and clustering."""

from .cluster import (make_sharded_assign, make_sharded_recompute,
                      sharded_assign, sharded_cluster)
from .train import (make_mesh, make_sharded_nlhe_step,
                    make_sharded_table_step, shard_table,
                    table_sharding_spec)

__all__ = [
    "make_mesh", "make_sharded_nlhe_step", "make_sharded_table_step",
    "shard_table", "table_sharding_spec", "make_sharded_assign",
    "make_sharded_recompute", "sharded_assign", "sharded_cluster",
]
