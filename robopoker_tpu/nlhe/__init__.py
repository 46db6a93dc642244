"""Flagship NLHE solver: infoset table, abstraction, blueprint trainer
(ref: crates/{nlhe,forge})."""

from .abstraction import LookupBucket, preflop_class, proxy_bucket
from .table import (InfoTable, N_COLS, collision_stats, init_table,
                    make_key, probe_rows, slot_of)
from .trainer import TrainerConfig, make_nlhe_step

__all__ = [
    "LookupBucket", "preflop_class", "proxy_bucket",
    "InfoTable", "N_COLS", "collision_stats", "init_table", "make_key",
    "probe_rows", "slot_of", "TrainerConfig", "make_nlhe_step",
]
