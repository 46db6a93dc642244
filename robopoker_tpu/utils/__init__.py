"""Cross-cutting utilities: interrupts, checkpoints, metrics."""

from . import checkpoint, interrupt, metrics
from .checkpoint import load_table, save_table
from .metrics import Metrics

__all__ = ["checkpoint", "interrupt", "metrics", "load_table", "save_table", "Metrics"]
