"""Validation games: RPS, Kuhn, Leduc (ref: crates/{roshambo,kuhn,leduc})."""

from .kuhn import Kuhn
from .leduc import Leduc
from .rps import Rps

__all__ = ["Kuhn", "Leduc", "Rps"]
