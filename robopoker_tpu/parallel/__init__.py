"""Mesh/sharding utilities and the multi-chip training step."""

from .train import make_mesh, make_sharded_nlhe_step

__all__ = ["make_mesh", "make_sharded_nlhe_step"]
