"""Real-time subgame re-solving: posterior, belief worlds, depth-limited
MCCFR, harvest/blend (ref: crates/subgame)."""

from .posterior import (
    ReplaySeq,
    belief_partition,
    force_deal,
    make_posterior_fn,
    world_weights,
)
from .solver import ResolveConfig, harvest_blend, make_resolve_step

__all__ = [
    "ReplaySeq", "belief_partition", "force_deal", "make_posterior_fn",
    "world_weights", "ResolveConfig", "harvest_blend", "make_resolve_step",
]
