"""Sampling schemes.

TPU-native counterpart of the reference's ``SamplingScheme`` impls
(ref: crates/mccfr/src/sample/{mod,external,vanilla,pruning,targeted,
pluribus}.rs). In the dense engine a scheme is not a tree-growth policy
but a **branch-mask generator**: given the profile tables and per-node
RNG keys it decides which branches of each node are "present" this epoch.

- EXTERNAL  walker: all; chance: uniform-1; opponent: 1 drawn from the
  exploration distribution q (ref: external.rs:14-62)
- VANILLA   everything present (full-tree traversal; ref: vanilla.rs)
- TARGETED  opponents sampled from the current regret-matched policy
  floored at curiosity, instead of the weight-based q (ref: targeted.rs)
- PRUNABLE  deterministic regret-based pruning at walker nodes, no
  warmup/exploration and no pre-terminal exception (ref: pruning.rs)
- PLURIBUS  warmup epochs → no pruning; 5% explore; never prune
  pre-terminal actions; prune cum_regret ≤ threshold; if all pruned,
  keep all (ref: pluribus.rs:70-101)

The exploration distribution q is the reference's smoothed sampling
weight ``max(ε, (w/τ + β)/(Σw + β))`` normalized per infoset
(ref: crates/mccfr/src/strategy/flow.rs:28-60).
"""

from __future__ import annotations

import dataclasses

EXTERNAL = "external"
VANILLA = "vanilla"
PRUNABLE = "prunable"
PLURIBUS = "pluribus"
TARGETED = "targeted"


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    scheme: str = EXTERNAL
    # pruning knobs (PRUNABLE / PLURIBUS; ref: hyperparams/pruning.rs:37-60)
    threshold: float = -3e5
    explore: float = 0.05
    warmup: int = 16_384

    @property
    def samples_opponents(self) -> bool:
        return self.scheme != VANILLA

    @property
    def prunes(self) -> bool:
        return self.scheme in (PRUNABLE, PLURIBUS)


EXTERNAL_SAMPLING = SamplingConfig(scheme=EXTERNAL)
VANILLA_SAMPLING = SamplingConfig(scheme=VANILLA)
PRUNABLE_SAMPLING = SamplingConfig(scheme=PRUNABLE)
PLURIBUS_SAMPLING = SamplingConfig(scheme=PLURIBUS)
TARGETED_SAMPLING = SamplingConfig(scheme=TARGETED)

SAMPLING_SCHEMES = {
    EXTERNAL: EXTERNAL_SAMPLING,
    VANILLA: VANILLA_SAMPLING,
    PRUNABLE: PRUNABLE_SAMPLING,
    PLURIBUS: PLURIBUS_SAMPLING,
    TARGETED: TARGETED_SAMPLING,
}
