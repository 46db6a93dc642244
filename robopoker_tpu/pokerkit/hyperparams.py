"""Hyperparameter bundles.

TPU-native counterpart of the reference's ``hyperparams!`` process-global
singletons (ref: crates/pokerkit/src/macros.rs:16-33 and the per-crate
``hyperparams/*.rs`` files). We use frozen dataclasses passed explicitly
into solver constructors instead of process globals: jit-compiled programs
close over them as static values, so "set once at startup" becomes "bake
into the compiled step".

Defaults are value-identical to the reference:
- sampling   ref: crates/mccfr/src/hyperparams/sampling.rs:40-50
- training   ref: crates/mccfr/src/hyperparams/training.rs:50-59
- pruning    ref: crates/mccfr/src/hyperparams/pruning.rs:37-60
- warmstart  ref: crates/mccfr/src/hyperparams/warmstart.rs:24-31
- kmeans     ref: crates/lloyd/src/hyperparams/kmeans.rs:17-24
- sinkhorn   ref: crates/lloyd/src/hyperparams/sinkhorn.rs:17-24
- subgame    ref: crates/subgame/src/hyperparams.rs:10-56
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SamplingHyperParams:
    """External-sampling exploration distribution knobs.

    Sampling weight per edge: ``max(curiosity, (w/temperature + smoothing)
    / (sum_w + smoothing))`` normalized over the infoset.
    """

    temperature: float = 1.0   # T — higher → more uniform
    smoothing: float = 2.0     # β — pseudocount toward uniform
    curiosity: float = 0.05    # ε — minimum sampling probability floor


@dataclasses.dataclass(frozen=True)
class TrainingHyperParams:
    log_interval_s: float = 60.0
    flush_interval_s: float = 30.0 * 60.0
    mc_exploitability_samples: int = 1024
    regret_min: float = -4e6   # cumulative-regret floor (allows recovery)


@dataclasses.dataclass(frozen=True)
class PruningHyperParams:
    threshold: float = -3e5    # prune actions with cum regret below this
    explore: float = 0.05      # probability of exploring all branches anyway
    # The reference's 16,384-epoch warmup is 16,384 × 128 trees/epoch
    # (pruning.rs:45-51); our epochs are batch-sized, so the portable
    # quantity is trees — SamplingConfig.warmup_epochs(batch) rescales.
    warmup: int = 16_384       # reference epochs (128 trees each)
    warmup_trees: int = 2_097_152


@dataclasses.dataclass(frozen=True)
class WarmstartHyperParams:
    prior_strength: int = 2 ** 14  # effective LinearWeight iterations K


@dataclasses.dataclass(frozen=True)
class BiasHyperParams:
    """Initial regret seed weights at fresh infosets (warmstart bias,
    ref: crates/kicker/src/bias.rs:49-68). Ratios ~50/25/25 fold/call/
    raise in fold-call-raise spots; shove earns its regret unseeded."""

    folds: float = 100.0
    raise_: float = 10.0   # per sized-raise edge
    shove: float = 0.0
    other: float = 50.0    # check/call

    def column_vector(self, n_cols: int = 9):
        """[n_cols] bias by menu column (fold, check, call, shove,
        raises…) — the column layout of kicker/edges.py."""
        return [self.folds, self.other, self.other, self.shove] + (
            [self.raise_] * (n_cols - 4)
        )


@dataclasses.dataclass(frozen=True)
class KmeansHyperParams:
    iterations: int = 32       # Elkan iterations per street
    drift_threshold: float = 1e-4
    rms_interval: int = 4


@dataclasses.dataclass(frozen=True)
class SinkhornHyperParams:
    temperature: float = 0.025  # entropic regularization ε
    iterations: int = 128       # max potential-update sweeps
    tolerance: float = 5e-4     # L1-delta stopping criterion


@dataclasses.dataclass(frozen=True)
class SubgameHyperParams:
    decision_budget_ms: int = 5_000    # real-time re-solve wall-clock budget
    visit_threshold: int = 2 ** 18     # blend gate: subgame vs blueprint
    rollout_bias: float = 5.0          # continuation bias multiplier
    rollouts: int = 16                 # MC rollouts per frontier payoff cell
