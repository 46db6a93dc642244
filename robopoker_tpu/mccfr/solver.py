"""High-level MCCFR solver for dense-tree games.

TPU-native counterpart of the reference's ``Solver`` trait + ``mccfr!``
macro surface (ref: crates/mccfr/src/solver/solver.rs:38-350,
strategy/macros.rs:7-151): construct with a game + (regret schedule,
weight schedule, sampling scheme), then ``solve(n_trees)``; query
``exploitability()``, ``averaged_policy``, ``instant_policy``,
``cum_regret`` etc. keyed by the game's infoset keys.

Unlike the reference's one-tree-at-a-time loop, ``solve`` drives the
jitted step through a single ``lax.fori_loop`` dispatch — epochs never
bounce back to Python. ``spend(seconds)`` mirrors the reference's
wall-clock budget loop for real-time re-solving (solver.rs:130-141) by
chunking dispatches.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..pokerkit.hyperparams import SamplingHyperParams, TrainingHyperParams
from . import engine
from .sampling import EXTERNAL_SAMPLING, SamplingConfig
from .schedules import (
    FLOORED_REGRET,
    LINEAR_WEIGHT,
    RegretSchedule,
    WeightSchedule,
)
from .tree import DenseTree, SmallGame, build_tree


class Solver:
    def __init__(
        self,
        game: SmallGame,
        regret_schedule: RegretSchedule = FLOORED_REGRET,
        weight_schedule: WeightSchedule = LINEAR_WEIGHT,
        sampling: SamplingConfig = EXTERNAL_SAMPLING,
        batch_size: int = 1,
        seed: int = 0,
        sampling_hp: SamplingHyperParams = SamplingHyperParams(),
        training_hp: TrainingHyperParams = TrainingHyperParams(),
        tree: DenseTree | None = None,
    ):
        self.game = game
        self.tree = tree if tree is not None else build_tree(game)
        self.batch_size = batch_size
        self.key = jax.random.PRNGKey(seed)
        self.profile = engine.init_profile(self.tree)
        self._step = engine.make_step(
            self.tree, regret_schedule, weight_schedule, sampling,
            batch_size=batch_size, sampling_hp=sampling_hp,
            training_hp=training_hp,
        )
        self._solve = engine.make_solve(self._step)
        self._exploitability = engine.make_exploitability(self.tree)

    # --- training ---------------------------------------------------------

    def step(self) -> None:
        self.profile = self._step(self.profile, self.key)

    def solve(self, n_trees: int) -> "Solver":
        """Run ``n_trees / batch_size`` epochs (solver.rs:111-126)."""
        n_epochs = n_trees // self.batch_size
        self.profile = self._solve(self.profile, self.key, jnp.int32(n_epochs))
        return self

    def spend(self, seconds: float, chunk: int = 256) -> int:
        """Step until the wall-clock budget expires (solver.rs:130-141)."""
        t0 = time.monotonic()
        n = 0
        while time.monotonic() - t0 < seconds:
            self.profile = self._solve(self.profile, self.key, jnp.int32(chunk))
            n += chunk
        jax.block_until_ready(self.profile)
        return n

    # --- queries (keyed by game info keys) --------------------------------

    @property
    def epochs(self) -> int:
        return int(self.profile.epoch)

    def exploitability(self) -> float:
        return float(self._exploitability(self.profile.weight))

    def _row(self, info_key) -> int:
        return self.tree.info_index[info_key]

    def _edge_col(self, info_key, edge) -> int:
        return self.tree.info_edges[self._row(info_key)].index(edge)

    def averaged_policy(self, info_key, edge) -> float:
        sig = np.asarray(engine.averaged(
            self.profile.weight, jnp.asarray(self.tree.legal_mask())
        ))
        return float(sig[self._row(info_key), self._edge_col(info_key, edge)])

    def averaged_distribution(self, info_key) -> dict:
        i = self._row(info_key)
        sig = np.asarray(engine.averaged(
            self.profile.weight, jnp.asarray(self.tree.legal_mask())
        ))[i]
        return {e: float(sig[a]) for a, e in enumerate(self.tree.info_edges[i])}

    def instant_policy(self, info_key, edge) -> float:
        pi = np.asarray(engine.regret_matching(
            self.profile.regret, jnp.asarray(self.tree.legal_mask())
        ))
        return float(pi[self._row(info_key), self._edge_col(info_key, edge)])

    def cum_regret(self, info_key, edge) -> float:
        r = np.asarray(self.profile.regret)
        return float(r[self._row(info_key), self._edge_col(info_key, edge)])

    def cum_weight(self, info_key, edge) -> float:
        w = np.asarray(self.profile.weight)
        return float(w[self._row(info_key), self._edge_col(info_key, edge)])

    def sum_regret(self) -> float:
        """Σ positive regrets / epochs (ref: profile.rs sum_regret)."""
        r = np.asarray(self.profile.regret)
        return float(np.maximum(r, 0.0).sum() / max(self.epochs, 1))
