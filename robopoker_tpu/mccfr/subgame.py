"""Dense-tree subgame re-solving for the validation games.

TPU-native counterpart of the reference's subgame machinery applied to
Kuhn/Leduc (ref: crates/subgame/src/*, exercised by the Kuhn/Leduc
subgame suites, crates/kuhn/src/solver.rs:347-518): given a trained
blueprint and an observed public prefix, re-solve the continuation with

- **posterior chance re-weighting**: the Bayes-consistent deal posterior
  given the prefix (chance priors × the blueprint's averaged policy at
  every on-prefix decision), installed as the chance root's distribution
  — the dense-tree analog of the reference's world restrict/re-deal
  (subgame/src/world/restrict.rs);
- **forced prefix**: on-prefix decision nodes become single-branch
  chance nodes (no regret accrues above the subgame, exactly the
  reference's "subgame tree starts at the prefix" semantics);
- **warmstart**: the subgame profile seeds from the blueprint with the
  iteration-agnostic transform (weight = σ̄·K(K+1)/2, regret = R·K/T;
  ref: crates/mccfr/src/strategy/profile.rs:96-146).

Infoset ids are shared with the blueprint tree (same key space), so
harvesting the refined policy is a plain row read.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from ..pokerkit.hyperparams import WarmstartHyperParams
from .engine import Profile, averaged, regret_matching
from .tree import CHANCE, TERMINAL, DenseTree


def _prefix_nodes(tree: DenseTree, prefix: list) -> tuple[np.ndarray, np.ndarray]:
    """(on_prefix_decision [n], consumed_count [n]): for each node, how many
    prefix edges its PLAYER-edge history matches; chance edges pass through."""
    consumed = np.full(tree.n_nodes, -1, np.int64)  # -1 = off-prefix
    consumed[0] = 0
    order = np.argsort(tree.depth, kind="stable")
    for i in order:
        if i == 0:
            continue
        p = tree.parent[i]
        c = consumed[p]
        if c < 0:
            continue
        if tree.kind[p] == CHANCE:
            consumed[i] = c
        else:
            if c < len(prefix) and tree.edge_labels[p][tree.parent_arm[i]] == prefix[c]:
                consumed[i] = c + 1
            # else: off the prefix, stays -1
    on_prefix_decision = (
        (tree.kind >= 0) & (consumed >= 0) & (consumed < len(prefix))
    )
    return on_prefix_decision, consumed


def subgame_tree(tree: DenseTree, profile: Profile, prefix: list) -> DenseTree:
    """Restrict a dense tree to the continuation after ``prefix``.

    On-prefix decision nodes become chance nodes whose single live branch
    is the prefix edge, weighted by the blueprint's averaged policy there
    (so sampling and exploitability both follow the Bayes posterior);
    off-prefix siblings are pruned.
    """
    onp, consumed = _prefix_nodes(tree, prefix)
    sigma = np.asarray(averaged(profile.weight, jnp.asarray(tree.legal_mask())))

    kind = tree.kind.copy()
    child = tree.child.copy()
    n_branch = tree.n_branch.copy()
    cw = (
        tree.chance_weight.copy() if tree.chance_weight is not None
        else (tree.child >= 0).astype(np.float32)
    )
    for i in np.nonzero(onp)[0]:
        c = consumed[i]
        arm = tree.edge_labels[i].index(prefix[c])
        kind[i] = CHANCE
        # prune all but the prefix branch
        keep_child = tree.child[i, arm]
        child[i, :] = -1
        child[i, 0] = keep_child
        n_branch[i] = 1
        w = np.zeros(tree.max_branch, np.float32)
        w[0] = max(sigma[tree.info[i], arm], 1e-9)
        cw[i] = w
        # reparent the kept child to arm 0
        # (parent_arm of that child must follow)
    parent_arm = tree.parent_arm.copy()
    for i in np.nonzero(onp)[0]:
        kept = child[i, 0]
        if kept >= 0:
            parent_arm[kept] = 0

    # Bayes posterior over deals: bottom-up prefix mass m[n] = probability
    # of completing the prefix from n under (prior chance × blueprint σ);
    # every chance node's branch weights get reweighted by the mass below,
    # so sampling a deal at the root IS sampling from P(deal | prefix)
    # (the reference's posterior partition + restrict, world/partition.rs).
    m = np.ones(tree.n_nodes, np.float64)
    prior = np.where(tree.child >= 0, cw, 0.0)
    prior = prior / np.maximum(prior.sum(axis=1, keepdims=True), 1e-30)
    order = np.argsort(-tree.depth, kind="stable")
    forced_sigma = np.ones(tree.n_nodes, np.float64)
    for i in np.nonzero(onp)[0]:
        c = consumed[i]
        arm = tree.edge_labels[i].index(prefix[c])
        forced_sigma[i] = max(sigma[tree.info[i], arm], 1e-9)
    for i in order:
        if kind[i] == TERMINAL:
            m[i] = 1.0
        elif onp[i]:  # forced node (single branch)
            m[i] = forced_sigma[i] * m[child[i, 0]]
        elif kind[i] == CHANCE and consumed[i] >= 0 and consumed[i] < len(prefix):
            # chance above/inside the prefix: reweight branches by mass
            mass = np.array([
                prior[i, a] * m[child[i, a]] if child[i, a] >= 0 else 0.0
                for a in range(tree.max_branch)
            ])
            m[i] = mass.sum()
            cw[i] = (mass / max(m[i], 1e-30)).astype(np.float32)
        # nodes past the prefix keep m = 1 (conditioning stops at the
        # subgame boundary)

    # NOTE: pruned subtrees remain in the arrays but become unreachable;
    # the engine never visits them (active mask from the root).
    return dataclasses.replace(
        tree, kind=kind, child=child, n_branch=n_branch,
        parent_arm=parent_arm, chance_weight=cw,
        child_terminal=(np.take(tree.kind, np.maximum(child, 0)) == TERMINAL)
        & (child >= 0),
    )


def warmstart_profile(tree: DenseTree, blueprint: Profile,
                      hp: WarmstartHyperParams = WarmstartHyperParams()) -> Profile:
    """Seed a subgame profile from the blueprint
    (ref: profile.rs:96-146): weight = σ̄·K(K+1)/2, regret = R·K/T,
    payoff/visits reset."""
    K = float(hp.prior_strength)
    legal = jnp.asarray(tree.legal_mask())
    sigma = averaged(blueprint.weight, legal)
    t_bp = jnp.maximum(blueprint.epoch.astype(jnp.float32), 1.0)
    return Profile(
        regret=blueprint.regret * (K / t_bp),
        weight=sigma * (K * (K + 1.0) / 2.0),
        payoff=jnp.zeros_like(blueprint.payoff),
        visits=jnp.zeros_like(blueprint.visits),
        epoch=jnp.zeros((), jnp.int32),
    )


def resolve(solver, prefix: list, iterations: int,
            regret_schedule=None, weight_schedule=None, sampling=None,
            warmstart: bool = True, seed: int = 0):
    """Re-solve the subgame after ``prefix`` against a trained Solver.

    Returns a new Solver over the restricted tree (shared infoset ids),
    configured with the reference's fixed subgame scheme unless
    overridden (ExternalSampling + SummedRegret + LinearWeight,
    ref: crates/subgame/src/solver.rs:24-60).
    """
    from .sampling import EXTERNAL_SAMPLING
    from .schedules import LINEAR_WEIGHT, SUMMED_REGRET
    from .solver import Solver

    sub = subgame_tree(solver.tree, solver.profile, prefix)
    s = Solver(
        solver.game,
        regret_schedule or SUMMED_REGRET,
        weight_schedule or LINEAR_WEIGHT,
        sampling or EXTERNAL_SAMPLING,
        seed=seed,
        tree=sub,
    )
    if warmstart:
        s.profile = warmstart_profile(sub, solver.profile)
    s.solve(iterations)
    return s
