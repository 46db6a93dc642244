"""Dense-tree MCCFR engine: jit-compiled step + exploitability.

TPU-native counterpart of the reference's solver core — the fused
regret/EV traversal (``CfrFlow::dfs``, ref: crates/mccfr/src/strategy/
flow.rs:64-118), reach products (flow.rs:128-175), the per-epoch update
application (ref: crates/mccfr/src/solver/solver.rs:96-200), and the
best-response exploitability analysis (ref: crates/mccfr/src/strategy/
nash.rs:30-200).

Where the reference recurses over a pointer tree per sampled rollout, we
run **level-synchronous masked array passes** over the flattened full
tree (see tree.py):

1. regret-match π and exploration q for every infoset at once,
2. draw per-node branch samples (counter RNG keyed by (epoch, infoset,
   tree) mirroring the reference's determinism contract, flow.rs:282-295),
3. one top-down pass → active masks + importance-corrected reaches,
4. one bottom-up pass → node values with the exact recursed_value
   weighting (π at walker, π/q at opponents, pass-through at chance),
5. segment-sum regret/weight/payoff/visit deltas per infoset,
6. apply the per-tree update vectors **sequentially** (fori_loop over
   the batch), reproducing the reference's semantics where a
   discount-style schedule touches a row once per appearance per tree.

Everything is traced once; epochs differ only in array values, so one
``lax.fori_loop`` drives thousands of epochs per device dispatch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..pokerkit.constants import EPSILON
from ..pokerkit.hyperparams import SamplingHyperParams, TrainingHyperParams
from .sampling import PLURIBUS, PRUNABLE, TARGETED, VANILLA, SamplingConfig
from .schedules import RegretSchedule, WeightSchedule
from .tree import CHANCE, TERMINAL, DenseTree


class Profile(NamedTuple):
    """Flat accumulator tables — the reference's ``Encounter`` fields
    (weight, regret, payoff, visits; ref: crates/mccfr/src/solver/
    encounter.rs:22-28) as dense [n_infosets, max_actions] arrays."""

    regret: jnp.ndarray   # f32 [I, A]
    weight: jnp.ndarray   # f32 [I, A]
    payoff: jnp.ndarray   # f32 [I, A]  (Welford running mean of infoset EV)
    visits: jnp.ndarray   # i32 [I, A]
    epoch: jnp.ndarray    # i32 scalar


def init_profile(tree: DenseTree) -> Profile:
    shape = (tree.n_infosets, tree.max_actions)
    return Profile(
        regret=jnp.zeros(shape, jnp.float32),
        weight=jnp.zeros(shape, jnp.float32),
        payoff=jnp.zeros(shape, jnp.float32),
        visits=jnp.zeros(shape, jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )


@dataclasses.dataclass
class _Static:
    """Device-resident constants derived from a DenseTree."""

    kind: jnp.ndarray
    info: jnp.ndarray          # clipped to 0 for safe gathers
    has_info: jnp.ndarray      # bool [n]
    child: jnp.ndarray         # [n, B] clipped to 0
    branch_valid: jnp.ndarray  # [n, B]
    child_terminal: jnp.ndarray
    n_branch: jnp.ndarray
    payoff: jnp.ndarray        # [n, P]
    parent: jnp.ndarray        # clipped to 0
    parent_arm: jnp.ndarray
    levels: list
    legal: jnp.ndarray         # [I, A]
    chance_w: jnp.ndarray      # [n, B] normalized chance distributions
    n_players: int
    max_branch: int
    max_actions: int
    n_nodes: int
    n_infosets: int


def _static(tree: DenseTree) -> _Static:
    valid = tree.child >= 0
    if tree.chance_weight is not None:
        cw = np.where(valid, tree.chance_weight, 0.0).astype(np.float32)
    else:
        cw = valid.astype(np.float32)
    denom = np.maximum(cw.sum(axis=1, keepdims=True), 1e-30)
    cw = cw / denom
    return _Static(
        chance_w=jnp.asarray(cw),
        kind=jnp.asarray(tree.kind),
        info=jnp.asarray(np.maximum(tree.info, 0)),
        has_info=jnp.asarray(tree.info >= 0),
        child=jnp.asarray(np.maximum(tree.child, 0)),
        branch_valid=jnp.asarray(tree.child >= 0),
        child_terminal=jnp.asarray(tree.child_terminal),
        n_branch=jnp.asarray(tree.n_branch),
        payoff=jnp.asarray(tree.payoff),
        parent=jnp.asarray(np.maximum(tree.parent, 0)),
        parent_arm=jnp.asarray(tree.parent_arm),
        levels=[jnp.asarray(l) for l in tree.levels],
        legal=jnp.asarray(tree.legal_mask()),
        n_players=tree.n_players,
        max_branch=tree.max_branch,
        max_actions=tree.max_actions,
        n_nodes=tree.n_nodes,
        n_infosets=tree.n_infosets,
    )


def _pad_to_branch(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Pad [.., max_actions] table gathers out to branch width."""
    extra = width - x.shape[-1]
    if extra <= 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, extra)])


def regret_matching(regret: jnp.ndarray, legal: jnp.ndarray) -> jnp.ndarray:
    """π = max(R, ε) / Σ max(R, ε) over legal actions
    (ref: crates/mccfr/src/strategy/profile.rs:31-52)."""
    r = jnp.where(legal, jnp.maximum(regret, EPSILON), 0.0)
    return jnp.where(legal, r / r.sum(axis=-1, keepdims=True), 0.0)


def averaged(weight: jnp.ndarray, legal: jnp.ndarray) -> jnp.ndarray:
    """σ̄ = max(W, ε) / Σ max(W, ε) (ref: profile.rs:39-45)."""
    w = jnp.where(legal, jnp.maximum(weight, EPSILON), 0.0)
    return jnp.where(legal, w / w.sum(axis=-1, keepdims=True), 0.0)


def exploration(weight: jnp.ndarray, legal: jnp.ndarray,
                hp: SamplingHyperParams) -> jnp.ndarray:
    """Smoothed sampling distribution q (ref: flow.rs:28-60)."""
    w = jnp.where(legal, jnp.maximum(weight, EPSILON), 0.0)
    denom = w.sum(axis=-1, keepdims=True) + hp.smoothing
    sw = jnp.maximum((w / hp.temperature + hp.smoothing) / denom, hp.curiosity)
    sw = jnp.where(legal, sw, 0.0)
    return sw / sw.sum(axis=-1, keepdims=True)


def make_step(
    tree: DenseTree,
    regret_schedule: RegretSchedule,
    weight_schedule: WeightSchedule,
    sampling: SamplingConfig,
    batch_size: int = 1,
    sampling_hp: SamplingHyperParams = SamplingHyperParams(),
    training_hp: TrainingHyperParams = TrainingHyperParams(),
):
    """Build the jitted per-epoch training step.

    Returns ``step(profile, key) -> profile`` advancing one epoch
    (= one batch of ``batch_size`` sampled trees, walker = epoch % P,
    ref: solver.rs:96-108, book.rs:135-146).
    """
    S = _static(tree)
    P = S.n_players

    def per_tree(pi_pad, q_pad, regret_pad, t, walker, key_tree):
        n = S.n_nodes
        node_ids = jnp.arange(n, dtype=jnp.int32)
        # per-node RNG: decision nodes keyed by infoset id (the reference's
        # "same infoset ⇒ same draw within a tree", flow.rs:282-295),
        # chance nodes keyed by node id
        salt = jnp.where(S.kind >= 0, S.info + n, node_ids)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(key_tree, salt)

        # chance: draw from the node's chance distribution (uniform for
        # base games; posterior-weighted in subgame re-solves)
        clogits = jnp.where(S.branch_valid, jnp.log(jnp.maximum(S.chance_w, 1e-30)), -jnp.inf)
        chance_sel = jax.vmap(jax.random.categorical)(keys, clogits)
        # opponent: categorical over exploration q (or the curiosity-
        # floored current policy for TargetedSampling, ref: targeted.rs)
        if sampling.scheme == TARGETED:
            opp_dist = jnp.maximum(pi_pad, sampling_hp.curiosity) * S.branch_valid
        else:
            opp_dist = q_pad
        logits = jnp.where(S.branch_valid, jnp.log(jnp.maximum(opp_dist, EPSILON)), -jnp.inf)
        opp_sel = jax.vmap(jax.random.categorical)(keys, logits)
        sel = jnp.where(S.kind == CHANCE, chance_sel, opp_sel)
        sampled = (jnp.arange(S.max_branch) == sel[:, None]) & S.branch_valid

        is_walker = S.kind == walker
        if sampling.scheme == VANILLA:
            present = S.branch_valid
        else:
            walker_mask = S.branch_valid
            if sampling.prunes:
                above = regret_pad > sampling.threshold
                if sampling.scheme == PLURIBUS:
                    # pluribus never prunes pre-terminal actions
                    above = above | S.child_terminal
                keep = S.branch_valid & above
                keep = jnp.where(keep.any(axis=1, keepdims=True), keep, S.branch_valid)
                if sampling.scheme == PLURIBUS:
                    eu = jax.vmap(jax.random.uniform)(
                        jax.vmap(jax.random.fold_in, (None, 0))(key_tree, salt + 2 * n)
                    )
                    no_prune = (t < sampling.warmup_epochs(batch_size)) | (
                        eu < sampling.explore)
                    walker_mask = jnp.where(no_prune[:, None], S.branch_valid, keep)
                else:  # PRUNABLE: deterministic RBP, no warmup/explore
                    walker_mask = keep
            present = jnp.where(is_walker[:, None], walker_mask, sampled)

        # top-down: active mask and opponent reach (cfactual/sampling)
        active = jnp.zeros(n, bool).at[0].set(True)
        reach = jnp.zeros(n, jnp.float32).at[0].set(1.0)
        for lvl in S.levels[1:]:
            p = S.parent[lvl]
            arm = S.parent_arm[lvl]
            a_ok = active[p] & present[p, arm]
            is_opp_p = (S.kind[p] >= 0) & (S.kind[p] != walker)
            f = jnp.where(
                is_opp_p, pi_pad[p, arm] / jnp.maximum(q_pad[p, arm], EPSILON), 1.0
            )
            active = active.at[lvl].set(a_ok)
            reach = reach.at[lvl].set(reach[p] * f)

        # bottom-up: recursed values (flow.rs:183-220 weighting).
        # q > 0 on every legal branch (curiosity floor); padded columns are
        # 0/0 → guard so inactive lanes stay 0, not NaN.
        ratio = pi_pad / jnp.maximum(q_pad, EPSILON)
        factor = jnp.where(
            (S.kind == CHANCE)[:, None], 1.0,
            jnp.where(is_walker[:, None], pi_pad, ratio),
        )
        value = jnp.zeros(n, jnp.float32)
        pay_w = S.payoff[:, walker]
        for lvl in reversed(S.levels):
            kidv = value[S.child[lvl]]
            agg = (present[lvl] * factor[lvl] * kidv).sum(axis=1)
            v = jnp.where(S.kind[lvl] == TERMINAL, pay_w[lvl], agg)
            value = value.at[lvl].set(v)

        # per-infoset deltas at active walker nodes
        at_w = is_walker & active & S.has_info
        kidval = value[S.child]  # [n, B]
        contrib = jnp.where(
            at_w[:, None] & present, reach[:, None] * (kidval - value[:, None]), 0.0
        )[:, : S.max_actions]
        rdelta = jnp.zeros((S.n_infosets, S.max_actions), jnp.float32)
        rdelta = rdelta.at[S.info].add(contrib)
        touched = jnp.zeros((S.n_infosets, S.max_actions), bool)
        touched = touched.at[S.info].max(
            (at_w[:, None] & present)[:, : S.max_actions]
        )
        occupied = jnp.zeros(S.n_infosets, bool).at[S.info].max(at_w)
        pdelta = jnp.zeros(S.n_infosets, jnp.float32)
        pdelta = pdelta.at[S.info].add(jnp.where(at_w, reach * value, 0.0))
        return rdelta, touched, occupied, pdelta

    regret_min = training_hp.regret_min

    def step(profile: Profile, key: jnp.ndarray) -> Profile:
        t = profile.epoch
        walker = (t % P).astype(jnp.int32)

        pi = regret_matching(profile.regret, S.legal)
        q = exploration(profile.weight, S.legal, sampling_hp)
        pi_node = _pad_to_branch(pi[S.info], S.max_branch)
        q_node = _pad_to_branch(q[S.info], S.max_branch)
        regret_node = _pad_to_branch(profile.regret[S.info], S.max_branch)

        ekey = jax.random.fold_in(key, t)
        tree_keys = jax.vmap(jax.random.fold_in, (None, 0))(
            ekey, jnp.arange(batch_size)
        )
        rdelta, touched, occupied, pdelta = jax.vmap(
            per_tree, in_axes=(None, None, None, None, None, 0)
        )(pi_node, q_node, regret_node, t, walker, tree_keys)

        # apply per-tree update vectors sequentially (solver.rs:96-108:
        # all vectors computed against the pre-step profile, then applied
        # in order — schedules see one touch per appearance per tree)
        def apply(b, tabs):
            regret, weight, payoff, visits = tabs
            tc, oc = touched[b], occupied[b]
            occ_edge = oc[:, None] & S.legal
            regret = jnp.where(
                tc,
                regret_schedule.gain(regret, rdelta[b], t, regret_min),
                regret,
            )
            weight = jnp.where(
                occ_edge, weight_schedule.learn(weight, pi, t), weight
            )
            payoff = jnp.where(
                occ_edge,
                payoff + (pdelta[b][:, None] - payoff) / (visits + 1).astype(jnp.float32),
                payoff,
            )
            visits = visits + occ_edge.astype(jnp.int32)
            return regret, weight, payoff, visits

        regret, weight, payoff, visits = jax.lax.fori_loop(
            0, batch_size, apply,
            (profile.regret, profile.weight, profile.payoff, profile.visits),
        )
        return Profile(regret, weight, payoff, visits, t + 1)

    return jax.jit(step)


def make_solve(step, n_epochs_per_call: int = 1):
    """Wrap a step into a fori_loop driver: one dispatch, many epochs."""

    @jax.jit
    def solve(profile: Profile, key: jnp.ndarray, n: jnp.ndarray) -> Profile:
        def body(_, prof):
            return step(prof, key)

        return jax.lax.fori_loop(0, n, body, profile)

    return solve


def make_exploitability(tree: DenseTree):
    """Best-response exploitability of the averaged strategy.

    Replicates the reference's analysis exactly (ref: nash.rs:30-200):
    per hero infoset, the deviation action is the argmax of
    counterfactual value computed under the averaged strategy everywhere
    else (one-shot deviation, **not** full backward-induction BR — the
    reference's convergence tolerances are calibrated against this
    definition); chance averages uniformly; ties pick the last maximal
    action (Rust ``max_by`` semantics).
    """
    S = _static(tree)
    P = S.n_players

    @jax.jit
    def exploitability(weight: jnp.ndarray) -> jnp.ndarray:
        sigma = averaged(weight, S.legal)
        sig_node = _pad_to_branch(sigma[S.info], S.max_branch)
        n = S.n_nodes

        def best_response(h):
            pay_h = S.payoff[:, h]
            # value under σ̄ everywhere
            value = jnp.zeros(n, jnp.float32)
            for lvl in reversed(S.levels):
                kidv = value[S.child[lvl]]
                wgt = jnp.where(
                    (S.kind[lvl] == CHANCE)[:, None],
                    S.chance_w[lvl],
                    sig_node[lvl],
                )
                agg = (S.branch_valid[lvl] * wgt * kidv).sum(axis=1)
                value = value.at[lvl].set(
                    jnp.where(S.kind[lvl] == TERMINAL, pay_h[lvl], agg)
                )
            # external reach: opponents' σ̄ along the path (chance & hero = 1)
            xreach = jnp.zeros(n, jnp.float32).at[0].set(1.0)
            for lvl in S.levels[1:]:
                p = S.parent[lvl]
                arm = S.parent_arm[lvl]
                is_opp_p = (S.kind[p] >= 0) & (S.kind[p] != h)
                f = jnp.where(is_opp_p, sig_node[p, arm], 1.0)
                xreach = xreach.at[lvl].set(xreach[p] * f)
            # cfv per hero infoset-action; last-max argmax (Rust max_by)
            at_h = (S.kind == h) & S.has_info
            kidv = value[S.child][:, : S.max_actions]
            cfv = jnp.zeros((S.n_infosets, S.max_actions), jnp.float32)
            cfv = cfv.at[S.info].add(
                jnp.where(at_h[:, None], xreach[:, None] * kidv, 0.0)
            )
            cfv = jnp.where(S.legal, cfv, -jnp.inf)
            rev = cfv[:, ::-1]
            br = S.max_actions - 1 - jnp.argmax(rev, axis=1)
            # response value: hero plays br, others σ̄, chance uniform
            value = jnp.zeros(n, jnp.float32)
            br_node = br[S.info]
            for lvl in reversed(S.levels):
                kidv = value[S.child[lvl]]
                wgt = jnp.where(
                    (S.kind[lvl] == CHANCE)[:, None],
                    S.chance_w[lvl],
                    sig_node[lvl],
                )
                avg = (S.branch_valid[lvl] * wgt * kidv).sum(axis=1)
                hero_pick = jnp.take_along_axis(
                    kidv, br_node[lvl][:, None], axis=1
                )[:, 0]
                agg = jnp.where(S.kind[lvl] == h, hero_pick, avg)
                value = value.at[lvl].set(
                    jnp.where(S.kind[lvl] == TERMINAL, pay_h[lvl], agg)
                )
            return value[0]

        total = jnp.float32(0.0)
        for h in range(P):
            total = total + best_response(jnp.int32(h))
        return total / P

    return exploitability
