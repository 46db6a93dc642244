"""Dense-tree subgame re-solving tests (Kuhn Nash preservation).

Mirrors the reference's Kuhn/Leduc subgame suites
(ref: crates/kuhn/src/solver.rs:347-518): train a blueprint, re-solve
after a public prefix, and assert the refined strategy preserves the
Nash properties at the subgame's infosets.
"""

import numpy as np
import pytest

from robopoker_tpu.games import Kuhn
from robopoker_tpu.games.kuhn import (
    BET,
    BETTED,
    CALL,
    CHECK,
    CHECKBET,
    CHECKED,
    FOLD,
    JACK,
    KING,
    NASH,
    QUEEN,
)
from robopoker_tpu.mccfr import (
    EXTERNAL_SAMPLING,
    FLOORED_REGRET,
    LINEAR_WEIGHT,
    Solver,
)
from robopoker_tpu.mccfr.subgame import resolve, subgame_tree, warmstart_profile
from robopoker_tpu.mccfr.tree import CHANCE


@pytest.fixture(scope="module")
def blueprint():
    s = Solver(Kuhn(), FLOORED_REGRET, LINEAR_WEIGHT, EXTERNAL_SAMPLING, seed=0)
    s.solve(2 ** 15)
    return s


def test_subgame_tree_structure(blueprint):
    sub = subgame_tree(blueprint.tree, blueprint.profile, [CHECK])
    # the P0 open nodes became single-branch chance nodes
    base = blueprint.tree
    open_nodes = [
        i for i in range(base.n_nodes)
        if base.kind[i] == 0 and base.info[i] >= 0
        and base.info_keys[base.info[i]][0] == ""
    ]
    for i in open_nodes:
        assert sub.kind[i] == CHANCE
        assert sub.n_branch[i] == 1
    # chance weights normalized
    cw = sub.chance_weight
    assert np.all(cw[0][: base.n_branch[0]].sum() == pytest.approx(1.0, abs=1e-5))


def test_subgame_preserves_nash_after_check(blueprint):
    # re-solve the continuation after P0 checks; P1's check-node strategy
    # must stay near the analytic Nash (k=1 bet for K, b=9/31 for J...)
    s = resolve(blueprint, [CHECK], iterations=2 ** 15, seed=1)
    targets = {
        ((CHECKED, KING), BET): 1.0,
        ((CHECKED, JACK), BET): 9 / 31,
        ((CHECKED, QUEEN), BET): 8 / 31,
    }
    for (info, edge), v in targets.items():
        got = s.averaged_policy(info, edge)
        assert abs(got - v) < 0.15, (info, edge, got, v)


def test_subgame_preserves_nash_after_bet(blueprint):
    # after P0 bets: P1's facing-bet responses stay Nash
    s = resolve(blueprint, [BET], iterations=2 ** 15, seed=2)
    targets = {
        ((BETTED, JACK), FOLD): 1.0,
        ((BETTED, KING), CALL): 1.0,
        ((BETTED, QUEEN), CALL): 17 / 31,
    }
    for (info, edge), v in targets.items():
        got = s.averaged_policy(info, edge)
        assert abs(got - v) < 0.15, (info, edge, got, v)


def test_warmstart_scales(blueprint):
    sub = subgame_tree(blueprint.tree, blueprint.profile, [CHECK])
    prof = warmstart_profile(sub, blueprint.profile)
    K = 2.0 ** 14
    w = np.asarray(prof.weight)
    # LinearWeight closed form K(K+1)/2 bounds the seeded weights
    assert w.max() <= K * (K + 1) / 2 + 1
    assert int(prof.visits.sum()) == 0
    assert float(np.abs(np.asarray(prof.payoff)).sum()) == 0.0


def test_subgame_regret_converges(blueprint):
    # ref: leduc subgame sum_regret < 0.5 style bound, scaled to kuhn
    s = resolve(blueprint, [CHECK], iterations=2 ** 14, seed=3)
    assert s.sum_regret() < 2.0
