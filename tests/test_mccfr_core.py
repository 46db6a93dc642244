"""CFR core unit tests: tree building, schedules, regret matching."""

import jax.numpy as jnp
import numpy as np

from robopoker_tpu.games import Kuhn, Leduc, Rps
from robopoker_tpu.mccfr import (
    DISCOUNTED_REGRET,
    FLOORED_REGRET,
    LINEAR_REGRET,
    LINEAR_WEIGHT,
    QUADRATIC_WEIGHT,
    SUMMED_REGRET,
    build_tree,
    regret_matching,
)
from robopoker_tpu.mccfr.tree import CHANCE, TERMINAL
from robopoker_tpu.pokerkit.constants import EPSILON


def test_tree_shapes():
    t = build_tree(Rps())
    # 1 root + 3 P2 nodes + 9 terminals (ref: roshambo/src/game.rs:6-12)
    assert t.n_nodes == 13
    assert t.n_infosets == 2
    k = build_tree(Kuhn())
    # chance root + 6 dealt + 30 deals x 9 betting nodes
    assert k.n_nodes == 1 + 6 + 30 * 9
    # 12 infosets (ref: kuhn/src/solver.rs:88)
    assert k.n_infosets == 12
    l = build_tree(Leduc())
    assert l.n_infosets == 120


def test_tree_invariants():
    for g in (Rps(), Kuhn(), Leduc()):
        t = build_tree(g)
        # BFS levels partition the nodes and parents precede children
        assert sum(len(l) for l in t.levels) == t.n_nodes
        for i in range(1, t.n_nodes):
            assert t.parent[i] < i
            assert t.child[t.parent[i], t.parent_arm[i]] == i
        # terminal nodes have no branches; others have >= 1
        term = t.kind == TERMINAL
        assert (t.n_branch[term] == 0).all()
        assert (t.n_branch[~term] >= 1).all()
        # zero-sum
        assert np.allclose(t.payoff.sum(axis=1), 0.0)
        # decision nodes all carry infos with consistent action counts
        dec = t.kind >= 0
        assert (t.info[dec] >= 0).all()
        assert (t.n_branch[dec] == t.info_n_actions[t.info[dec]]).all()


def test_regret_matching_uniform_at_zero():
    legal = jnp.array([[True, True, True], [True, True, False]])
    r = jnp.zeros((2, 3))
    pi = np.asarray(regret_matching(r, legal))
    assert np.allclose(pi[0], [1 / 3] * 3)
    assert np.allclose(pi[1], [0.5, 0.5, 0.0])


def test_regret_matching_negative_floor():
    # all-negative regrets floor to EPSILON -> uniform (ref: profile.rs:31-37)
    legal = jnp.array([[True, True, True]])
    r = jnp.array([[-5.0, -1.0, -100.0]])
    pi = np.asarray(regret_matching(r, legal))
    assert np.allclose(pi[0], [1 / 3] * 3)
    # mixed: negatives get ~0
    r = jnp.array([[3.0, 1.0, -7.0]])
    pi = np.asarray(regret_matching(r, legal))
    assert np.allclose(pi[0], [0.75, 0.25, 0.0], atol=1e-6)


def test_schedule_formulas():
    # value parity with the reference accumulate() implementations
    assert float(SUMMED_REGRET.accumulate(3.0, 2.0, 7)) == 5.0
    assert float(FLOORED_REGRET.gain(jnp.float32(-3.0), jnp.float32(1.0), 7)) == 0.0
    t = 4
    assert np.isclose(float(LINEAR_REGRET.accumulate(10.0, 2.0, t)), 10.0 * (4 / 5) + 2.0)
    # DCFR positive discount t^1.5/(t^1.5+1)
    x = 4.0 ** 1.5
    assert np.isclose(float(DISCOUNTED_REGRET.accumulate(10.0, 2.0, 4)), 10 * x / (x + 1) + 2)
    xn = 4.0 ** 0.5
    assert np.isclose(float(DISCOUNTED_REGRET.accumulate(-10.0, 2.0, 4)), -10 * xn / (xn + 1) + 2)
    assert np.isclose(float(LINEAR_WEIGHT.accumulate(1.0, 0.5, 6)), 4.0)
    assert np.isclose(float(QUADRATIC_WEIGHT.accumulate(1.0, 0.5, 6)), 19.0)
    # weight floor at EPSILON
    assert float(LINEAR_WEIGHT.learn(jnp.float32(0.0), jnp.float32(0.0), 0)) == EPSILON
