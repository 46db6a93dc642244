"""End-to-end slumbot client exercise against a protocol-faithful mock
server (VERDICT r4 #6: the client had never been driven through its
full session loop — chip-scale translation both directions, multi-street
action-string replay, winnings accounting — without egress).

ref: crates/spar/src/{session,translate,runtime}.rs
"""

import jax
import numpy as np
import pytest

from .mock_slumbot import SB, BB, STACK, MockSlumbotServer, _Hand
from robopoker_tpu.mccfr import LINEAR_REGRET, LINEAR_WEIGHT, PLURIBUS_SAMPLING
from robopoker_tpu.nlhe.abstraction import proxy_bucket
from robopoker_tpu.nlhe.table import init_table
from robopoker_tpu.nlhe.trainer import TrainerConfig, make_nlhe_step
from robopoker_tpu.serving.policy import Blueprint
from robopoker_tpu.serving.slumbot import Benchmark, Runtime, Session


@pytest.fixture(scope="module")
def blueprint():
    cfg = TrainerConfig(batch=8, level_cap=32, cap=128, max_levels=3,
                        roll_steps=4, tail_steps=8, table_log2=14)
    table = init_table(14)
    step = make_nlhe_step(proxy_bucket, LINEAR_REGRET, LINEAR_WEIGHT,
                          PLURIBUS_SAMPLING, cfg)
    for _ in range(4):
        table, _ = step(table, jax.random.PRNGKey(0))
    return Blueprint(table)


def test_mock_hand_rules_fold_and_showdown():
    # deterministic hand: hero BTN with aces vs deuces, board no help
    h = _Hand(hero_pos=1,
              hero_hole=[50, 51],          # Ac? rank*4+suit: 48..51 aces
              villain_hole=[0, 1],         # deuces
              board=[10, 18, 26, 34, 46])
    # SB (hero) raises to 300, BB calls -> flop
    h.apply("hero", "b300")
    h.apply("villain", "c")
    assert h.street == 1 and h.to_act == "villain"   # BB first postflop
    # check it down
    for tok in ("k", "k", "k", "k", "k", "k"):
        h.apply(h.to_act, tok)
    assert h.over and h.winnings == 300              # aces win villain's 300
    assert h.action_string().startswith("b300c/kk/kk/kk")

    # fold charges the folder's full commitment
    h2 = _Hand(hero_pos=1, hero_hole=[50, 51], villain_hole=[0, 1],
               board=[10, 18, 26, 34, 46])
    h2.apply("hero", "b300")
    h2.apply("villain", "f")
    assert h2.over and h2.winnings == BB


def test_mock_enforces_turn_order_and_legality():
    h = _Hand(hero_pos=1, hero_hole=[50, 51], villain_hole=[0, 1],
              board=[10, 18, 26, 34, 46])
    with pytest.raises(AssertionError):
        h.apply("villain", "k")          # out of turn
    with pytest.raises(AssertionError):
        h.apply("hero", "k")             # SB owes the BB half-blind
    with pytest.raises(AssertionError):
        h.apply("hero", f"b{STACK * 2}")  # over stack


def test_session_full_match_against_mock(blueprint):
    """The real Session + SlumbotAgent loop over complete hands: every
    decision parses/replays the wire action string, off-grid villain
    bets (b137) translate onto the menu, and winnings aggregate."""
    from robopoker_tpu.serving.slumbot import SlumbotAgent

    server = MockSlumbotServer(seed=5)
    session = Session(transport=server,
                      agent=SlumbotAgent(blueprint, use_dirac=True))
    hands = 6
    for _ in range(hands):
        w = session.play_hand()
        assert w is not None and abs(w) <= STACK
    s = session.benchmark.summary()
    assert s["hands"] == hands
    assert np.isfinite(s["bb_per_100"])
    # both seats were played (client_pos alternates like the live API)
    assert server.hand_no == hands
    # zero-sum sanity on the recorded results: each result is a whole
    # number of small blinds (all commitments are blind-multiples here)
    for r in session.benchmark.results_bb:
        assert abs((r * BB) % SB) in (0, SB)  # b137 makes odd pots legal


def test_runtime_multi_session_over_mock(blueprint):
    from robopoker_tpu.serving.slumbot import SlumbotAgent

    sessions = [
        Session(transport=MockSlumbotServer(seed=i),
                agent=SlumbotAgent(blueprint, use_dirac=True))
        for i in range(2)
    ]
    out = Runtime(sessions=sessions, hands_per_session=2).run()
    assert out["session_0"]["hands"] == 2
    assert out["session_1"]["hands"] == 2
