"""Hand evaluator tests.

Golden cases mirror the reference suite (ref: crates/deuce/src/evaluator.rs:180-358)
plus randomized differential testing against an independent oracle.
"""

import numpy as np
import pytest

from robopoker_tpu.deuce import cards as C
from robopoker_tpu.deuce import evaluator as E

from . import oracle_evaluator as oracle


def ev(s: str):
    cs = C.parse_cards(s)
    pad = np.full(8, -1, dtype=np.int8)
    pad[: len(cs)] = cs
    code = int(np.asarray(E.strength(pad[None, :]))[0])
    return code


def unpack(code):
    return (
        E.ranking_of(code).item(),
        E.primary_of(code).item(),
        E.secondary_of(code).item(),
        E.kicker_ranks(code),
    )


R = C  # rank name shorthand: C.ACE etc.

GOLDEN = [
    # (hand, ranking, primary, secondary, kickers hi→lo)  ref: evaluator.rs tests
    ("As Kh Qd Jc 9s", E.HIGH_CARD, C.ACE, 0, [C.KING, C.QUEEN, C.JACK, C.NINE]),
    ("As Ah Kd Qc Js", E.ONE_PAIR, C.ACE, 0, [C.KING, C.QUEEN, C.JACK]),
    ("As Ah Kd Kc Qs", E.TWO_PAIR, C.ACE, C.KING, [C.QUEEN]),
    ("As Ah Ad Kc Qs", E.THREE_OAK, C.ACE, 0, [C.KING, C.QUEEN]),
    ("Ts Jh Qd Kc As", E.STRAIGHT, C.ACE, 0, []),
    ("As Ks Qs Js 9s", E.FLUSH, C.ACE, 0, []),
    ("2s 2h 2d 3c 3s", E.FULL_HOUSE, C.TWO, C.THREE, []),
    ("As Ah Ad Ac Ks", E.FOUR_OAK, C.ACE, 0, [C.KING]),
    ("Ts Js Qs Ks As", E.STRAIGHT_FLUSH, C.ACE, 0, []),
    ("As 2h 3d 4c 5s", E.STRAIGHT, C.FIVE, 0, []),
    ("As 2s 3s 4s 5s", E.STRAIGHT_FLUSH, C.FIVE, 0, []),
    ("As Ah Kd Kc Qs Jh 9d", E.TWO_PAIR, C.ACE, C.KING, [C.QUEEN]),
    ("4h 6h 7h 8h 9h Ts", E.FLUSH, C.NINE, 0, []),
    ("Kh Ah Ad As Ks Qs Js 9s", E.FULL_HOUSE, C.ACE, C.KING, []),
    ("As Ah Ad Ac Ks Kh Qd", E.FOUR_OAK, C.ACE, 0, [C.KING]),
    ("Ts Js Qs Ks As Ah Ad Ac", E.STRAIGHT_FLUSH, C.ACE, 0, []),
    ("As 2s 3h 4d 5c 6s", E.STRAIGHT, C.SIX, 0, []),
    ("As Ah Kd Kc Qs Qh Jd", E.TWO_PAIR, C.ACE, C.KING, [C.QUEEN]),
    ("As Ah Ad Kc Ks Kh Qd", E.FULL_HOUSE, C.ACE, C.KING, []),
]


@pytest.mark.parametrize("hand,ranking,primary,secondary,kickers", GOLDEN)
def test_golden(hand, ranking, primary, secondary, kickers):
    code = ev(hand)
    got = unpack(code)
    assert got == (ranking, primary, secondary, kickers), f"{hand}: {got}"


def test_category_ordering():
    # standard poker: full house beats flush (documented divergence from the
    # reference's swapped-cfg Ranking enum, ref: ranking.rs:31-43)
    assert ev("2s 2h 2d 3c 3s") > ev("As Ks Qs Js 9s")
    assert ev("As Ks Qs Js 9s") > ev("Ts Jh Qd Kc As")


def test_random_differential_vs_oracle():
    rng = np.random.default_rng(0)
    batch = []
    expected = []
    for _ in range(4000):
        k = int(rng.integers(5, 8))  # 5..7 cards
        hand = rng.choice(52, size=k, replace=False)
        row = np.full(7, -1, dtype=np.int8)
        row[:k] = hand
        batch.append(row)
        expected.append(oracle.packed([int(c) for c in hand]))
    codes = np.asarray(E.strength(np.stack(batch)))
    assert codes.tolist() == expected


def test_pairwise_comparison_consistency():
    # strengths must order identically to the oracle on shared boards
    rng = np.random.default_rng(1)
    for _ in range(300):
        deal = rng.choice(52, size=9, replace=False)
        board, h0, h1 = deal[:5], deal[5:7], deal[7:9]
        a = np.concatenate([board, h0])
        b = np.concatenate([board, h1])
        codes = np.asarray(E.strength(np.stack([a, b]).astype(np.int8)))
        oa = oracle.packed([int(c) for c in a])
        ob = oracle.packed([int(c) for c in b])
        assert (codes[0] > codes[1]) == (oa > ob)
        assert (codes[0] == codes[1]) == (oa == ob)


def test_shortdeck_wheel():
    # ref: evaluator.rs tests_shortdeck
    def evs(s):
        cs = C.parse_cards(s)
        pad = np.full(8, -1, dtype=np.int8)
        pad[: len(cs)] = cs
        return int(np.asarray(E.strength(pad[None, :], shortdeck=True))[0])

    code = evs("6s 7h 8d 9c As")
    assert E.ranking_of(code) == E.STRAIGHT and E.primary_of(code) == C.NINE
    code = evs("As 6s 7s 8s 9s")
    assert E.ranking_of(code) == E.STRAIGHT_FLUSH and E.primary_of(code) == C.NINE
    # shortdeck: flush beats full house
    flush = evs("As Ks Qs Js 9s")
    boat = evs("As Ah Ad Kc Ks")
    assert flush > boat


def test_suit_masks_roundtrip():
    cs = C.parse_cards("As Kh Qd Jc 9s")
    m = C.suit_masks_np(cs[None, :])
    # spades: A,9 ; hearts: K ; diamonds: Q ; clubs: J
    assert m[0, 3] == (1 << C.ACE) | (1 << C.NINE)
    assert m[0, 2] == 1 << C.KING
    assert m[0, 1] == 1 << C.QUEEN
    assert m[0, 0] == 1 << C.JACK
    dev = np.asarray(C.suit_masks(cs[None, :].astype(np.int8)))
    assert (dev == m).all()
