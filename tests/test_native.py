"""Native C++ kernel tests: enumeration, evaluator parity, equity parity."""

import numpy as np
import pytest

from robopoker_tpu import native
from robopoker_tpu.deuce import strength
from robopoker_tpu.deuce.observation import river_equity
from robopoker_tpu.deuce.streets import n_observations

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


def test_observation_totals_match_street_constants():
    # ref: crates/deuce/src/street.rs:70-116
    assert native.n_observations(0) == n_observations(0)
    assert native.n_observations(3) == n_observations(1)
    assert native.n_observations(4) == n_observations(2)
    assert native.n_observations(5) == n_observations(3)
    assert native.n_observations(5) == 2_809_475_760


def test_enumeration_matches_numpy_fallback():
    for n_board, start in [(3, 0), (4, 99_999), (5, 1_234_567_890)]:
        p1, b1 = native.enumerate_observations(start, 64, n_board)
        p2, b2 = native._enumerate_np(start, 64, n_board)
        assert (p1 == p2).all() and (b1 == b2).all()


def test_enumeration_validity():
    p, b = native.enumerate_observations(500_000, 2048, 5)
    cards = np.concatenate([p, b], axis=1)
    assert cards.min() >= 0 and cards.max() < 52
    for row in cards[:256]:
        assert len(set(row.tolist())) == 7  # pockets never collide with board


def test_evaluator_bit_parity_with_device():
    rng = np.random.default_rng(1)
    hands = np.stack([rng.permutation(52)[:7] for _ in range(2000)]).astype(np.int8)
    assert (native.strength_batch(hands) == np.asarray(strength(hands))).all()


def test_equity_parity_with_device():
    rng = np.random.default_rng(2)
    hands = np.stack([rng.permutation(52)[:7] for _ in range(16)]).astype(np.int8)
    ne = native.river_equity_batch(hands[:, :2], hands[:, 2:])
    de = np.asarray(river_equity(
        hands[:, :2].astype(np.int32), hands[:, 2:].astype(np.int32)
    ))
    assert np.abs(ne - de).max() < 1e-6


def test_board_factored_equity_matches_brute_force():
    """rp_river_board_equities (one 1326-strength pass + order-statistics
    counting per board) must reproduce the per-observation brute-force
    equity exactly — it is the exhaustive 123M-iso river sweep kernel."""
    if not native.available():
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    boards = np.stack([rng.permutation(52)[:5] for _ in range(8)]).astype(
        np.int8)
    eq, valid = native.river_board_equities(boards)
    from robopoker_tpu.deuce.observation import ALL_POCKETS

    assert (valid.sum(axis=1) == 1081).all()  # C(47,2) live pockets
    for i in range(len(boards)):
        v = valid[i].astype(bool)
        pk = ALL_POCKETS[v].astype(np.int8)
        bd = np.repeat(boards[i][None], v.sum(), 0)
        ref = native.river_equity_batch(pk, bd)
        assert np.abs(eq[i][v] - ref).max() < 1e-6


def test_enumerate_subsets_colex():
    if not native.available():
        import pytest

        pytest.skip("native library not built")
    from math import comb

    s = native.enumerate_subsets(0, 16, 5)
    # colex order: first subset is {4,3,2,1,0}
    assert sorted(s[0].tolist()) == [0, 1, 2, 3, 4]
    # all distinct, all valid cards
    assert len({tuple(sorted(r)) for r in s.tolist()}) == 16
    assert (s >= 0).all() and (s < 52).all()
    # tail clamps at the total count
    tail = native.enumerate_subsets(comb(52, 5) - 3, 10, 5)
    assert len(tail) == 3
