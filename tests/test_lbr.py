"""LBR exploitability lower-bound tests (small configs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robopoker_tpu.deuce.cards import parse_cards
from robopoker_tpu.nlhe import init_table, proxy_bucket
from robopoker_tpu.serving.lbr import _range_equity, lbr_eval


def test_range_equity_nuts_and_air():
    # hero holds the nuts on a complete board: equity ~1 vs any range
    board = parse_cards("Ah Kh Qh 2c 7d")[None, :].astype(np.int32)
    nuts = parse_cards("Jh Th")[None, :].astype(np.int32)
    rng = jnp.ones((1, 1326), jnp.float32)
    wp = _range_equity(jnp.asarray(nuts), jnp.asarray(board), rng,
                       jax.random.PRNGKey(0), 4)
    assert float(wp[0]) > 0.99

    # unpaired air vs a uniform range: well below a coin flip, far
    # below the nuts (a uniform range is mostly junk, so air still
    # beats some of it — exact zero is not expected)
    air = parse_cards("4d 3s")[None, :].astype(np.int32)
    wp2 = _range_equity(jnp.asarray(air), jnp.asarray(board), rng,
                        jax.random.PRNGKey(0), 4)
    assert float(wp2[0]) < 0.45
    assert float(wp2[0]) < float(wp[0])


def test_range_equity_partial_board_runouts():
    # strong pair on the flop: decent but not certain equity
    board = np.concatenate(
        [parse_cards("As Kd 2c"), [-1, -1]]
    )[None, :].astype(np.int32)
    hero = parse_cards("Ac Ad")[None, :].astype(np.int32)
    rng = jnp.ones((1, 1326), jnp.float32)
    wp = _range_equity(jnp.asarray(hero), jnp.asarray(board), rng,
                       jax.random.PRNGKey(1), 16)
    assert 0.7 < float(wp[0]) <= 1.0


def test_lbr_beats_untrained_blueprint():
    table = init_table(14)
    r = lbr_eval(table, proxy_bucket, n_hands=32, batch=16,
                 n_rollouts=8, seed=1, mode="fc")
    assert r["hands"] > 0
    assert r["unfinished"] == 0
    # a uniform-random blueprint loses heavily to LBR
    assert r["lbr_mbb_per_hand"] > 1000


def test_lbr_fcpa_runs():
    """fcpa mode (pot bet + all-in priced by the blueprint's fold
    response) plays full hands and still beats a uniform blueprint.
    NOTE: fc vs fcpa ordering is NOT asserted — against a uniform bot
    the call-down model makes betting high-variance; fcpa's advantage
    shows against trained blueprints."""
    table = init_table(14)
    fcpa = lbr_eval(table, proxy_bucket, n_hands=32, batch=16,
                    n_rollouts=8, seed=1, mode="fcpa")
    assert fcpa["hands"] > 0 and fcpa["unfinished"] == 0
    assert np.isfinite(fcpa["lbr_mbb_per_hand"])
    assert fcpa["lbr_mbb_per_hand"] > 0


def test_lbr_deterministic():
    table = init_table(14)
    a = lbr_eval(table, proxy_bucket, n_hands=16, batch=16,
                 n_rollouts=4, seed=3)
    b = lbr_eval(table, proxy_bucket, n_hands=16, batch=16,
                 n_rollouts=4, seed=3)
    assert a == b
