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


def test_lbr_aivat_correction():
    """AIVAT-corrected LBR: corrected mean finite, variance reduced
    (blueprint-action + chance control variates are zero-mean, so the
    bound's expectation is unchanged). Needs a lightly TRAINED table —
    an untrained table has zero payoff baselines, so every correction
    degenerates to 0 and no reduction is possible."""
    import jax

    from robopoker_tpu.mccfr import (LINEAR_REGRET, LINEAR_WEIGHT,
                                     PLURIBUS_SAMPLING)
    from robopoker_tpu.nlhe import TrainerConfig, make_nlhe_step

    cfg = TrainerConfig(batch=8, level_cap=32, cap=128, max_levels=3,
                        roll_steps=4, tail_steps=8, table_log2=14)
    step = make_nlhe_step(proxy_bucket, LINEAR_REGRET, LINEAR_WEIGHT,
                          PLURIBUS_SAMPLING, cfg)
    table = init_table(14)
    for _ in range(4):
        table, _ = step(table, jax.random.PRNGKey(0))

    res = lbr_eval(table, proxy_bucket, n_hands=192, batch=64,
                   n_rollouts=8, seed=2, mode="fc", aivat=True)
    assert res["hands"] > 150
    assert np.isfinite(res["lbr_mbb_per_hand_aivat"])
    assert res["aivat_reduction"] > 0.0
    # zero-mean corrections: the corrected estimate must agree with the
    # raw one within a few joint standard errors (unbiasedness); whether
    # variance actually SHRINKS depends on baseline (payoff-column)
    # quality — meaningful only for production-trained tables, measured
    # by scripts/aivat_bench.py / the lbr_curve --aivat runs.
    joint = (res["stderr_mbb"] ** 2 + res["stderr_mbb_aivat"] ** 2) ** 0.5
    assert abs(res["lbr_mbb_per_hand_aivat"]
               - res["lbr_mbb_per_hand"]) < 6 * joint
