"""HU engine scenario goldens ported from the reference's game tests
(ref: crates/kicker/src/game.rs:963-1460). The randomized oracle
differential (test_kicker.py) covers the rules statistically; these pin
the exact reference expectations — blinds geometry, min-raise ladder,
pot tracking, legality sets, terminal conditions, settlements — as
named cases."""

import numpy as np

import jax
import jax.numpy as jnp

from robopoker_tpu.kicker import (
    MENU_PLURIBUS,
    TURN_CHANCE,
    TURN_TERMINAL,
    apply_cols,
    deal_board,
    legal_cols,
    root,
    settle,
    to_call,
    to_raise,
    to_shove,
    turn_of,
)
from robopoker_tpu.kicker import edges as E
from robopoker_tpu.pokerkit.constants import B_BLIND, S_BLIND, STACK

MENU = jnp.asarray(MENU_PLURIBUS)
KEY = jax.random.PRNGKey(11)


def one(x):
    return np.asarray(x)[0]


def play(*cols, key=KEY, deals="auto"):
    """Single-game driver: apply columns in order, dealing whenever the
    game is at a chance node."""
    s = root(key, 1)
    i = 0
    todo = list(cols)
    for _ in range(48):
        t = int(one(turn_of(s)))
        if t == TURN_TERMINAL:
            break
        if t == TURN_CHANCE:
            s = deal_board(s, jax.random.fold_in(key, 100 + i))
            i += 1
            continue
        if not todo:
            break
        c = todo.pop(0)
        s = apply_cols(s, jnp.asarray([c], jnp.int32), MENU,
                       jnp.asarray([True]))
    return s


def test_root_geometry():
    # ref: game.rs test_root — dealer (seat 0 / SB) acts first; the pot
    # already holds both blinds
    s = root(KEY, 1)
    assert int(one(turn_of(s))) == 0
    assert int(one(s.pot)) == S_BLIND + B_BLIND
    assert int(one(to_call(s))) == B_BLIND - S_BLIND


def test_min_raise_ladder():
    # ref: game.rs min_raise_size — to_raise at root = (2-1) + max(2-1, BB)
    s = root(KEY, 1)
    assert int(one(to_raise(s))) == 3


def test_legal_preflop_options():
    # ref: game.rs legal_preflop_options — facing the BB: fold/call/
    # raise/shove legal, check NOT
    s = root(KEY, 1)
    lg = one(legal_cols(s, MENU))
    assert lg[E.COL_FOLD] and lg[E.COL_CALL] and lg[E.COL_SHOVE]
    assert lg[E.COL_RAISE0:].any()
    assert not lg[E.COL_CHECK]


def test_legal_bb_can_check():
    # ref: game.rs legal_bb_can_check — after a limp the BB may check,
    # need not fold
    s = play(E.COL_CALL)
    assert int(one(turn_of(s))) == 1
    lg = one(legal_cols(s, MENU))
    assert lg[E.COL_CHECK]
    assert not lg[E.COL_FOLD]


def test_legal_flop_options_and_first_actor():
    # ref: game.rs legal_flop_options + flop_actor_both_dealers — the
    # non-dealer acts first postflop; no bet to fold to
    s = play(E.COL_CALL, E.COL_CHECK)
    assert int(one(turn_of(s))) == 1
    lg = one(legal_cols(s, MENU))
    assert lg[E.COL_CHECK]
    assert lg[E.COL_RAISE0:].any()
    assert not lg[E.COL_FOLD]


def test_everyone_folds_pref_settlement():
    # ref: game.rs everyone_folds_pref + stacks_after_fold — dealer open
    # fold: BB collects the SB
    s = play(E.COL_FOLD)
    assert int(one(turn_of(s))) == TURN_TERMINAL
    pnl = one(settle(s))
    assert pnl.tolist() == [-S_BLIND, S_BLIND]


def test_flop_bet_fold_settlement():
    # ref: game.rs everyone_folds_flop + stacks_after_flop_bet_fold —
    # limp, check, flop bet, fold: bettor (BB seat 1) wins dealer's 2
    s = play(E.COL_CALL, E.COL_CHECK, E.COL_RAISE0, E.COL_FOLD)
    assert int(one(turn_of(s))) == TURN_TERMINAL
    pnl = one(settle(s))
    assert pnl.tolist() == [-B_BLIND, B_BLIND]


def test_allin_fold_terminal():
    # ref: game.rs allin_fold — shove-fold is terminal; shover wins the BB
    s = play(E.COL_SHOVE, E.COL_FOLD)
    assert int(one(turn_of(s))) == TURN_TERMINAL
    pnl = one(settle(s))
    assert pnl.tolist() == [B_BLIND, -B_BLIND]


def test_allin_showdown_runout():
    # ref: game.rs allin_showdown — shove/shove runs out the full board
    # and settles the matched stacks (+/-STACK or a push)
    s = play(E.COL_SHOVE, E.COL_SHOVE)
    assert int(one(turn_of(s))) == TURN_TERMINAL
    assert (one(s.board) >= 0).all()
    pnl = one(settle(s))
    assert pnl[0] == -pnl[1]
    assert abs(int(pnl[0])) in (0, STACK)


def test_raise_reraise_keeps_action_open():
    # ref: game.rs raise_reraise — 3-bet comes back to the dealer with
    # chips still owed
    s = play(E.COL_RAISE0, E.COL_RAISE0)
    assert int(one(turn_of(s))) == 0
    assert int(one(to_call(s))) > 0
    lg = one(legal_cols(s, MENU))
    assert lg[E.COL_CALL] or lg[E.COL_SHOVE]


def test_pot_tracking_through_limp():
    # ref: game.rs pot_tracking — pot = 3 at root, 4 after the limp
    s = root(KEY, 1)
    assert int(one(s.pot)) == 3
    s = play(E.COL_CALL)
    assert int(one(s.pot)) == 4


def test_terminal_river_showdown_check_down():
    # ref: game.rs terminal_river_showdown — check it down to the river:
    # terminal with all 5 board cards out, zero-sum settlement
    s = play(*([E.COL_CALL] + [E.COL_CHECK] * 7))
    assert int(one(turn_of(s))) == TURN_TERMINAL
    assert (one(s.board) >= 0).all()
    pnl = one(settle(s))
    assert pnl[0] == -pnl[1]
    assert abs(int(pnl[0])) in (0, B_BLIND)


def test_shove_call_equivalence_when_covered():
    # ref: game.rs allin_showdown comment — facing a shove that covers,
    # the call IS the shove column (tc >= ts); plain call must be
    # illegal or equal-sized
    s = play(E.COL_SHOVE)
    lg = one(legal_cols(s, MENU))
    assert lg[E.COL_SHOVE]
    assert int(one(to_shove(s))) <= int(one(to_call(s)))
