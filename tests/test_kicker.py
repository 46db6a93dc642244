"""Batched NLHE engine tests: differential vs the rules oracle.

Strategy per SURVEY.md §7.2 stage 5: randomized playout differential test
against a transcription of the reference rules (tests/oracle_nlhe.py).
Every step compares turn, legality, amounts, pot/stacks, and terminal
settlement between the array engine and the oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robopoker_tpu.kicker import (
    MENU_PLURIBUS,
    TURN_CHANCE,
    TURN_TERMINAL,
    apply_cols,
    deal_board,
    legal_cols,
    raise_chips,
    root,
    settle,
    to_call,
    to_raise,
    to_shove,
    turn_of,
)
from robopoker_tpu.kicker import edges as E
from robopoker_tpu.pokerkit.constants import B_BLIND, S_BLIND, STACK

from . import oracle_nlhe as O

MENU = jnp.asarray(MENU_PLURIBUS)


def take(state, i):
    """Extract game i of a batch as plain numpy."""
    return jax.tree.map(lambda a: np.asarray(a[i]), state)


def oracle_legal_cols(g: O.Game, depth: int):
    """Oracle-side legality on the 9-column axis."""
    cols = np.zeros(9, dtype=bool)
    if g.turn()[0] != "choice":
        return cols
    cols[E.COL_FOLD] = g.may_fold()
    cols[E.COL_CHECK] = g.may_check()
    cols[E.COL_CALL] = g.may_call()
    cols[E.COL_SHOVE] = g.may_shove()
    menu = MENU_PLURIBUS[g.street(), min(depth, 4)]
    if g.may_raise():
        cols[4:9] = menu != E.EMPTY
    return cols


def oracle_apply_col(g: O.Game, col: int, depth: int):
    if col == E.COL_FOLD:
        return g.apply(("fold",))
    if col == E.COL_CHECK:
        return g.apply(("check",))
    if col == E.COL_CALL:
        return g.apply(("call", g.to_call()))
    if col == E.COL_SHOVE:
        return g.apply(("shove", g.to_shove()))
    code = MENU_PLURIBUS[g.street(), min(depth, 4)][col - 4]
    nominal = int(E.EDGE_FLAT[code] + E.EDGE_NUMER[code] * g.pot // E.EDGE_DENOM[code])
    chips = max(nominal, g.to_raise())
    chips = min(chips, g.to_shove())
    if chips == g.to_shove():
        return g.apply(("shove", chips))
    return g.apply(("raise", chips))


def run_differential(seed, n_games=64, max_steps=64):
    key = jax.random.PRNGKey(seed)
    state = root(key, n_games)
    rng = np.random.default_rng(seed)

    # build oracle mirrors with the engine's dealt holes
    holes = np.asarray(state.hole)
    oracles = [O.Game.root([holes[i, 0], holes[i, 1]]) for i in range(n_games)]
    done = np.zeros(n_games, dtype=bool)
    depth_track = np.zeros(n_games, dtype=int)  # current-street aggression

    for step in range(max_steps):
        t_eng = np.asarray(turn_of(state))
        legal_eng = np.asarray(legal_cols(state, MENU))
        tc = np.asarray(to_call(state))
        tr = np.asarray(to_raise(state))
        ts = np.asarray(to_shove(state))
        from robopoker_tpu.kicker import aggression as agg_fn
        agg_eng = np.asarray(agg_fn(state))

        cols = np.zeros(n_games, dtype=np.int32)
        actives = np.zeros(n_games, dtype=bool)
        for i in range(n_games):
            if done[i]:
                continue
            g = oracles[i]
            t_o = g.turn()
            # --- cross-check turn ---
            if t_o == "terminal":
                assert t_eng[i] == TURN_TERMINAL, (i, step, t_eng[i], g)
                done[i] = True
                # settlement parity
                pnl_eng = np.asarray(settle(state))[i]
                pnl_o = g.settlements()
                assert pnl_eng.tolist() == pnl_o, (i, pnl_eng, pnl_o, g)
                continue
            if t_o == "chance":
                assert t_eng[i] == TURN_CHANCE, (i, step, t_eng[i])
                continue
            assert t_eng[i] == t_o[1], (i, step, t_eng[i], t_o)
            # --- cross-check amounts & legality ---
            assert tc[i] == g.to_call(), (i, tc[i], g.to_call())
            assert ts[i] == g.to_shove()
            assert tr[i] == g.to_raise(), (i, tr[i], g.to_raise())
            assert agg_eng[i] == depth_track[i], (i, agg_eng[i], depth_track[i])
            lo = oracle_legal_cols(g, depth_track[i])
            assert (legal_eng[i] == lo).all(), (i, step, legal_eng[i], lo)
            # --- pick a random legal column ---
            options = np.nonzero(lo)[0]
            cols[i] = rng.choice(options)
            actives[i] = True

        if done.all():
            break

        # engine step: choices
        state2 = apply_cols(state, jnp.asarray(cols), MENU, jnp.asarray(actives))
        # engine step: chance (deal together, then sync boards into oracles)
        ckey = jax.random.fold_in(key, 1000 + step)
        chance_mask = np.asarray(turn_of(state2)) == TURN_CHANCE
        state3 = deal_board(state2, ckey)

        boards = np.asarray(state3.board)
        for i in range(n_games):
            if done[i]:
                continue
            g = oracles[i]
            if actives[i]:
                prev_street = g.street()
                oracles[i] = g = oracle_apply_col(g, int(cols[i]), depth_track[i])
                code = MENU_PLURIBUS[prev_street, min(depth_track[i], 4)][cols[i] - 4] \
                    if cols[i] >= 4 else [E.FOLD, E.CHECK, E.CALL, E.SHOVE][cols[i]]
                if code >= E.SHOVE:
                    depth_track[i] += 1
            if chance_mask[i] and g.turn() == "chance":
                nb = len(g.board)
                nnext = {0: 3, 3: 4, 4: 5}[nb]
                new_cards = [int(c) for c in boards[i, nb:nnext]]
                g.act(("draw", None), cards=new_cards)
                depth_track[i] = 0

        # verify pot/stack sync
        pots = np.asarray(state3.pot)
        stacks = np.asarray(state3.stack)
        for i in range(n_games):
            if done[i]:
                continue
            assert pots[i] == oracles[i].pot, (i, step, pots[i], oracles[i].pot)
            assert stacks[i].tolist() == [s.stack for s in oracles[i].seats]
        state = state3

    assert done.all(), f"{(~done).sum()} games unfinished after {max_steps} steps"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_random_playouts(seed):
    run_differential(seed)


def test_root_state():
    state = root(jax.random.PRNGKey(0), 8)
    assert np.asarray(state.pot).tolist() == [S_BLIND + B_BLIND] * 8
    assert np.asarray(state.stack).tolist() == [[STACK - S_BLIND, STACK - B_BLIND]] * 8
    # dealer (seat 0) posts SB and acts first preflop
    assert np.asarray(turn_of(state)).tolist() == [0] * 8
    # preflop opening menu: fold? no (facing BB: to_call=1 so fold legal),
    # check illegal, call legal, shove legal, opens 2-5bb legal
    lc = np.asarray(legal_cols(state, MENU))[0]
    assert lc.tolist() == [True, False, True, True, True, True, True, True, False]
    # holes are 4 distinct cards per game
    holes = np.asarray(state.hole).reshape(8, 4)
    for row in holes:
        assert len(set(row.tolist())) == 4


def test_open_sizes_snap():
    state = root(jax.random.PRNGKey(0), 4)
    rc = np.asarray(raise_chips(state, MENU))
    # preflop depth 0: opens 2,3,4,5 BB = 4,6,8,10 chips; min raise is
    # to_call(1) + max(marginal(1), BB(2)) = 3 → no snap needed
    assert rc[0].tolist() == [4, 6, 8, 10, 3]  # slot 5 empty→nominal 0→snap to min 3


def test_allin_call_runout_settlement():
    # deterministic all-in line: dealer shoves preflop, BB calls (as shove),
    # board runs out, settlement is side-pot-correct and zero-sum
    state = root(jax.random.PRNGKey(11), 4)
    # dealer shoves (col 3)
    state = apply_cols(state, jnp.full(4, E.COL_SHOVE), MENU, jnp.ones(4, bool))
    assert np.asarray(turn_of(state)).tolist() == [1] * 4
    # BB faces to_call == stack: the call is expressed as Shove
    # (may_call requires covering, ref: game.rs:517-520)
    lc = np.asarray(legal_cols(state, MENU))
    assert lc[:, E.COL_SHOVE].all() and lc[:, E.COL_FOLD].all()
    assert not lc[:, E.COL_CALL].any() and not lc[:, E.COL_CHECK].any()
    state = apply_cols(state, jnp.full(4, E.COL_SHOVE), MENU, jnp.ones(4, bool))
    # both all-in → chance runout to the river
    for i in range(3):
        assert (np.asarray(turn_of(state)) == 2).all()  # TURN_CHANCE
        state = deal_board(state, jax.random.fold_in(jax.random.PRNGKey(12), i))
    assert (np.asarray(turn_of(state)) == 3).all()      # TERMINAL
    assert (np.asarray(state.board) >= 0).all()
    pnl = np.asarray(settle(state))
    assert np.allclose(pnl.sum(axis=1), 0.0)
    # both players committed their full 200 (blind + shove): winner takes
    # 200, or a chopped board pushes
    assert ((np.abs(pnl) == 200) | (pnl == 0)).all()


def test_fold_preflop_settlement():
    state = root(jax.random.PRNGKey(13), 2)
    state = apply_cols(state, jnp.full(2, E.COL_FOLD), MENU, jnp.ones(2, bool))
    assert (np.asarray(turn_of(state)) == 3).all()
    pnl = np.asarray(settle(state))
    # dealer folded the SB: loses 1, BB wins 1
    assert pnl.tolist() == [[-1.0, 1.0]] * 2
