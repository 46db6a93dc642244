"""Batched heads-up NLHE state machine.

TPU-native counterpart of the reference's ``GameN<2>``
(ref: crates/kicker/src/game.rs:30-718). The reference steps one ``Copy``
struct at a time; here **thousands of tables step in lockstep** as a
struct-of-arrays under ``jit`` — every method is a pure, branch-free
array transform with per-game masks, which is what lets MCCFR rollouts
run as one fused XLA program (the SURVEY §7 / BASELINE north-star
design).

Semantics are mirrored exactly (differential-tested against a
transcription oracle in tests/oracle_nlhe.py):

- seats carry (stack, stake, spent, status) with status
  Betting/Folding/Shoving (ref: kicker/src/seat.rs)
- ``ticker`` actor arithmetic and the is_everyone_touched offset
  (ref: game.rs:448-499)
- to_call / to_raise (marginal-raise max BB rule) / to_shove amounts
  (ref: game.rs:537-607)
- legality predicates may_fold/check/call/raise/shove (game.rs:511-531)
- abstract-edge application with the reference's snap cascade: grid
  raises clamp into [to_raise, to_shove) with overflow becoming a shove
  (game.rs:834-864)
- terminal settlement incl. heads-up side pots (showdown.rs:18-40)

Streets, boards, and hole cards use the deuce card coding; chance nodes
deal uniformly from the live deck via counter RNG.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..deuce.cards import suit_masks
from ..deuce.evaluator import strength_from_masks
from ..pokerkit.constants import B_BLIND, S_BLIND, STACK
from . import edges as E

BETTING, FOLDING, SHOVING = 0, 1, 2
PREF, FLOP, TURN, RIVER = 0, 1, 2, 3

# turn codes
TURN_P0, TURN_P1, TURN_CHANCE, TURN_TERMINAL = 0, 1, 2, 3

MAX_SEQ = 16          # per-hand edge-path capacity (reference packs 12;
                      # we keep headroom and truncate only the packed key)
N_BOARD = 5
STREET_REVEALED = jnp.asarray(np.array([0, 3, 4, 5], dtype=np.int32))


class TableState(NamedTuple):
    """Struct-of-arrays game state; leading axis = batch."""

    hole: jnp.ndarray      # i8 [B, 2, 2]
    board: jnp.ndarray     # i8 [B, 5], -1 = undealt
    street: jnp.ndarray    # i32 [B]
    pot: jnp.ndarray       # i32 [B]
    stack: jnp.ndarray     # i32 [B, 2]
    stake: jnp.ndarray     # i32 [B, 2]  (current street)
    spent: jnp.ndarray     # i32 [B, 2]  (whole hand)
    status: jnp.ndarray    # i32 [B, 2]  BETTING/FOLDING/SHOVING
    ticker: jnp.ndarray    # i32 [B]
    dealer: jnp.ndarray    # i32 [B]
    path: jnp.ndarray      # i32 [B, MAX_SEQ] edge codes, EMPTY pad
    path_len: jnp.ndarray  # i32 [B]
    seq_start: jnp.ndarray  # i32 [B] index in path where current street began


def root(key: jnp.ndarray, batch: int,
         stack: int = STACK, dealer: int = 0) -> TableState:
    """Blinds-posted roots with random holes (ref: game.rs:71-78).

    Heads-up: dealer posts SB and acts first preflop. Direct construction
    replicates ``act(posts()); act(posts())``: ticker lands on 2.
    """
    # deal 4 distinct cards per game: random uniforms over 52, take argsort
    u = jax.random.uniform(key, (batch, 52))
    order = jnp.argsort(u, axis=1).astype(jnp.int8)
    hole = order[:, :4].reshape(batch, 2, 2)

    b = batch
    sb_seat = jnp.full(b, dealer, jnp.int32)
    stakes = jnp.zeros((b, 2), jnp.int32)
    stakes = stakes.at[jnp.arange(b), sb_seat].set(S_BLIND)
    stakes = stakes.at[jnp.arange(b), 1 - sb_seat].set(B_BLIND)
    return TableState(
        hole=hole,
        board=jnp.full((b, N_BOARD), -1, jnp.int8),
        street=jnp.zeros(b, jnp.int32),
        pot=jnp.full(b, S_BLIND + B_BLIND, jnp.int32),
        stack=jnp.full((b, 2), stack, jnp.int32) - stakes,
        stake=stakes,
        spent=stakes,
        status=jnp.zeros((b, 2), jnp.int32),
        ticker=jnp.full(b, 2, jnp.int32),
        dealer=jnp.full(b, dealer, jnp.int32),
        path=jnp.zeros((b, MAX_SEQ), jnp.int32),
        path_len=jnp.zeros(b, jnp.int32),
        seq_start=jnp.zeros(b, jnp.int32),
    )


# --- derived quantities ------------------------------------------------------

def actor_idx(s: TableState) -> jnp.ndarray:
    return (s.dealer + s.ticker) % 2


def _gather_seat(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]


def max_stake(s: TableState) -> jnp.ndarray:
    return s.stake.max(axis=1)


def is_everyone_touched(s: TableState) -> jnp.ndarray:
    # heads-up offsets (ref: game.rs:489-493)
    return s.ticker > jnp.where(s.street == PREF, 3, 2)


def is_everyone_matched(s: TableState) -> jnp.ndarray:
    stake = max_stake(s)
    ok = (s.stake == stake[:, None]) | (s.status != BETTING)
    return ok.all(axis=1)


def is_everyone_calling(s: TableState) -> jnp.ndarray:
    return is_everyone_touched(s) & is_everyone_matched(s)


def is_everyone_shoving(s: TableState) -> jnp.ndarray:
    live_not_shoving = (s.status != FOLDING) & (s.status != SHOVING)
    return ~live_not_shoving.any(axis=1)


def is_everyone_folding(s: TableState) -> jnp.ndarray:
    return (s.status != FOLDING).sum(axis=1) == 1


def is_everyone_alright(s: TableState) -> jnp.ndarray:
    return is_everyone_calling(s) | is_everyone_folding(s) | is_everyone_shoving(s)


def turn_of(s: TableState) -> jnp.ndarray:
    """TURN_P0/TURN_P1/TURN_CHANCE/TURN_TERMINAL per game (game.rs:166-174)."""
    stop = jnp.where(
        s.street == RIVER, is_everyone_alright(s), is_everyone_folding(s)
    )
    deal = (s.street != RIVER) & is_everyone_alright(s)
    return jnp.where(stop, TURN_TERMINAL, jnp.where(deal, TURN_CHANCE, actor_idx(s)))


def to_call(s: TableState) -> jnp.ndarray:
    return max_stake(s) - _gather_seat(s.stake, actor_idx(s))


def to_shove(s: TableState) -> jnp.ndarray:
    return _gather_seat(s.stack, actor_idx(s))


def to_raise(s: TableState) -> jnp.ndarray:
    """Min raise: relative + max(marginal, BB) over non-folded stakes
    (ref: game.rs:556-576)."""
    stakes = jnp.where(s.status == FOLDING, 0, s.stake)  # folded excluded
    most = stakes.max(axis=1)
    nxt = stakes.min(axis=1)
    # heads-up: with a folded seat the fold branch is terminal anyway
    relative = most - _gather_seat(s.stake, actor_idx(s))
    marginal = most - nxt
    return relative + jnp.maximum(marginal, B_BLIND)


def aggression(s: TableState) -> jnp.ndarray:
    """Trailing aggressive edges this street (ref: path.rs:32-38)."""
    idx = jnp.arange(MAX_SEQ)
    in_street = (idx[None, :] >= s.seq_start[:, None]) & (
        idx[None, :] < s.path_len[:, None]
    )
    return (in_street & (s.path >= E.SHOVE)).sum(axis=1)


def legal_cols(s: TableState, menu: jnp.ndarray) -> jnp.ndarray:
    """[B, 9] legality mask over the fixed action axis (game.rs:253-283).

    Columns: Fold, Check, Call, Shove, 5 menu raise slots.
    """
    is_choice = turn_of(s) <= TURN_P1
    tc = to_call(s)
    ts = to_shove(s)
    tr = to_raise(s)
    may_fold = is_choice & (tc > 0)
    may_call = may_fold & (tc < ts)
    may_check = is_choice & (tc == 0)
    may_shove = is_choice & (ts > 0)
    may_raise = is_choice & (tr < ts)
    depth = jnp.minimum(aggression(s), E.N_DEPTH_CELLS - 1)
    slots = menu[s.street, depth]  # [B, 5] edge codes
    out = jnp.stack([may_fold, may_check, may_call, may_shove], axis=1)
    return jnp.concatenate(
        [out, may_raise[:, None] & (slots != E.EMPTY)], axis=1
    )


def raise_chips(s: TableState, menu: jnp.ndarray) -> jnp.ndarray:
    """[B, 5] snapped chip amounts for each menu raise slot.

    Nominal = pot-fraction (or BB-absolute open); snapped into
    [to_raise, to_shove] with overflow = shove (ref: game.rs snap).
    """
    depth = jnp.minimum(aggression(s), E.N_DEPTH_CELLS - 1)
    codes = menu[s.street, depth]  # [B, 5]
    numer = jnp.asarray(E.EDGE_NUMER, jnp.int32)[codes]
    denom = jnp.asarray(E.EDGE_DENOM, jnp.int32)[codes]
    flat = jnp.asarray(E.EDGE_FLAT, jnp.int32)[codes]
    nominal = flat + numer * s.pot[:, None] // denom
    tr = to_raise(s)[:, None]
    ts = to_shove(s)[:, None]
    snapped = jnp.maximum(nominal, tr)       # Raise(x<min) → min raise
    return jnp.minimum(snapped, ts)          # Raise(x≥shove) → shove


def _advance_player(s: TableState) -> TableState:
    """next_player(): advance ticker past non-betting seats unless the
    street/hand is settled (ref: game.rs:448-478)."""
    alright = is_everyone_alright(s)
    t1 = s.ticker + 1
    a1 = (s.dealer + t1) % 2
    s1_betting = _gather_seat(s.status, a1) == BETTING
    new_ticker = jnp.where(s1_betting, t1, s.ticker + 2)
    return s._replace(ticker=jnp.where(alright, s.ticker, new_ticker))


def _push_edge(s: TableState, code: jnp.ndarray, active: jnp.ndarray) -> TableState:
    i = jnp.minimum(s.path_len, MAX_SEQ - 1)
    newpath = s.path.at[jnp.arange(s.path.shape[0]), i].set(
        jnp.where(active, code, s.path[jnp.arange(s.path.shape[0]), i])
    )
    return s._replace(
        path=newpath,
        path_len=jnp.where(active, jnp.minimum(s.path_len + 1, MAX_SEQ), s.path_len),
    )


def apply_cols(s: TableState, col: jnp.ndarray, menu: jnp.ndarray,
               active: jnp.ndarray | None = None) -> TableState:
    """Apply one action column per game (no-op where ``active`` is False
    or the game is not at a choice node).

    col ∈ [0, 9): Fold/Check/Call/Shove/raise-slot. Chips for raise slots
    come pre-snapped from :func:`raise_chips`; a slot whose snapped amount
    equals the stack is a genuine shove (status → SHOVING via stack == 0).
    """
    b = s.pot.shape[0]
    rows = jnp.arange(b)
    if active is None:
        active = jnp.ones(b, bool)
    active = active & (turn_of(s) <= TURN_P1)

    idx = actor_idx(s)
    tc = to_call(s)
    ts = to_shove(s)
    rc = raise_chips(s, menu)  # [B, 5]
    slot = jnp.clip(col - E.COL_RAISE0, 0, E.N_RAISE_SLOTS - 1)
    raise_amt = jnp.take_along_axis(rc, slot[:, None], axis=1)[:, 0]

    chips = jnp.where(
        col == E.COL_CALL, tc,
        jnp.where(col == E.COL_SHOVE, ts,
                  jnp.where(col >= E.COL_RAISE0, raise_amt, 0)),
    )
    chips = jnp.where(active, chips, 0)
    folds = active & (col == E.COL_FOLD)

    pot = s.pot + chips
    stack = s.stack.at[rows, idx].add(-chips)
    stake = s.stake.at[rows, idx].add(chips)
    spent = s.spent.at[rows, idx].add(chips)
    new_status = jnp.where(
        folds, FOLDING,
        jnp.where(active & (stack[rows, idx] == 0) & (chips > 0), SHOVING,
                  s.status[rows, idx]),
    )
    status = s.status.at[rows, idx].set(new_status)
    s2 = s._replace(pot=pot, stack=stack, stake=stake, spent=spent, status=status)

    # edge code for the path: menu code for raise slots, else canonical
    depth = jnp.minimum(aggression(s), E.N_DEPTH_CELLS - 1)
    slot_codes = menu[s.street, depth]
    raise_code = jnp.take_along_axis(slot_codes, slot[:, None], axis=1)[:, 0]
    code = jnp.where(
        col == E.COL_FOLD, E.FOLD,
        jnp.where(col == E.COL_CHECK, E.CHECK,
                  jnp.where(col == E.COL_CALL, E.CALL,
                            jnp.where(col == E.COL_SHOVE, E.SHOVE, raise_code))),
    )
    s2 = _push_edge(s2, code, active)
    s3 = _advance_player(s2)
    # freeze inactive games entirely
    return jax.tree.map(
        lambda new, old: jnp.where(
            active.reshape(active.shape + (1,) * (new.ndim - 1)), new, old
        ),
        s3, s,
    )


def deal_board(s: TableState, key: jnp.ndarray,
               active: jnp.ndarray | None = None) -> TableState:
    """Deal the next street's cards at chance nodes (ref: game.rs reveal).

    Uniform without replacement from the live deck: random keys over all
    52 cards, used cards pushed to +inf, take the smallest.
    """
    b = s.pot.shape[0]
    if active is None:
        active = jnp.ones(b, bool)
    active = active & (turn_of(s) == TURN_CHANCE)

    # mark used cards; undealt board slots (-1) scatter into a spill lane
    used53 = jnp.zeros((b, 53), bool)
    hole_flat = s.hole.reshape(b, 4).astype(jnp.int32)
    used53 = used53.at[jnp.arange(b)[:, None], hole_flat].set(True)
    bidx = jnp.where(s.board >= 0, s.board.astype(jnp.int32), 52)
    used53 = used53.at[jnp.arange(b)[:, None], bidx].set(True)
    used = used53[:, :52]
    u = jax.random.uniform(key, (b, 52))
    u = jnp.where(used, jnp.inf, u)
    # draw ≤3 cards by repeated argmin extraction (a full 52-wide argsort
    # per lane per roll substep dominated the trainer's lane cost)
    draws = []
    for _ in range(3):
        pick = jnp.argmin(u, axis=1)
        draws.append(pick.astype(jnp.int8))
        u = u.at[jnp.arange(b), pick].set(jnp.inf)
    order3 = jnp.stack(draws, axis=1)  # [b, 3] fresh cards in draw order

    n_now = STREET_REVEALED[s.street]
    n_next = STREET_REVEALED[jnp.minimum(s.street + 1, RIVER)]
    pos = jnp.arange(N_BOARD)[None, :]
    fill = (pos >= n_now[:, None]) & (pos < n_next[:, None]) & active[:, None]
    # k-th new board slot takes order3[k - n_now]
    srcidx = jnp.clip(pos - n_now[:, None], 0, 2)
    new_cards = jnp.take_along_axis(order3, srcidx, axis=1)
    board = jnp.where(fill, new_cards, s.board)

    s2 = s._replace(
        board=board,
        street=jnp.where(active, s.street + 1, s.street),
        ticker=jnp.where(active, 0, s.ticker),
        stake=jnp.where(active[:, None], 0, s.stake),
        seq_start=jnp.where(active, jnp.minimum(s.path_len + 1, MAX_SEQ), s.seq_start),
    )
    s2 = _push_edge(s2, jnp.full(b, E.DRAW, jnp.int32), active)
    # ticker=0 then next_player (ref: show() then next_player; with street
    # stakes reset, alright only if shoving/folding)
    s3 = _advance_player(s2)
    return jax.tree.map(
        lambda new, old: jnp.where(
            active.reshape(active.shape + (1,) * (new.ndim - 1)), new, old
        ),
        s3, s,
    )


def settle(s: TableState) -> jnp.ndarray:
    """Per-seat PnL at terminal states [B, 2] (ref: showdown.rs:18-40).

    Heads-up side-pot-correct: winner takes min(spent) matched chips;
    ties push. Fold hands award the pot to the survivor.
    """
    folded = s.status == FOLDING
    any_fold = folded.any(axis=1)
    fold_winner = jnp.argmax((~folded).astype(jnp.int32), axis=1)

    cards = jnp.concatenate(
        [s.hole.astype(jnp.int32), jnp.broadcast_to(
            s.board[:, None, :].astype(jnp.int32), (s.board.shape[0], 2, 5)
        )], axis=2,
    )  # [B, 2, 7]
    codes = strength_from_masks(suit_masks(cards))  # [B, 2]
    win0 = codes[:, 0] > codes[:, 1]
    tie = codes[:, 0] == codes[:, 1]
    matched = jnp.min(s.spent, axis=1)

    show_pnl0 = jnp.where(tie, 0, jnp.where(win0, matched, -matched))
    # fold: survivor wins the loser's entire spend
    loser_spent = jnp.take_along_axis(
        s.spent, (1 - fold_winner)[:, None], axis=1
    )[:, 0]
    fold_pnl_winner = loser_spent
    fold_pnl0 = jnp.where(fold_winner == 0, fold_pnl_winner, -fold_pnl_winner)
    pnl0 = jnp.where(any_fold, fold_pnl0, show_pnl0).astype(jnp.float32)
    return jnp.stack([pnl0, -pnl0], axis=1)


def packed_subgame(s: TableState) -> jnp.ndarray:
    """Pack the current street's edge sequence into one int32 pair [B, 2]
    (the reference's 60-bit Path key, ref: path.rs:22-48)."""
    idx = jnp.arange(MAX_SEQ)
    rel = idx[None, :] - s.seq_start[:, None]
    in_street = (rel >= 0) & (idx[None, :] < s.path_len[:, None]) & (rel < 12)
    codes = jnp.where(in_street, s.path, 0)
    shift = jnp.clip(rel, 0, 11) * 5
    lo = jnp.where(in_street & (shift < 30), codes << shift, 0).sum(axis=1)
    hi = jnp.where(in_street & (shift >= 30), codes << (shift - 30), 0).sum(axis=1)
    return jnp.stack([lo, hi], axis=1)
