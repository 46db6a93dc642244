"""Batched N-seat NLHE state machine (6-max / full-ring tables).

TPU-native counterpart of the reference's generic ``GameN<P>`` — the
``FunTable = GameN<6>`` and ``NitTable = GameN<10>`` live-play aliases
(ref: crates/kicker/src/game.rs:43-45). The heads-up module
(``kicker.game``) stays the specialized hot path for the trained
``Game = GameN<2>`` configuration; this module is the general-P engine
for live multi-way tables, sharing the path/edge machinery and
differential-tested against both the HU engine (P=2) and the N-seat
rules oracle.

Seat count P is static (baked into array shapes), exactly like the
reference's const generic. Semantics mirrored:

- preblind ticker ``P != 2`` (multiway SB = dealer+1), two blind posts
  through the normal bet machinery (ref: game.rs:59-85)
- ``is_everyone_touched`` offset 1 (HU) / 2 (multiway) on preflop
  (ref: game.rs:489-493)
- generic ``next_player`` skipping folded/all-in seats (game.rs:448-459)
- ``to_raise`` from the top-two non-folded stakes (game.rs:556-575)
- **tiered multi-way settlement**: strongest-tier-first, side pots by
  ascending winner all-in levels, equal split with odd chips to the
  earliest seats (ref: crates/kicker/src/showdown.rs Showdown::settle) —
  vectorized as a bounded P×P masked loop over (tier, level) pairs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..deuce.cards import suit_masks
from ..deuce.evaluator import strength_from_masks
from ..pokerkit.constants import B_BLIND, S_BLIND, STACK
from . import edges as E
from .game import (
    BETTING,
    FOLDING,
    MAX_SEQ,
    N_BOARD,
    PREF,
    RIVER,
    SHOVING,
    STREET_REVEALED,
    TURN_CHANCE,
    TURN_TERMINAL,
    TableState,
    _push_edge,
    aggression,
    packed_subgame,
)

__all__ = [
    "root", "turn_of", "legal_cols", "raise_chips", "apply_cols",
    "deal_board", "settle", "to_call", "to_raise", "to_shove",
    "actor_idx", "aggression", "packed_subgame",
]

_I32_MAX = np.int32(2**31 - 1)


def n_seats(s: TableState) -> int:
    return s.stake.shape[1]


def actor_idx(s: TableState) -> jnp.ndarray:
    return (s.dealer + s.ticker) % n_seats(s)


def _gather_seat(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]


def max_stake(s: TableState) -> jnp.ndarray:
    return s.stake.max(axis=1)


def is_everyone_touched(s: TableState) -> jnp.ndarray:
    P = n_seats(s)
    offset = 1 if P == 2 else 2  # ref: game.rs:490
    return s.ticker > P + jnp.where(s.street == PREF, offset, 0)


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
    """Seat index / TURN_CHANCE / TURN_TERMINAL per game. The two chance/
    terminal codes sit ABOVE every seat index (P and P+1 would collide
    with seats for P>2, so multiway reuses the HU codes only when P=2;
    callers should use :func:`is_choice` / comparisons against
    ``turn_chance(P)``)."""
    P = n_seats(s)
    stop = jnp.where(
        s.street == RIVER, is_everyone_alright(s), is_everyone_folding(s)
    )
    deal = (s.street != RIVER) & is_everyone_alright(s)
    chance, terminal = turn_chance(P), turn_terminal(P)
    return jnp.where(stop, terminal, jnp.where(deal, chance, actor_idx(s)))


def turn_chance(P: int) -> int:
    return TURN_CHANCE if P == 2 else P


def turn_terminal(P: int) -> int:
    return TURN_TERMINAL if P == 2 else P + 1


def is_choice(s: TableState) -> jnp.ndarray:
    return turn_of(s) < n_seats(s)


def to_call(s: TableState) -> jnp.ndarray:
    return max_stake(s) - _gather_seat(s.stake, actor_idx(s))


def to_shove(s: TableState) -> jnp.ndarray:
    return _gather_seat(s.stack, actor_idx(s))


def to_raise(s: TableState) -> jnp.ndarray:
    """Min raise from the top-two non-folded stakes (ref: game.rs:556-575).

    Folded stakes map to 0 — the reference's fold starts from (0, 0), so
    a folded seat can never displace a live stake from the top two, and 0
    is the correct filler when fewer than two live stakes exist.
    """
    stakes = jnp.where(s.status == FOLDING, 0, s.stake)
    top2 = jax.lax.top_k(stakes, 2)[0]
    most, nxt = top2[:, 0], top2[:, 1]
    relative = most - _gather_seat(s.stake, actor_idx(s))
    marginal = most - nxt
    return relative + jnp.maximum(marginal, B_BLIND)


def legal_cols(s: TableState, menu: jnp.ndarray) -> jnp.ndarray:
    """[B, 9] legality mask over the fixed action axis (game.rs:253-283)."""
    choice = is_choice(s)
    tc = to_call(s)
    ts = to_shove(s)
    tr = to_raise(s)
    may_fold = choice & (tc > 0)
    may_call = may_fold & (tc < ts)
    may_check = choice & (tc == 0)
    may_shove = choice & (ts > 0)
    may_raise = choice & (tr < ts)
    depth = jnp.minimum(aggression(s), E.N_DEPTH_CELLS - 1)
    slots = menu[s.street, depth]
    out = jnp.stack([may_fold, may_check, may_call, may_shove], axis=1)
    return jnp.concatenate(
        [out, may_raise[:, None] & (slots != E.EMPTY)], axis=1
    )


def raise_chips(s: TableState, menu: jnp.ndarray) -> jnp.ndarray:
    """[B, 5] snapped chip amounts for each menu raise slot."""
    depth = jnp.minimum(aggression(s), E.N_DEPTH_CELLS - 1)
    codes = menu[s.street, depth]
    numer = jnp.asarray(E.EDGE_NUMER, jnp.int32)[codes]
    denom = jnp.asarray(E.EDGE_DENOM, jnp.int32)[codes]
    flat = jnp.asarray(E.EDGE_FLAT, jnp.int32)[codes]
    nominal = flat + numer * s.pot[:, None] // denom
    tr = to_raise(s)[:, None]
    ts = to_shove(s)[:, None]
    return jnp.minimum(jnp.maximum(nominal, tr), ts)


def _advance_player(s: TableState) -> TableState:
    """Generic next_player: first Betting seat at offset ≥ 1 from the
    ticker, unless the street/hand is settled (ref: game.rs:448-459)."""
    P = n_seats(s)
    alright = is_everyone_alright(s)
    offs = jnp.arange(1, P + 1, dtype=jnp.int32)          # [P]
    cand = (s.dealer[:, None] + s.ticker[:, None] + offs[None, :]) % P
    betting = jnp.take_along_axis(s.status, cand, axis=1) == BETTING
    # first Betting offset (someone must be Betting when not alright)
    k = 1 + jnp.argmax(betting, axis=1).astype(jnp.int32)
    return s._replace(ticker=jnp.where(alright, s.ticker, s.ticker + k))


def _post_blind(s: TableState) -> TableState:
    """One blind post through the bet machinery (ref: to_post game.rs:541-547
    + force_act Blind). Short stacks post all-in (status → SHOVING)."""
    b = s.pot.shape[0]
    rows = jnp.arange(b)
    idx = actor_idx(s)
    stack_a = s.stack[rows, idx]
    amt = jnp.where(
        s.pot < S_BLIND,
        jnp.minimum(S_BLIND, stack_a),
        jnp.minimum(B_BLIND, stack_a),
    )
    stack = s.stack.at[rows, idx].add(-amt)
    status = s.status.at[rows, idx].set(
        jnp.where(stack[rows, idx] == 0, SHOVING, s.status[rows, idx])
    )
    s2 = s._replace(
        pot=s.pot + amt,
        stack=stack,
        stake=s.stake.at[rows, idx].add(amt),
        spent=s.spent.at[rows, idx].add(amt),
        status=status,
    )
    return _advance_player(s2)


def root(key: jnp.ndarray, batch: int, seats: int,
         stack: int = STACK, dealer: int = 0) -> TableState:
    """Blinds-posted N-seat roots with random holes.

    Preblind ticker is 1 for multiway (SB = dealer+1) and 0 heads-up
    (dealer posts SB), per the reference's ``usize::from(P != 2)``
    (ref: game.rs:59-67); both blinds then post through the normal bet
    path so short-stack edge cases match ``act(posts())``.
    """
    P = seats
    u = jax.random.uniform(key, (batch, 52))
    order = jnp.argsort(u, axis=1).astype(jnp.int8)
    hole = order[:, : 2 * P].reshape(batch, P, 2)
    s = TableState(
        hole=hole,
        board=jnp.full((batch, N_BOARD), -1, jnp.int8),
        street=jnp.zeros(batch, jnp.int32),
        pot=jnp.zeros(batch, jnp.int32),
        stack=jnp.full((batch, P), stack, jnp.int32),
        stake=jnp.zeros((batch, P), jnp.int32),
        spent=jnp.zeros((batch, P), jnp.int32),
        status=jnp.zeros((batch, P), jnp.int32),
        ticker=jnp.full(batch, 0 if P == 2 else 1, jnp.int32),
        dealer=jnp.full(batch, dealer, jnp.int32),
        path=jnp.zeros((batch, MAX_SEQ), jnp.int32),
        path_len=jnp.zeros(batch, jnp.int32),
        seq_start=jnp.zeros(batch, jnp.int32),
    )
    return _post_blind(_post_blind(s))


def apply_cols(s: TableState, col: jnp.ndarray, menu: jnp.ndarray,
               active: jnp.ndarray | None = None) -> TableState:
    """Apply one action column per game (no-op where inactive/non-choice)."""
    b = s.pot.shape[0]
    rows = jnp.arange(b)
    if active is None:
        active = jnp.ones(b, bool)
    active = active & is_choice(s)

    idx = actor_idx(s)
    tc = to_call(s)
    ts = to_shove(s)
    rc = raise_chips(s, menu)
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
    s2 = s._replace(pot=pot, stack=stack, stake=stake, spent=spent,
                    status=status)

    depth = jnp.minimum(aggression(s), E.N_DEPTH_CELLS - 1)
    slot_codes = menu[s.street, depth]
    raise_code = jnp.take_along_axis(slot_codes, slot[:, None], axis=1)[:, 0]
    code = jnp.where(
        col == E.COL_FOLD, E.FOLD,
        jnp.where(col == E.COL_CHECK, E.CHECK,
                  jnp.where(col == E.COL_CALL, E.CALL,
                            jnp.where(col == E.COL_SHOVE, E.SHOVE,
                                      raise_code))),
    )
    s2 = _push_edge(s2, code, active)
    s3 = _advance_player(s2)
    return jax.tree.map(
        lambda new, old: jnp.where(
            active.reshape(active.shape + (1,) * (new.ndim - 1)), new, old
        ),
        s3, s,
    )


def deal_board(s: TableState, key: jnp.ndarray,
               active: jnp.ndarray | None = None) -> TableState:
    """Deal the next street's cards at chance nodes."""
    b = s.pot.shape[0]
    P = n_seats(s)
    if active is None:
        active = jnp.ones(b, bool)
    active = active & (turn_of(s) == turn_chance(P))

    used53 = jnp.zeros((b, 53), bool)
    hole_flat = s.hole.reshape(b, 2 * P).astype(jnp.int32)
    used53 = used53.at[jnp.arange(b)[:, None], hole_flat].set(True)
    bidx = jnp.where(s.board >= 0, s.board.astype(jnp.int32), 52)
    used53 = used53.at[jnp.arange(b)[:, None], bidx].set(True)
    u = jax.random.uniform(key, (b, 52))
    u = jnp.where(used53[:, :52], jnp.inf, u)
    draws = []
    for _ in range(3):
        pick = jnp.argmin(u, axis=1)
        draws.append(pick.astype(jnp.int8))
        u = u.at[jnp.arange(b), pick].set(jnp.inf)
    order3 = jnp.stack(draws, axis=1)

    n_now = STREET_REVEALED[s.street]
    n_next = STREET_REVEALED[jnp.minimum(s.street + 1, RIVER)]
    pos = jnp.arange(N_BOARD)[None, :]
    fill = (pos >= n_now[:, None]) & (pos < n_next[:, None]) & active[:, None]
    srcidx = jnp.clip(pos - n_now[:, None], 0, 2)
    new_cards = jnp.take_along_axis(order3, srcidx, axis=1)
    board = jnp.where(fill, new_cards, s.board)

    s2 = s._replace(
        board=board,
        street=jnp.where(active, s.street + 1, s.street),
        ticker=jnp.where(active, 0, s.ticker),
        stake=jnp.where(active[:, None], 0, s.stake),
        seq_start=jnp.where(active, jnp.minimum(s.path_len + 1, MAX_SEQ),
                            s.seq_start),
    )
    s2 = _push_edge(s2, jnp.full(b, E.DRAW, jnp.int32), active)
    s3 = _advance_player(s2)
    return jax.tree.map(
        lambda new, old: jnp.where(
            active.reshape(active.shape + (1,) * (new.ndim - 1)), new, old
        ),
        s3, s,
    )


def settle(s: TableState) -> jnp.ndarray:
    """Per-seat PnL at terminal states [B, P] — full multi-way tiered
    side-pot settlement (ref: crates/kicker/src/showdown.rs).

    Exact transcription of the reference loop structure as a bounded
    P (tiers) × P (all-in levels) masked scan: per tier (descending
    strength among live seats), distribute ascending winner-risked
    layers; each layer's pot is every seat's clipped contribution; split
    equally with odd chips to the earliest winning seats. Uncalled-bet
    refunds emerge naturally (a lone over-bettor wins its own layer).
    """
    B, P = s.stake.shape
    folded = s.status == FOLDING
    live = ~folded
    risked = s.spent

    cards = jnp.concatenate(
        [s.hole.astype(jnp.int32), jnp.broadcast_to(
            s.board[:, None, :].astype(jnp.int32), (B, P, N_BOARD)
        )], axis=2,
    )  # [B, P, 7]
    codes = strength_from_masks(suit_masks(cards))
    # fold-terminal boards are incomplete → garbage codes, but the single
    # live seat forms the only tier so its value never matters; clamp ≥ 0
    strength = jnp.where(live, jnp.maximum(codes, 0), -1)

    def tier_body(_, carry):
        best, distributing, rewards = carry
        cand = live & (strength < best[:, None])
        nbest = jnp.max(jnp.where(cand, strength, -1), axis=1)  # -1: done

        def level_body(_, inner):
            distributing, rewards = inner
            distributed = distributing
            w = (
                live
                & (strength == nbest[:, None])
                & (nbest >= 0)[:, None]
                & (risked > distributed[:, None])
            )
            anyw = w.any(axis=1)
            lvl = jnp.min(jnp.where(w, risked, _I32_MAX), axis=1)
            dist2 = jnp.where(anyw, lvl, distributing)
            chips = jnp.sum(
                jnp.clip(jnp.minimum(risked, dist2[:, None])
                         - distributed[:, None], 0, None),
                axis=1,
            )
            n = jnp.maximum(w.sum(axis=1), 1)
            share = jnp.where(anyw, chips // n, 0)
            bonus = jnp.where(anyw, chips % n, 0)
            rank = jnp.cumsum(w.astype(jnp.int32), axis=1)
            add = jnp.where(
                w, share[:, None] + (rank <= bonus[:, None]), 0
            )
            return dist2, rewards + add

        distributing, rewards = jax.lax.fori_loop(
            0, P, level_body, (distributing, rewards)
        )
        return nbest, distributing, rewards

    best0 = jnp.full(B, _I32_MAX, jnp.int32)
    dist0 = jnp.zeros(B, jnp.int32)
    rewards0 = jnp.zeros((B, P), jnp.int32)
    _, _, rewards = jax.lax.fori_loop(
        0, P, tier_body, (best0, dist0, rewards0)
    )
    return (rewards - risked).astype(jnp.float32)
