"""Opponent-range posterior and belief partition.

TPU-native counterpart of the reference's ``opponent_range`` +
``Posterior.partition::<W>()`` (ref: crates/nlhe/src/solver.rs:140-200,
crates/subgame/src/world/partition.rs:16-53, belief.rs:19-50).

The reference replays the hand once per candidate villain hole (≤1,225
sequentially); here all 1,326 candidate holes replay **in lockstep** as
one batch through the same fixed action sequence, gathering the
blueprint's averaged policy at each villain decision and multiplying —
one jit call per decision point.

Belief partition mirrors the reference exactly: holes sorted by reach
descending, equal-mass quantile segments, world 0 = highest reach.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..deuce.observation import ALL_POCKETS
from ..kicker import edges as E
from ..kicker import game as G
from ..mccfr.engine import averaged
from ..nlhe.table import InfoTable, make_key, probe_rows
from ..pokerkit.constants import N_WORLDS


class ReplaySeq(NamedTuple):
    """Host-prepared observed-action sequence, padded to fixed length.

    kind: 0 = action column, 1 = board deal, 2 = padding
    col:  action column (kind 0)
    cards: dealt cards, -1 padded (kind 1)
    """

    kind: np.ndarray    # i32 [L]
    col: np.ndarray     # i32 [L]
    cards: np.ndarray   # i32 [L, 3]


def force_deal(s: G.TableState, cards: jnp.ndarray,
               active: jnp.ndarray) -> G.TableState:
    """Deal *specific* board cards at chance nodes (replay path).

    Same transition as :func:`robopoker_tpu.kicker.game.deal_board` but
    with observed cards instead of random ones. ``cards`` is [3] (shared
    across the batch) or [B, 3] (per-lane deals — the AIVAT chance-node
    enumeration deals every candidate card in one batch).
    """
    b = s.pot.shape[0]
    active = active & (G.turn_of(s) == G.TURN_CHANCE)
    n_now = G.STREET_REVEALED[s.street]
    n_next = G.STREET_REVEALED[jnp.minimum(s.street + 1, G.RIVER)]
    pos = jnp.arange(G.N_BOARD)[None, :]
    fill = (pos >= n_now[:, None]) & (pos < n_next[:, None]) & active[:, None]
    srcidx = jnp.clip(pos - n_now[:, None], 0, 2)
    cards_b = (jnp.broadcast_to(cards[None, :], (b, cards.shape[0]))
               if cards.ndim == 1 else cards)
    new_cards = jnp.take_along_axis(cards_b, srcidx, axis=1).astype(jnp.int8)
    board = jnp.where(fill, new_cards, s.board)
    s2 = s._replace(
        board=board,
        street=jnp.where(active, s.street + 1, s.street),
        ticker=jnp.where(active, 0, s.ticker),
        stake=jnp.where(active[:, None], 0, s.stake),
        seq_start=jnp.where(active, jnp.minimum(s.path_len + 1, G.MAX_SEQ), s.seq_start),
    )
    s2 = G._push_edge(s2, jnp.full(b, E.DRAW, jnp.int32), active)
    s3 = G._advance_player(s2)
    return jax.tree.map(
        lambda new, old: jnp.where(
            active.reshape(active.shape + (1,) * (new.ndim - 1)), new, old
        ),
        s3, s,
    )


def make_posterior_fn(bucket_fn, menu: np.ndarray, seq_len: int = 24):
    """Build the jitted posterior kernel for a fixed max sequence length.

    Returns ``posterior(table, seq, hero_seat, hero_hole) ->
    (probs [1326], live [1326], head_state)`` where probs is the
    normalized villain-hole posterior and head_state holds the replayed
    games (lane i = villain hole ALL_POCKETS[i]).
    """
    MENU = jnp.asarray(menu)
    pockets = jnp.asarray(ALL_POCKETS)  # [1326, 2]
    NB = pockets.shape[0]
    # lookup tables thread as jit ARGUMENTS via rebinding (the HLO-
    # constant trap — see make_resolve_step / make_nlhe_step)
    _bound = [bucket_fn]

    def posterior(table: InfoTable, kind, col, cards, hero_seat, hero_hole):
        # roots: every candidate villain hole in its own lane
        holes = jnp.zeros((NB, 2, 2), jnp.int8)
        holes = holes.at[:, 0].set(
            jnp.where(hero_seat == 0, hero_hole[None, :], pockets).astype(jnp.int8)
        )
        holes = holes.at[:, 1].set(
            jnp.where(hero_seat == 1, hero_hole[None, :], pockets).astype(jnp.int8)
        )
        state = G.root(jax.random.PRNGKey(0), NB)
        state = state._replace(hole=holes)

        reach = jnp.ones(NB, jnp.float32)
        seen_cards = jnp.full((NB,), True)

        def body(i, carry):
            state, reach = carry
            k = kind[i]
            is_deal = k == 1
            is_act = k == 0
            t = G.turn_of(state)
            villain = 1 - hero_seat
            at_villain = (t == villain) & is_act
            # villain policy at the observed column
            klo, khi, legal = _lookup(state)
            row, _ = probe_rows(table.key_lo, table.key_hi, klo, khi)
            sig = averaged(table.weight[row], legal)
            p = sig[jnp.arange(NB), jnp.clip(col[i], 0, 8)]
            reach = reach * jnp.where(at_villain, jnp.maximum(p, 0.0), 1.0)
            state = G.apply_cols(
                state, jnp.full(NB, col[i], jnp.int32), MENU,
                is_act & (t <= 1),
            )
            state = force_deal(state, cards[i], jnp.full(NB, is_deal))
            return state, reach

        def _lookup(states):
            idx = G.actor_idx(states)
            hole = jnp.take_along_axis(
                states.hole, idx[:, None, None].astype(jnp.int32), axis=1
            )[:, 0]
            bucket = _bound[0](hole.astype(jnp.int32),
                               states.board.astype(jnp.int32), states.street)
            legal = G.legal_cols(states, MENU)
            cmask = (legal * (1 << jnp.arange(9))).sum(axis=1).astype(jnp.int32)
            sub = G.packed_subgame(states)
            klo, khi = make_key(bucket, sub, cmask)
            return klo, khi, legal

        state, reach = jax.lax.fori_loop(0, seq_len, body, (state, reach))

        # dead holes: overlap with hero's cards or the board
        seen = jnp.concatenate(
            [hero_hole[None, :].repeat(NB, 0), state.board.astype(jnp.int32)],
            axis=1,
        )
        overlap = (pockets[:, :, None] == seen[:, None, :]).any(axis=(1, 2))
        live = ~overlap
        probs = jnp.where(live, reach, 0.0)
        probs = probs / jnp.maximum(probs.sum(), 1e-30)
        return probs, live, state

    btree = bucket_fn.tree() if hasattr(bucket_fn, "tree") else None
    if btree is None:
        return jax.jit(posterior)

    def posterior_with_tables(table, kind, col, cards, hero_seat,
                              hero_hole, btree_arg):
        _bound[0] = bucket_fn.bind(btree_arg)
        try:
            return posterior(table, kind, col, cards, hero_seat, hero_hole)
        finally:
            _bound[0] = bucket_fn

    jitted = jax.jit(posterior_with_tables)
    fn = lambda *a: jitted(*a, btree)
    fn.jitted = jitted
    fn.extra_args = (btree,)
    return fn


def belief_partition(probs: np.ndarray, n_worlds: int = N_WORLDS) -> np.ndarray:
    """Quantile worlds: sort by reach desc, equal-mass segments
    (ref: partition.rs:29-53). Returns world id per hole [1326]
    (zero-mass holes land in the last world)."""
    order = np.argsort(-probs, kind="stable")
    sorted_p = probs[order]
    cum = np.cumsum(sorted_p)
    total = max(cum[-1], 1e-30)
    # world w covers cumulative mass (w/W, (w+1)/W]
    seg = np.minimum((cum / total * n_worlds - 1e-9).astype(np.int64), n_worlds - 1)
    world = np.empty_like(seg)
    world[order] = seg
    return world.astype(np.int32)


def world_weights(probs: np.ndarray, world: np.ndarray,
                  n_worlds: int = N_WORLDS) -> np.ndarray:
    """Total posterior mass per world (the per-iteration world sampling
    distribution, ref: subgame/src/solver.rs:62-100)."""
    w = np.zeros(n_worlds, np.float32)
    np.add.at(w, world, probs)
    s = w.sum()
    return w / s if s > 0 else np.full(n_worlds, 1.0 / n_worlds, np.float32)
