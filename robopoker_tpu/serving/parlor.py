"""Live-game engine: dealing, turn order, agent orchestration.

TPU-native counterpart of the reference's ``parlor`` crate
(ref: crates/parlor/src/{engine,actor}.rs): the typestate
Seating→Dealing→Showdown→Finished loop driving one hand at a time. Here
the table state *is* the differential-tested batched engine at B=1, so
live play and training share one rules implementation; agents receive
the same ``Witness`` view the real-time solver consumes.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ..kicker import MENU_PLURIBUS, game as G
from ..kicker import multiway as mw
from .policy import Agent, Witness

MENU = jnp.asarray(MENU_PLURIBUS)


@dataclasses.dataclass
class HandResult:
    pnl: np.ndarray        # [P] chips
    events: list           # full public record
    holes: np.ndarray      # [P, 2]
    board: np.ndarray      # [5]


@dataclasses.dataclass
class Engine:
    """One table; agents indexed by seat. Seat count follows the agent
    list — 2 is the trained heads-up Game, 6/10 are the reference's
    FunTable/NitTable live-play aliases (ref: kicker/src/game.rs:43-45);
    all run on the multiway engine (lockstep-equivalent to the HU module
    at P=2, tests/test_multiway.py)."""

    agents: list           # [Agent] * P
    seed: int = 0
    max_steps: int = 96

    def play_hand(self, hand_id: int = 0) -> HandResult:
        P = len(self.agents)
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), hand_id)
        state = mw.root(key, 1, seats=P)
        chance, terminal = mw.turn_chance(P), mw.turn_terminal(P)
        events: list = []
        for step in range(self.max_steps):
            t = int(np.asarray(mw.turn_of(state))[0])
            if t == terminal:
                break
            if t == chance:
                before = int(np.asarray(state.street)[0])
                state = mw.deal_board(state, jax.random.fold_in(key, 100 + step))
                after = int(np.asarray(state.street)[0])
                lo, hi = G.STREET_REVEALED[before], G.STREET_REVEALED[after]
                cards = np.asarray(state.board)[0, int(lo):int(hi)].tolist()
                events.append(("deal", cards))
                continue
            witness = Witness(
                hero_seat=t,
                hero_hole=np.asarray(state.hole)[0, t].astype(np.int64),
                events=[e for e in events],
            )
            legal = np.asarray(mw.legal_cols(state, MENU))[0]
            col = self.agents[t].decide(witness, legal=legal)
            if not legal[col]:           # defensive snap: first legal action
                col = int(np.argmax(legal))
            state = mw.apply_cols(
                state, jnp.asarray([col]), MENU, jnp.asarray([True])
            )
            events.append(("col", col))
        pnl = np.asarray(mw.settle(state))[0]
        return HandResult(
            pnl=pnl,
            events=events,
            holes=np.asarray(state.hole)[0],
            board=np.asarray(state.board)[0],
        )

    def play(self, n_hands: int) -> np.ndarray:
        """Session of n hands; returns [n, P] chip PnL."""
        return np.stack([self.play_hand(i).pnl for i in range(n_hands)])
