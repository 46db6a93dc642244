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
class Room:
    """Interactive table: bots act automatically; a seat whose agent is
    ``None`` is human and the hand pauses until :meth:`act` supplies its
    column (ref: crates/parlor/src/engine.rs typestate loop + the
    portal ``hosting`` room the WS clients join). With no ``None`` seat
    the hand plays straight through — :class:`Engine` delegates here, so
    live rooms and bot sessions share one loop (and one RNG schedule:
    ``fold_in(hand_key, 100 + step)`` per chance deal, step counting
    every loop iteration, exactly the pre-Room ``Engine`` behavior)."""

    agents: list           # [Agent | None] * P
    seed: int = 0
    max_steps: int = 96

    def __post_init__(self):
        self.hand_id = -1
        self.state = None
        self.events: list = []
        self.finished = True
        self.result: HandResult | None = None
        self._step = 0
        self._key = None

    # -- lifecycle ---------------------------------------------------
    def start_hand(self, hand_id: int | None = None) -> None:
        P = len(self.agents)
        self.hand_id = self.hand_id + 1 if hand_id is None else hand_id
        self._key = jax.random.fold_in(
            jax.random.PRNGKey(self.seed), self.hand_id
        )
        self.state = mw.root(self._key, 1, seats=P)
        self.events = []
        self.finished = False
        self.result = None
        self._step = 0
        self._advance()

    def turn(self) -> int | None:
        """Seat to act, or None when the hand is finished."""
        if self.finished:
            return None
        return int(np.asarray(mw.turn_of(self.state))[0])

    def legal(self) -> np.ndarray:
        return np.asarray(mw.legal_cols(self.state, MENU))[0]

    def act(self, col: int) -> int:
        """Apply a human action at the current seat; returns the column
        actually applied (defensively snapped to the first legal one,
        mirroring the bot path)."""
        t = self.turn()
        if t is None or self.agents[t] is not None:
            raise ValueError("not a human seat's turn")
        legal = self.legal()
        if not legal[int(col)]:
            col = int(np.argmax(legal))
        self._apply(int(col))
        self._advance()
        return int(col)

    # -- internals ---------------------------------------------------
    def _apply(self, col: int) -> None:
        self.state = mw.apply_cols(
            self.state, jnp.asarray([col]), MENU, jnp.asarray([True])
        )
        self.events.append(("col", col))
        self._step += 1

    def _advance(self) -> None:
        P = len(self.agents)
        chance, terminal = mw.turn_chance(P), mw.turn_terminal(P)
        while self._step < self.max_steps:
            t = int(np.asarray(mw.turn_of(self.state))[0])
            if t == terminal:
                break
            if t == chance:
                before = int(np.asarray(self.state.street)[0])
                self.state = mw.deal_board(
                    self.state, jax.random.fold_in(self._key, 100 + self._step)
                )
                after = int(np.asarray(self.state.street)[0])
                lo, hi = G.STREET_REVEALED[before], G.STREET_REVEALED[after]
                cards = np.asarray(self.state.board)[0, int(lo):int(hi)].tolist()
                self.events.append(("deal", cards))
                self._step += 1
                continue
            agent = self.agents[t]
            if agent is None:
                return                     # pause: await act()
            witness = Witness(
                hero_seat=t,
                hero_hole=np.asarray(self.state.hole)[0, t].astype(np.int64),
                events=[e for e in self.events],
            )
            col = agent.decide(witness, legal=self.legal())
            legal = self.legal()
            if not legal[col]:
                col = int(np.argmax(legal))
            self._apply(int(col))
        self._finish()

    def _finish(self) -> None:
        pnl = np.asarray(mw.settle(self.state))[0]
        self.result = HandResult(
            pnl=pnl,
            events=self.events,
            holes=np.asarray(self.state.hole)[0],
            board=np.asarray(self.state.board)[0],
        )
        self.finished = True

    # -- wire view ---------------------------------------------------
    def snapshot(self, seat: int) -> dict:
        """Per-seat view: own hole only, revealed board only
        (ref: crates/kicker/src/snapshot.rs per-seat wire view)."""
        s = self.state
        street = int(np.asarray(s.street)[0])
        revealed = int(G.STREET_REVEALED[street])
        t = self.turn()
        snap = {
            "hand_id": self.hand_id,
            "seat": seat,
            "to_act": t,
            "street": street,
            "board": np.asarray(s.board)[0, :revealed].tolist(),
            "pot": int(np.asarray(s.pot)[0]),
            "stacks": np.asarray(s.stack)[0].tolist(),
            "hole": np.asarray(s.hole)[0, seat].tolist(),
            "events": [list(e) for e in self.events],
            "finished": self.finished,
        }
        if t == seat:
            snap["legal"] = [bool(x) for x in self.legal()]
        if self.finished and self.result is not None:
            snap["pnl"] = self.result.pnl.tolist()
            snap["showdown_holes"] = self.result.holes.tolist()
        return snap


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
        room = Room(self.agents, seed=self.seed, max_steps=self.max_steps)
        room.start_hand(hand_id)
        assert room.finished, "bot-only hand must run to completion"
        return room.result

    def play(self, n_hands: int) -> np.ndarray:
        """Session of n hands; returns [n, P] chip PnL."""
        return np.stack([self.play_hand(i).pnl for i in range(n_hands)])
