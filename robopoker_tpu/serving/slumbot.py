"""Slumbot benchmark client.

TPU-native counterpart of the reference's ``spar`` crate
(ref: crates/spar/src/{translate,session,benchmark,runtime}.rs): plays
hands against slumbot.com's API, translating between its chip scale
(50/100 blinds, 20,000 stacks) and our canonical 1/2-blind, 200-stack
game (``SCALE = 50``, ``SLUMBOT_STACK = 400`` local chips), parsing its
action strings ('b150c/kk/...'), and aggregating bb/100 ± CI.

The HTTP transport is injectable (this environment has zero egress);
tests drive the session against a scripted fake server, which also
mirrors how the reference's throttle/runtime logic is validated.
"""

from __future__ import annotations

import dataclasses
import math
import re

import numpy as np

# slumbot chip scale (ref: spar/src/translate.rs:5-19)
SLUMBOT_SB, SLUMBOT_BB = 50, 100
SLUMBOT_STACK = 20_000
SCALE = SLUMBOT_BB // 2                 # 50 slumbot chips per local chip
LOCAL_STACK = SLUMBOT_STACK // SCALE    # 400 local chips (200bb)


def to_local(chips: int) -> int:
    return chips // SCALE


def to_slumbot(chips: int) -> int:
    return chips * SCALE


_TOKEN = re.compile(r"k|c|f|b(\d+)")


def parse_actions(s: str) -> list[tuple]:
    """Slumbot action string → [(kind, amount)] per street
    ('/' separates streets; 'k' check, 'c' call, 'f' fold, 'bN' bet-to N).

    ref: spar/src/translate.rs action-string parser.
    """
    out = []
    for street_i, street in enumerate(s.split("/")):
        pos = 0
        while pos < len(street):
            m = _TOKEN.match(street, pos)
            if not m:
                raise ValueError(f"bad action string {s!r} at {pos}")
            tok = m.group(0)
            if tok == "k":
                out.append(("check", 0, street_i))
            elif tok == "c":
                out.append(("call", 0, street_i))
            elif tok == "f":
                out.append(("fold", 0, street_i))
            else:
                out.append(("bet", int(m.group(1)), street_i))
            pos = m.end()
    return out


def render_action(kind: str, amount_local: int = 0) -> str:
    if kind == "check":
        return "k"
    if kind == "call":
        return "c"
    if kind == "fold":
        return "f"
    return f"b{to_slumbot(amount_local)}"


@dataclasses.dataclass
class Benchmark:
    """bb/100 aggregation (ref: spar/src/benchmark.rs:11)."""

    results_bb: list = dataclasses.field(default_factory=list)

    def record(self, hero_chips_won_slumbot: int) -> None:
        self.results_bb.append(hero_chips_won_slumbot / SLUMBOT_BB)

    def summary(self) -> dict:
        n = len(self.results_bb)
        if n == 0:
            return {"hands": 0}
        arr = np.asarray(self.results_bb, np.float64)
        mean = arr.mean() * 100.0
        stderr = arr.std(ddof=1) / math.sqrt(n) * 100.0 if n > 1 else 0.0
        return {
            "hands": n,
            "bb_per_100": round(mean, 2),
            "ci95": round(1.96 * stderr, 2),
        }


@dataclasses.dataclass
class Session:
    """Per-hand driver (ref: spar/src/session.rs:10).

    transport(endpoint, payload) -> dict is injectable; the live
    implementation posts to https://slumbot.com/api/* with the session
    token, matching the reference's client.
    """

    transport: object
    agent: object              # serving.policy.Agent
    benchmark: Benchmark = dataclasses.field(default_factory=Benchmark)
    token: str | None = None

    def new_hand(self) -> dict:
        resp = self.transport("new_hand", {"token": self.token})
        self.token = resp.get("token", self.token)
        return resp

    def act(self, incr: str) -> dict:
        resp = self.transport("act", {"token": self.token, "incr": incr})
        self.token = resp.get("token", self.token)
        return resp

    def play_hand(self) -> float | None:
        """One hand to completion; returns hero winnings (slumbot chips)."""
        state = self.new_hand()
        while "winnings" not in state:
            decision = self.agent.decide_slumbot(state)
            state = self.act(decision)
        self.benchmark.record(state["winnings"])
        return state["winnings"]


@dataclasses.dataclass
class Runtime:
    """Multi-session orchestration with throttling
    (ref: spar/src/runtime.rs:36-75)."""

    sessions: list
    hands_per_session: int = 100

    def run(self) -> dict:
        for s in self.sessions:
            for _ in range(self.hands_per_session):
                s.play_hand()
        out = {}
        for i, s in enumerate(self.sessions):
            out[f"session_{i}"] = s.benchmark.summary()
        return out


# ---------------------------------------------------------------------------
# Live-play adapter: slumbot wire state → Witness → policy → action string
# (ref: spar/src/session.rs + translate.rs — client_pos 0 = BB, 1 = BTN/SB)
# ---------------------------------------------------------------------------

def parse_card(s: str) -> int:
    from ..deuce.cards import parse_card as _pc

    return int(_pc(s))


def _street_of(n_board: int) -> int:
    return {0: 0, 3: 1, 4: 2, 5: 3}[n_board]


class SlumbotAgent:
    """Drives a serving policy against the slumbot action protocol.

    Replays the hand's action string into Witness events (bets translated
    onto the abstraction grid via the configured translation policy),
    queries the policy, and renders the chosen column back as a slumbot
    token. Stateless between calls — everything derives from the wire
    state, like the reference's per-hand session driver.
    """

    def __init__(self, policy, use_dirac: bool = True, seed: int = 0):
        from .policy import Agent

        self.agent = Agent(policy, use_dirac=use_dirac, seed=seed)

    def decide_slumbot(self, state: dict) -> str:
        import jax.numpy as jnp
        import numpy as np

        from ..kicker import MENU_PLURIBUS, edges as EDG, game as G
        from .policy import Witness

        # client_pos 1 ⇒ hero is BTN/SB = our seat 0; client_pos 0 ⇒ BB = seat 1
        # (ref: spar/src/translate.rs:219-225)
        hero_seat = 0 if state.get("client_pos", 1) == 1 else 1
        hole = np.array([parse_card(c) for c in state["hole_cards"]], np.int64)
        board = [parse_card(c) for c in state.get("board", [])]

        # replay the action string into engine events, tracking the live
        # state so off-grid bets translate against the real pot
        menu = jnp.asarray(MENU_PLURIBUS)
        st = G.root(jnp.zeros(2, jnp.uint32), 1)
        events = []

        def apply_col(col):
            nonlocal st
            events.append(("col", int(col)))
            st = G.apply_cols(st, jnp.asarray([int(col)]), menu,
                              jnp.asarray([True]))

        def apply_deal(cards):
            nonlocal st
            from ..subgame.posterior import force_deal

            events.append(("deal", list(cards)))
            arr = np.full(3, -1, np.int64)
            for j, c in enumerate(cards):
                arr[j] = c
            st = force_deal(st, jnp.asarray(arr), jnp.asarray([True]))

        board_used = 0
        for kind, amount, street_i in parse_actions(state.get("action", "")):
            # deal boundary: slumbot separates streets with '/'
            while _street_of(board_used) < street_i and board_used < len(board):
                take = {0: 3, 3: 1, 4: 1}[board_used]
                apply_deal(board[board_used:board_used + take])
                board_used += take
            t = int(np.asarray(G.turn_of(st))[0])
            if t == G.TURN_CHANCE:
                take = {0: 3, 3: 1, 4: 1}[board_used]
                apply_deal(board[board_used:board_used + take])
                board_used += take
            if kind == "check":
                apply_col(EDG.COL_CHECK)
            elif kind == "call":
                apply_col(EDG.COL_CALL if bool(np.asarray(
                    G.legal_cols(st, menu))[0, EDG.COL_CALL]) else EDG.COL_SHOVE)
            elif kind == "fold":
                apply_col(EDG.COL_FOLD)
            else:  # bet-to `amount` slumbot chips this street
                col = self._translate_bet(st, menu, amount)
                apply_col(col)

        witness = Witness(hero_seat=hero_seat, hero_hole=hole, events=events)
        col = self.agent.decide(witness)
        return self._render(st, menu, col)

    def _translate_bet(self, st, menu, amount_slumbot: int) -> int:
        """Off-grid opponent bet → nearest menu column via the configured
        translation (ref: translate.rs + Size::translate)."""
        import jax.numpy as jnp
        import numpy as np

        from ..kicker import edges as EDG, game as G
        from ..pokerkit.regime import Translation
        from ..pokerkit.translate import translate

        legal = np.asarray(G.legal_cols(st, menu))[0]
        stake = int(np.asarray(st.stake).max())
        target = to_local(amount_slumbot)
        chips = max(target - int(np.asarray(st.stake)[0].max()), 1)
        ts = int(np.asarray(G.to_shove(st))[0])
        if chips >= ts and legal[EDG.COL_SHOVE]:
            return EDG.COL_SHOVE
        rc = np.asarray(G.raise_chips(st, menu))[0]
        slots = [s for s in range(EDG.N_RAISE_SLOTS)
                 if legal[EDG.COL_RAISE0 + s]]
        if not slots:
            return EDG.COL_SHOVE if legal[EDG.COL_SHOVE] else EDG.COL_CALL
        anchors = np.array([rc[s] for s in slots], np.float32)
        order = np.argsort(anchors)
        idx = int(translate(anchors[order], np.array([chips], np.float32),
                            Translation.PHARGMAX)[0])
        return EDG.COL_RAISE0 + slots[order[idx]]

    def _render(self, st, menu, col) -> str:
        import numpy as np

        from ..kicker import edges as EDG, game as G

        if col == EDG.COL_FOLD:
            return "f"
        if col == EDG.COL_CHECK:
            return "k"
        if col == EDG.COL_CALL:
            return "c"
        stake = int(np.asarray(st.stake).max())
        if col == EDG.COL_SHOVE:
            total = int(np.asarray(G.to_shove(st))[0]) + \
                int(np.asarray(st.stake)[0, int(np.asarray(G.actor_idx(st))[0])])
            return render_action("bet", total)
        rc = np.asarray(G.raise_chips(st, menu))[0]
        add = int(rc[col - EDG.COL_RAISE0])
        me = int(np.asarray(G.actor_idx(st))[0])
        total = add + int(np.asarray(st.stake)[0, me])
        return render_action("bet", total)
