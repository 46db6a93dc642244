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
