"""Protocol-faithful mock of the slumbot.com API (VERDICT r4 #6).

The live benchmark needs egress; this mock implements the wire protocol
the reference's spar client speaks (ref: crates/spar/src/session.rs:10,
runtime.rs:36-75, translate.rs chip scale) so the full Session loop —
new_hand/act tokens, per-street action strings with '/' separators,
bet-to amounts in slumbot chips (50/100 blinds, 20,000 stacks),
client_pos seat semantics, winnings at fold/showdown — can be driven
end-to-end without a network.

Rules implemented (heads-up NL, slumbot conventions):
- client_pos 1 ⇒ the CLIENT is BTN/SB (acts first preflop, last after);
  client_pos alternates per hand like the live server.
- action string: 'k' check, 'c' call, 'f' fold, 'bN' bet-TO N chips for
  the current street; '/' separates streets.
- a street closes when both players have acted and street stakes match
  (BB retains the preflop option after a limp).
- winnings: loser's total commitment, hero-signed; showdown via the
  pure-python oracle evaluator (ties push).

The built-in villain is a deterministic station that calls any bet,
checks otherwise — except it leads an OFF-GRID bet-to 137 the first
time it can bet on the flop, exercising the client's pharmonic bet
translation (ref: translate.rs harmonic mapping).
"""

from __future__ import annotations

import dataclasses

from .oracle_evaluator import evaluate as oracle_eval

SB, BB, STACK = 50, 100, 20_000

RANKS = "23456789TJQKA"
SUITS = "cdhs"


def card_str(c: int) -> str:
    return RANKS[c >> 2] + SUITS[c & 3]


@dataclasses.dataclass
class _Hand:
    hero_pos: int          # client_pos: 1 = hero is BTN/SB
    hero_hole: list
    villain_hole: list
    board: list            # 5 ints, revealed progressively
    street: int = 0        # 0 pref, 1 flop, 2 turn, 3 river
    tokens: list = dataclasses.field(default_factory=list)  # per-street lists
    committed: dict = dataclasses.field(default_factory=dict)   # seat-> total
    street_stake: dict = dataclasses.field(default_factory=dict)
    acted: dict = dataclasses.field(default_factory=dict)
    to_act: str = ""       # "hero" | "villain"
    over: bool = False
    winnings: int | None = None
    villain_flop_bet_done: bool = False

    def __post_init__(self):
        # blinds: SB = BTN. seat names are "hero"/"villain".
        sb = "hero" if self.hero_pos == 1 else "villain"
        bb = "villain" if self.hero_pos == 1 else "hero"
        self.committed = {sb: SB, bb: BB}
        self.street_stake = {sb: SB, bb: BB}
        self.acted = {sb: False, bb: False}
        self.to_act = sb
        self.tokens = [[]]

    # -- helpers ----------------------------------------------------------
    def _sb(self):
        return "hero" if self.hero_pos == 1 else "villain"

    def _bb(self):
        return "villain" if self.hero_pos == 1 else "hero"

    def _other(self, who):
        return "villain" if who == "hero" else "hero"

    def action_string(self) -> str:
        return "/".join("".join(t) for t in self.tokens)

    def board_strs(self) -> list:
        n = {0: 0, 1: 3, 2: 4, 3: 5}[min(self.street, 3)]
        return [card_str(c) for c in self.board[:n]]

    def _next_street(self):
        for s in self.street_stake:
            self.street_stake[s] = 0
            self.acted[s] = False
        self.street += 1
        self.tokens.append([])
        if self.street > 3:
            self._showdown()
        else:
            self.to_act = self._bb()   # HU postflop: BB acts first

    def _showdown(self):
        self.over = True
        hero7 = self.hero_hole + self.board
        vill7 = self.villain_hole + self.board
        h, v = oracle_eval(hero7), oracle_eval(vill7)
        if h > v:
            self.winnings = self.committed["villain"]
        elif v > h:
            self.winnings = -self.committed["hero"]
        else:
            self.winnings = 0

    def _fold(self, who):
        self.over = True
        self.winnings = (self.committed["villain"] if who == "villain"
                         else -self.committed["hero"])

    def apply(self, who, token: str):
        """One validated action token from `who` (must be in turn)."""
        assert not self.over, "hand is over"
        assert who == self.to_act, f"{who} acted out of turn"
        me, opp = who, self._other(who)
        owe = self.street_stake[opp] - self.street_stake[me]
        self.tokens[-1].append(token)
        self.acted[me] = True
        if token == "f":
            # open folds (owe == 0) are legal poker, just unusual — the
            # live server accepts them, so the mock must too
            self._fold(me)
            return
        if token == "k":
            assert owe == 0, f"check facing a bet of {owe}"
            if self.acted[opp]:
                self._next_street()
            else:
                self.to_act = opp
            return
        if token == "c":
            assert owe > 0, "call with nothing to call"
            self.committed[me] += owe
            self.street_stake[me] += owe
            # preflop SB limp: BB keeps the option
            if (self.street == 0 and me == self._sb()
                    and not self.acted[opp]):
                self.to_act = opp
            elif self.committed[me] >= STACK:
                # all-in call: run out the board
                while not self.over:
                    self._next_street_or_end()
            else:
                self._next_street()
            return
        assert token.startswith("b")
        total = int(token[1:])
        assert total > self.street_stake[me], "bet-to must raise own stake"
        assert self.street_stake[me] + (STACK - self.committed[me]) >= total, \
            "bet exceeds stack"
        add = total - self.street_stake[me]
        self.committed[me] += add
        self.street_stake[me] = total
        self.to_act = opp

    def _next_street_or_end(self):
        if self.street >= 3:
            self._showdown()
        else:
            self._next_street()
            # all-in: no more actions; streets just run out
            for s in self.acted:
                self.acted[s] = True


class MockSlumbotServer:
    """transport(endpoint, payload) -> dict, plugging into Session."""

    def __init__(self, seed: int = 0):
        import random

        self.rng = random.Random(seed)
        self.hand_no = 0
        self.hand: _Hand | None = None
        self.token = "mock-token-0"

    # -- villain policy ---------------------------------------------------
    def _villain_token(self) -> str:
        h = self.hand
        owe = h.street_stake["hero"] - h.street_stake["villain"]
        if owe > 0:
            return "c"
        if h.street == 1 and not h.villain_flop_bet_done:
            h.villain_flop_bet_done = True
            return "b137"   # off-grid: exercises pharmonic translation
        return "k"

    def _advance_villain(self):
        """Let the villain act until it's hero's turn or the hand ends."""
        while not self.hand.over and self.hand.to_act == "villain":
            self.hand.apply("villain", self._villain_token())

    def _state(self) -> dict:
        h = self.hand
        out = {
            "token": self.token,
            "client_pos": h.hero_pos,
            "hole_cards": [card_str(c) for c in h.hero_hole],
            "board": h.board_strs(),
            "action": h.action_string(),
        }
        if h.over:
            out["winnings"] = h.winnings
            out["bot_hole_cards"] = [card_str(c) for c in h.villain_hole]
        return out

    # -- transport --------------------------------------------------------
    def __call__(self, endpoint: str, payload: dict) -> dict:
        if endpoint == "new_hand":
            deck = list(range(52))
            self.rng.shuffle(deck)
            self.hand_no += 1
            self.token = f"mock-token-{self.hand_no}"
            self.hand = _Hand(
                hero_pos=self.hand_no % 2,
                hero_hole=deck[0:2], villain_hole=deck[2:4],
                board=deck[4:9])
            self._advance_villain()
            return self._state()
        assert endpoint == "act"
        assert payload.get("token") == self.token, "stale session token"
        self.hand.apply("hero", payload["incr"])
        self._advance_villain()
        return self._state()
