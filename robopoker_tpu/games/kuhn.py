"""6-card Kuhn poker.

Validation game #2 (ref: crates/kuhn/src/game.rs). Deck = {J,Q,K} × {♠,♥}
(cards 0..5, rank = card // 2); same-rank deals tie at showdown, shifting
the equilibrium from classical 3-card Kuhn — the analytic Nash is fully
derived in the reference (all mixed probabilities are fractions of 31,
game value −19/465; ref: crates/kuhn/src/solver.rs:86-160) and serves as
this game's convergence oracle (see tests/test_kuhn.py).

States are small tuples; phases mirror the reference Node enum
(Start/Dealt/Open/Check/Bet/CheckBet/Over).
"""

from __future__ import annotations

from fractions import Fraction

from ..mccfr.tree import CHANCE, TERMINAL

JACK, QUEEN, KING = 0, 1, 2
CARDS = tuple(range(6))  # rank = c // 2

CHECK, BET, FOLD, CALL = "X", "B", "F", "C"

# histories (public state)
OPEN, CHECKED, BETTED, CHECKBET = "", "X", "B", "XB"


class Kuhn:
    n_players = 2

    def root(self):
        return ("start",)

    def turn(self, state) -> int:
        tag = state[0]
        if tag in ("start", "dealt"):
            return CHANCE
        if tag == "over":
            return TERMINAL
        h = state[2]
        return {OPEN: 0, CHECKED: 1, BETTED: 1, CHECKBET: 0}[h]

    def branches(self, state):
        tag = state[0]
        if tag == "start":
            return [(c, ("dealt", c)) for c in CARDS]
        if tag == "dealt":
            c0 = state[1]
            return [(c, ("play", (c0, c), OPEN)) for c in CARDS if c != c0]
        _, holes, h = state
        if h in (OPEN, CHECKED):
            nxt = {OPEN: {CHECK: CHECKED, BET: BETTED},
                   CHECKED: {CHECK: "showdown1", BET: CHECKBET}}[h]
            out = []
            for e, n in nxt.items():
                if n == "showdown1":
                    out.append((e, ("over", holes, "showdown", 1.0)))
                else:
                    out.append((e, ("play", holes, n)))
            return out
        # facing a bet
        folder = 1 if h == BETTED else 0
        return [
            (FOLD, ("over", holes, "fold", folder)),
            (CALL, ("over", holes, "showdown", 2.0)),
        ]

    def payoff(self, state, player: int) -> float:
        _, holes, kind, x = state
        if kind == "fold":
            return -1.0 if player == x else 1.0
        stake = x
        r0, r1 = holes[0] // 2, holes[1] // 2
        if r0 == r1:
            return 0.0
        winner = 0 if r0 > r1 else 1
        return stake if player == winner else -stake

    def info(self, state):
        _, holes, h = state
        actor = self.turn(state)
        return (h, holes[actor] // 2)


# ---------------------------------------------------------------------------
# Analytic Nash equilibrium of 6-card Kuhn (ref: kuhn/src/solver.rs:96-140).
# Info keys are (history, rank). Values are P(edge).
# ---------------------------------------------------------------------------
NASH = {
    ((OPEN, JACK), BET): Fraction(9, 31),        # a:  J| Bet
    ((OPEN, KING), BET): Fraction(27, 31),       # k:  K| Bet
    ((BETTED, QUEEN), CALL): Fraction(17, 31),   # c1: Q|B Call
    ((CHECKBET, QUEEN), CALL): Fraction(23, 31),  # c2: Q|XB Call
    ((CHECKED, JACK), BET): Fraction(9, 31),     # b:  J|X Bet
    ((CHECKED, QUEEN), BET): Fraction(8, 31),    # d:  Q|X Bet
    ((BETTED, JACK), FOLD): Fraction(1),
    ((BETTED, KING), CALL): Fraction(1),
    ((OPEN, QUEEN), BET): Fraction(0),           # Q opening: always check
    ((CHECKED, KING), BET): Fraction(1),         # K after check: always bet
    ((CHECKBET, JACK), FOLD): Fraction(1),
    ((CHECKBET, KING), CALL): Fraction(1),
}

GAME_VALUE = Fraction(-19, 465)  # P0's expected value at equilibrium
