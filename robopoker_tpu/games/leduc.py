"""Leduc hold'em.

Validation game #3 (ref: crates/leduc/src/game.rs). 6-card deck
{J,Q,K} × {♠,♥} (rank = card // 2), one board card, two betting rounds
(bets 2 then 4), max one raise per round via the Spot state machine
(Open/Checked/Raised/CheckRaised). Showdown: board-pair beats, else high
card, tie pushes. Payoffs mirror Outcome::pot/payoff exactly
(ref: leduc/src/game.rs:57-110).

Infoset = (board rank or None, r1 spot, r2 spot or None, hole rank) —
suits are strategically irrelevant (ref: crates/leduc/src/info.rs).
"""

from __future__ import annotations

from ..mccfr.tree import CHANCE, TERMINAL

CARDS = tuple(range(6))  # rank = c // 2
CHECK, RAISE, FOLD, CALL = "X", "R", "F", "C"

# Spots (position within a betting round), ref: leduc/src/game.rs:5-12
OPEN, CHECKED, RAISED, CHECKRAISED = "O", "X", "R", "XR"
_ACTOR = {OPEN: 0, CHECKRAISED: 0, CHECKED: 1, RAISED: 1}
_RAISED = {RAISED, CHECKRAISED}


def _round_edges(spot):
    """Choices within a round (ref: leduc/src/info.rs choices)."""
    if spot in (OPEN, CHECKED):
        return [(CHECK, "check"), (RAISE, "raise")]
    return [(FOLD, "fold"), (CALL, "call")]


def _apply_round(spot, move):
    """Spot transition; returns (new spot | 'advance' | ('fold', who))."""
    if spot == OPEN:
        return CHECKED if move == "check" else RAISED
    if spot == CHECKED:
        return "advance" if move == "check" else CHECKRAISED
    who = 1 if spot == RAISED else 0
    if move == "fold":
        return ("fold", who)
    return "advance"  # call


class Leduc:
    n_players = 2

    def root(self):
        return ("start",)

    def turn(self, state) -> int:
        tag = state[0]
        if tag in ("start", "dealt", "deal"):
            return CHANCE
        if tag == "over":
            return TERMINAL
        if tag == "r1":
            return _ACTOR[state[2]]
        return _ACTOR[state[4]]  # r2: (tag, holes, board, r1, spot)

    def branches(self, state):
        tag = state[0]
        if tag == "start":
            return [(c, ("dealt", c)) for c in CARDS]
        if tag == "dealt":
            c0 = state[1]
            return [(c, ("r1", (c0, c), OPEN)) for c in CARDS if c != c0]
        if tag == "deal":
            _, holes, r1 = state
            return [
                (c, ("r2", holes, c, r1, OPEN))
                for c in CARDS if c not in holes
            ]
        if tag == "r1":
            _, holes, spot = state
            out = []
            for edge, move in _round_edges(spot):
                res = _apply_round(spot, move)
                if res == "advance":
                    nspot = spot if move == "call" else CHECKED
                    out.append((edge, ("deal", holes, nspot)))
                elif isinstance(res, tuple):
                    out.append((edge, ("over", holes, ("fold1", res[1]))))
                else:
                    out.append((edge, ("r1", holes, res)))
            return out
        # r2
        _, holes, board, r1, spot = state
        out = []
        for edge, move in _round_edges(spot):
            res = _apply_round(spot, move)
            if res == "advance":
                r2 = spot if move == "call" else CHECKED
                out.append((edge, ("over", holes, ("showdown", board, r1, r2))))
            elif isinstance(res, tuple):
                out.append((edge, ("over", holes, ("fold2", board, r1, res[1]))))
            else:
                out.append((edge, ("r2", holes, board, r1, res)))
        return out

    def payoff(self, state, player: int) -> float:
        _, holes, outcome = state
        kind = outcome[0]
        if kind == "fold1":
            who = outcome[1]
            return -1.0 if player == who else 1.0
        if kind == "fold2":
            _, board, r1, who = outcome
            base = 3.0 if r1 in _RAISED else 1.0
            return -base if player == who else base
        _, board, r1, r2 = outcome
        base = 3.0 if r1 in _RAISED else 1.0
        extra = 4.0 if r2 in _RAISED else 0.0
        pot = base + extra
        br = board // 2
        r = [holes[0] // 2, holes[1] // 2]
        pair = [r[0] == br, r[1] == br]
        if pair[0] != pair[1]:
            winner = 0 if pair[0] else 1
        elif r[0] != r[1]:
            winner = 0 if r[0] > r[1] else 1
        else:
            return 0.0
        return pot if player == winner else -pot

    def info(self, state):
        tag = state[0]
        if tag == "r1":
            _, holes, spot = state
            actor = _ACTOR[spot]
            return (None, spot, None, holes[actor] // 2)
        _, holes, board, r1, spot = state
        actor = _ACTOR[spot]
        return (board // 2, r1, spot, holes[actor] // 2)
