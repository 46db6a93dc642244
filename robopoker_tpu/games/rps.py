"""Rock-Paper-Scissors with asymmetric scissors payoff.

Validation game #1 (ref: crates/roshambo/src/game.rs:1-79). Scissors
outcomes are scaled by ASYMMETRIC_UTILITY=2.0, shifting the equilibrium
off uniform to (0.4, 0.4, 0.2) — a known closed form used as the
convergence oracle (ref: crates/roshambo/src/solver.rs:83-120).

P2 moves "after" P1 but observes nothing: all three P2 nodes share one
infoset (ref: crates/roshambo/src/turn.rs CfrInfo impl).
"""

from __future__ import annotations

from ..mccfr.tree import CHANCE, TERMINAL
from ..pokerkit.constants import ASYMMETRIC_UTILITY

R, P, S = "R", "P", "S"
EDGES = (R, P, S)


class Rps:
    n_players = 2

    def __init__(self, asymmetric_utility: float = ASYMMETRIC_UTILITY):
        self.au = asymmetric_utility

    def root(self):
        return ()

    def turn(self, state) -> int:
        return len(state) if len(state) < 2 else TERMINAL

    def branches(self, state):
        return [(e, state + (e,)) for e in EDGES]

    def payoff(self, state, player: int) -> float:
        a, b = state  # P1, P2 moves
        p_win, s_win = 1.0, self.au
        table = {
            (P, R): p_win, (R, P): -p_win,
            (R, S): s_win, (S, P): s_win,
            (S, R): -s_win, (P, S): -s_win,
        }
        v = table.get((a, b), 0.0)
        return v if player == 0 else -v

    def info(self, state):
        return f"P{len(state) + 1}"


# analytic Nash for the asymmetric game: with scissors payoffs scaled by u,
# equilibrium plays (R, P, S) with probabilities ∝ (u, u, 1) — for u=2:
# (0.4, 0.4, 0.2), game value 0.
def nash(asymmetric_utility: float = ASYMMETRIC_UTILITY) -> dict:
    u = asymmetric_utility
    z = 2 * u + 1
    return {R: u / z, P: u / z, S: 1 / z}
