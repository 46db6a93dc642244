"""Street model.

TPU-native counterpart of the reference's ``Street`` enum
(ref: crates/deuce/src/street.rs:21-146). Streets are plain ints so they
can live in jit-compiled state vectors; the combinatorial constants are
the reference's published state-space sizes (ref: street.rs:118-146),
used as oracles for the enumeration kernels.
"""

from __future__ import annotations

from math import comb

PREF, FLOP, TURN, RIVER = 0, 1, 2, 3
STREETS = (PREF, FLOP, TURN, RIVER)
STREET_NAMES = ("preflop", "flop", "turn", "river")

# community cards revealed at/through each street
N_REVEALED = (0, 3, 4, 5)
# cards dealt by the chance edge *into* each street
N_DEALT = (2, 3, 1, 1)


def n_observations(street: int) -> int:
    """Number of (pocket, board) deals per street (ref: street.rs:70-116)."""
    return comb(52, 2) * comb(50, N_REVEALED[street])


# Canonical (suit-isomorphic) counts per street (ref: street.rs:118-146).
N_ISOMORPHISMS = (169, 1_286_792, 13_960_050, 123_156_254)


def next_street(street: int) -> int:
    return min(street + 1, RIVER)
