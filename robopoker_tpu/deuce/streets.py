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


def deck_size(shortdeck: bool = False) -> int:
    """52-card standard deck, or the 36-card short deck (6 through Ace;
    ref: the reference's ``shortdeck`` cargo feature)."""
    return 36 if shortdeck else 52


def n_observations(street: int, shortdeck: bool = False) -> int:
    """Number of (pocket, board) deals per street (ref: street.rs:70-116;
    shortdeck variants street.rs:168-175)."""
    d = deck_size(shortdeck)
    return comb(d, 2) * comb(d - 2, N_REVEALED[street])


def n_children(street: int, shortdeck: bool = False) -> int:
    """Chance-edge fanout into the NEXT street: remaining-card combos
    (ref: street.rs:148-157 / shortdeck 149-156). River is terminal."""
    if street == RIVER:
        raise ValueError("river is terminal")
    d = deck_size(shortdeck)
    return comb(d - 2 - N_REVEALED[street], N_DEALT[street + 1])


# Canonical (suit-isomorphic) counts per street (ref: street.rs:118-146;
# shortdeck table street.rs:159-166).
N_ISOMORPHISMS = (169, 1_286_792, 13_960_050, 123_156_254)
N_ISOMORPHISMS_SHORTDECK = (81, 186_696, 1_340_856, 7_723_728)


def n_isomorphisms(street: int, shortdeck: bool = False) -> int:
    return (N_ISOMORPHISMS_SHORTDECK if shortdeck else N_ISOMORPHISMS)[street]


# Frontend abstraction-grid dimensions (rows, cols) per street
# (ref: street.rs:179-188).
DIMENSIONS = ((13, 13), (16, 8), (12, 12), (10, 10))


def next_street(street: int) -> int:
    return min(street + 1, RIVER)
