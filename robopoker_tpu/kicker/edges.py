"""Abstract edge coding and bet-sizing menus.

TPU-native counterpart of the reference's ``Edge``/``Size``/``Path``
types (ref: crates/kicker/src/edge.rs, size.rs:40-150, path.rs:22-48).
Edges are 5-bit integer codes; the per-(street, aggression) raise menus
are baked into a static numpy table so the batched engine can gather a
node's action set without control flow.

Code space (5 bits, 0 = empty/padding so packed paths are self-delimiting):

====  =======================
0     EMPTY (padding)
1     DRAW  (chance)
2     FOLD
3     CHECK
4     CALL
5     SHOVE
6-9   OPEN(2/3/4/5 bb)        (preflop depth-0 only; ref OPENS)
10-19 RAISE(RAISES[i])        pot-fraction grid index i
====  =======================

Aggression ("depth") counts trailing aggressive edges (code ≥ 5) in the
current street, selecting menu row ``street*3 + min(depth, 2)``; depth >
MAX_RAISE_REPEATS empties the raise menu entirely (ref: size.rs:97-150).

The fixed MCCFR action axis is 9 columns:
``0=Fold 1=Check 2=Call 3=Shove 4..8=menu raise slots``
(max menu width is 5: the Flop/0 cell; ref: pokerkit/src/lib.rs:118).
"""

from __future__ import annotations

import numpy as np

from ..pokerkit.constants import (
    B_BLIND,
    MAX_RAISE_REPEATS,
    OPENS,
    PLURIBUS_INDICES,
    RAISES,
    SLUMBOT_INDICES,
)

EMPTY, DRAW, FOLD, CHECK, CALL, SHOVE = 0, 1, 2, 3, 4, 5
OPEN_BASE = 6     # OPEN(OPENS[i]) = 6 + i
RAISE_BASE = 10   # RAISE(RAISES[i]) = 10 + i

N_COLS = 9        # fixed action axis
N_RAISE_SLOTS = 5
COL_FOLD, COL_CHECK, COL_CALL, COL_SHOVE = 0, 1, 2, 3
COL_RAISE0 = 4

# aggression cells: 0, 1, 2, 3, 4+ (4+ ⇒ empty menu)
N_DEPTH_CELLS = 5


def is_aggressive(code: int) -> bool:
    return code >= SHOVE


def edge_name(code: int) -> str:
    if code == EMPTY:
        return "·"
    if code == DRAW:
        return "Draw"
    if code == FOLD:
        return "Fold"
    if code == CHECK:
        return "Check"
    if code == CALL:
        return "Call"
    if code == SHOVE:
        return "Shove"
    if OPEN_BASE <= code < RAISE_BASE:
        return f"Open{OPENS[code - OPEN_BASE]}bb"
    n, d = RAISES[code - RAISE_BASE]
    return f"Raise{n}:{d}"


def build_menu(regime: str = "pluribus") -> np.ndarray:
    """[4 streets, 5 depth cells, 5 slots] edge codes (0 = empty slot)."""
    menu = np.zeros((4, N_DEPTH_CELLS, N_RAISE_SLOTS), dtype=np.int32)
    for street in range(4):
        for depth in range(N_DEPTH_CELLS):
            if depth > MAX_RAISE_REPEATS:
                continue  # empty menu (ref: size.rs:97)
            if regime == "pluribus":
                if street == 0 and depth == 0:
                    codes = [OPEN_BASE + i for i in range(len(OPENS))]
                else:
                    row = street * 3 + min(depth, 2)
                    codes = [RAISE_BASE + i for i in PLURIBUS_INDICES[row]]
            else:
                codes = [RAISE_BASE + i for i in SLUMBOT_INDICES]
            for s, c in enumerate(codes):
                menu[street, depth, s] = c
    return menu


MENU_PLURIBUS = build_menu("pluribus")
MENU_SLUMBOT = build_menu("slumbot")

# raise chip fractions: for code c, chips = numer[c] * pot // denom[c]
# (opens are BB-absolute: chips = OPENS[i] * B_BLIND, pot-independent)
_numer = np.zeros(32, dtype=np.int64)
_denom = np.ones(32, dtype=np.int64)
_flat = np.zeros(32, dtype=np.int64)  # absolute chip amounts (opens)
for i, (n, d) in enumerate(RAISES):
    _numer[RAISE_BASE + i] = n
    _denom[RAISE_BASE + i] = d
for i, n in enumerate(OPENS):
    _flat[OPEN_BASE + i] = n * B_BLIND
EDGE_NUMER = _numer
EDGE_DENOM = _denom
EDGE_FLAT = _flat


def edge_chips_np(code: np.ndarray, pot: np.ndarray) -> np.ndarray:
    """Nominal chip amount of an aggressive edge before legality snapping.

    Pot-fraction raises truncate like the reference's f32 cast
    (ref: edge.rs into_chips: ``(pot * frac) as Chips`` — float truncation;
    exact integer ``pot*n//d`` matches for all pot ≤ 2*STACK since
    pot*n ≤ 4000*3 is exactly representable in f32).
    """
    return (EDGE_FLAT[code] + EDGE_NUMER[code] * pot // EDGE_DENOM[code]).astype(np.int64)


def pack_path(codes) -> int:
    """Pack ≤12 5-bit edge codes into one int (ref: path.rs:22-48)."""
    out = 0
    for i, c in enumerate(codes[:12]):
        out |= int(c) << (5 * i)
    return out


def unpack_path(packed: int) -> list[int]:
    out = []
    for i in range(12):
        c = (packed >> (5 * i)) & 0x1F
        if c == EMPTY:
            break
        out.append(c)
    return out
