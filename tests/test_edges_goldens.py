"""Bet-sizing grid goldens (ref: crates/kicker/src/size.rs tests:
raises_grid_counts, preflop_opening_uses_bbs, into_chips_*,
from_chips_snaps_to_nearest)."""

import numpy as np

from robopoker_tpu.kicker import edges as E
from robopoker_tpu.pokerkit.constants import B_BLIND, OPENS, RAISES


def n_raises(street, depth):
    menu = E.MENU_PLURIBUS[street, depth]
    return int((menu != E.EMPTY).sum())


def test_raises_grid_counts():
    # ref: size.rs raises_grid_counts — exact slot counts per street/depth
    assert n_raises(0, 0) == 4   # preflop opens: 2BB 3BB 4BB 5BB
    assert n_raises(0, 1) == 2   # 1:1, 2:1
    assert n_raises(0, 2) == 1   # 1:1
    assert n_raises(0, 3) == 1
    assert n_raises(1, 0) == 5   # flop: 1/4 1/2 3/4 1:1 2:1
    assert n_raises(1, 1) == 2   # 1/2, 1:1
    assert n_raises(1, 2) == 1   # 1:1
    assert n_raises(2, 0) == 4   # turn: 1/3 1/2 1:1 2:1
    assert n_raises(2, 1) == 2   # 1:1, 2:1
    assert n_raises(2, 2) == 1
    assert n_raises(3, 0) == 4   # river mirrors turn
    assert n_raises(3, 1) == 2
    assert n_raises(3, 2) == 1


def test_preflop_opens_are_bb_relative():
    # ref: size.rs preflop_opening_uses_bbs + into_chips_bbs — the four
    # opening slots are flat BB multiples, independent of pot
    menu = E.MENU_PLURIBUS[0, 0]
    codes = menu[menu != E.EMPTY]
    for code, bbs in zip(codes, OPENS):
        chips_small = E.edge_chips_np(np.asarray([code]), np.asarray([3]))[0]
        chips_big = E.edge_chips_np(np.asarray([code]), np.asarray([50]))[0]
        assert chips_small == chips_big == bbs * B_BLIND


def test_postflop_raises_are_pot_relative():
    # ref: size.rs postflop_uses_spr + into_chips_spr — flop depth-0
    # slots scale with the pot at the RAISES fractions
    menu = E.MENU_PLURIBUS[1, 0]
    codes = menu[menu != E.EMPTY]
    fracs = [(1, 4), (1, 2), (3, 4), (1, 1), (2, 1)]
    for code, (num, den) in zip(codes, fracs):
        pot = 120
        chips = E.edge_chips_np(np.asarray([code]), np.asarray([pot]))[0]
        assert chips == pot * num // den
        assert (num, den) in RAISES


def test_edge_codes_bijective():
    # ref: size.rs bijective_u8 — every non-empty menu code decodes to a
    # unique (street-independent) size and survives the name round trip
    codes = sorted(set(
        int(c) for c in E.MENU_PLURIBUS.reshape(-1) if c != E.EMPTY
    ))
    names = [E.edge_name(c) for c in codes]
    assert len(set(names)) == len(codes)
    chips = E.edge_chips_np(np.asarray(codes), np.full(len(codes), 1200))
    pairs = {(n, int(ch)) for n, ch in zip(names, chips)}
    assert len(pairs) == len(codes)
