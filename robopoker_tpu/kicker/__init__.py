"""Batched NLHE game engine (ref: crates/kicker)."""

from . import edges, game
from .edges import MENU_PLURIBUS, MENU_SLUMBOT, build_menu, edge_name
from .game import (
    TableState,
    aggression,
    apply_cols,
    deal_board,
    legal_cols,
    packed_subgame,
    raise_chips,
    root,
    settle,
    to_call,
    to_raise,
    to_shove,
    turn_of,
    TURN_CHANCE,
    TURN_P0,
    TURN_P1,
    TURN_TERMINAL,
)

__all__ = [
    "edges", "game", "MENU_PLURIBUS", "MENU_SLUMBOT", "build_menu",
    "edge_name", "TableState", "aggression", "apply_cols", "deal_board",
    "legal_cols", "packed_subgame", "raise_chips", "root", "settle",
    "to_call", "to_raise", "to_shove", "turn_of", "TURN_CHANCE",
    "TURN_P0", "TURN_P1", "TURN_TERMINAL",
]
