"""Cards, hand evaluation, observations, isomorphism, streets."""

from . import cards, evaluator, streets
from .cards import (
    ALL_CARDS,
    card,
    card_str,
    cards_str,
    hand_u64,
    parse_card,
    parse_cards,
    rank_of,
    suit_masks,
    suit_masks_np,
    suit_of,
)
from .evaluator import strength, strength_from_masks

__all__ = [
    "cards", "evaluator", "streets",
    "ALL_CARDS", "card", "card_str", "cards_str", "hand_u64",
    "parse_card", "parse_cards", "rank_of", "suit_masks", "suit_masks_np",
    "suit_of", "strength", "strength_from_masks",
]
