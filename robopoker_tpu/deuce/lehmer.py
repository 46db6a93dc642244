"""Deal-order (permutation) coding for replay and wire formats.

TPU-native counterpart of the reference's ``Lehmer``/``CardSeq``
(ref: crates/deuce/src/lehmer.rs:17-70, hand_seq.rs:19): ≤5-card deal
orders pack into one byte via the factorial number system (5! = 120 <
256). Host-side only — replay/UI bookkeeping never touches the device.
"""

from __future__ import annotations

FACTORIALS = (1, 1, 2, 6, 24, 120)


def lehmer_encode(order: list[int]) -> int:
    """Permutation (≤5 distinct items) → Lehmer code byte."""
    n = len(order)
    assert n <= 5
    code = 0
    for i in range(n):
        smaller = sum(1 for j in range(i + 1, n) if order[j] < order[i])
        code += smaller * FACTORIALS[n - 1 - i]
    return code


def lehmer_decode(code: int, sorted_items: list[int]) -> list[int]:
    """Lehmer code + sorted item set → original deal order."""
    items = list(sorted_items)
    n = len(items)
    out = []
    for i in range(n):
        f = FACTORIALS[n - 1 - i]
        idx = code // f
        code %= f
        out.append(items.pop(idx))
    return out


def encode_deal(cards: list[int]) -> tuple[int, list[int]]:
    """Cards in dealt order → (lehmer byte, sorted cards). The sorted set
    plus the byte reconstructs the exact deal order."""
    ranks = sorted(range(len(cards)), key=lambda i: cards[i])
    inv = [0] * len(cards)
    for pos, i in enumerate(ranks):
        inv[i] = pos
    return lehmer_encode(inv), sorted(cards)


def decode_deal(code: int, sorted_cards: list[int]) -> list[int]:
    return lehmer_decode(code, sorted_cards)
