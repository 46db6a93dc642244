"""Independent pure-Python hand evaluator used as a differential oracle.

Deliberately written with a *different algorithm* (sorted rank-count
decomposition) than the framework's bitwise kernel so that shared bugs are
unlikely. Semantics follow standard poker with the reference's two quirks
mirrored where the framework mirrors them (flush compares by top rank
only; kickers are a rank mask).
"""

from collections import Counter

HIGH_CARD, ONE_PAIR, TWO_PAIR, THREE_OAK, STRAIGHT, FLUSH, FULL_HOUSE, FOUR_OAK, STRAIGHT_FLUSH = range(9)


def _straight_high(rankset):
    best = -1
    for hi in range(12, 3, -1):
        if all((hi - i) in rankset for i in range(5)):
            best = hi
            break
    if best < 0 and {12, 0, 1, 2, 3} <= rankset:
        best = 3  # wheel: A2345 plays as five-high
    return best


def evaluate(cards):
    """cards: list of ints (rank*4+suit) -> (code, primary, secondary, kicker_mask)."""
    ranks = [c >> 2 for c in cards]
    suits = [c & 3 for c in cards]
    rankset = set(ranks)
    counts = Counter(ranks)
    # group ranks by multiplicity, highest rank first
    by_count = lambda n: sorted((r for r, c in counts.items() if c >= n), reverse=True)

    flush_suit = next((s for s in range(4) if suits.count(s) >= 5), None)
    flush_ranks = (
        sorted((r for r, s in zip(ranks, suits) if s == flush_suit), reverse=True)
        if flush_suit is not None else []
    )

    def kickmask(exclude, k):
        ks = sorted((r for r in rankset if r not in exclude), reverse=True)[:k]
        m = 0
        for r in ks:
            m |= 1 << r
        return m

    if flush_suit is not None:
        sf = _straight_high(set(flush_ranks))
        if sf >= 0:
            return (STRAIGHT_FLUSH, sf, 0, 0)
    quads = by_count(4)
    if quads:
        return (FOUR_OAK, quads[0], 0, kickmask({quads[0]}, 1))
    trips = by_count(3)
    pairs = by_count(2)
    if trips and len(pairs) >= 2:  # second pair may itself be trips
        pair = max(r for r in pairs if r != trips[0])
        return (FULL_HOUSE, trips[0], pair, 0)
    if flush_suit is not None:
        return (FLUSH, flush_ranks[0], 0, 0)
    st = _straight_high(rankset)
    if st >= 0:
        return (STRAIGHT, st, 0, 0)
    if trips:
        return (THREE_OAK, trips[0], 0, kickmask({trips[0]}, 2))
    if len(pairs) >= 2:
        hi, lo = pairs[0], pairs[1]
        return (TWO_PAIR, hi, lo, kickmask({hi, lo}, 1))
    if pairs:
        return (ONE_PAIR, pairs[0], 0, kickmask({pairs[0]}, 3))
    hi = max(rankset)
    return (HIGH_CARD, hi, 0, kickmask({hi}, 4))


def packed(cards):
    code, p, s, k = evaluate(cards)
    return (code << 21) | (p << 17) | (s << 13) | k
