"""Card-abstraction bucket providers for the NLHE solver.

TPU-native counterpart of the reference's ``Abstraction`` u16 id —
``[8b street | 8b index]`` (ref: crates/kicker/src/abstraction.rs:20-67) —
and the ``NlheEncoder``'s iso→bucket lookup
(ref: crates/nlhe/src/encoder.rs:23-60).

Two providers:

- :func:`proxy_bucket` — a cheap deterministic stand-in used until the
  k-means artifacts exist: preflop = the 169 canonical hole classes;
  postflop = made-hand category × top-rank quantile. Weak but
  well-defined; lets the blueprint trainer run end-to-end.
- :class:`LookupBucket` — the production path: gathers the trained
  k-means cluster id from a per-street array indexed by the canonical
  isomorphism index (built by robopoker_tpu.lloyd).

Both return the reference's packed u16: ``street << 8 | index``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..deuce.cards import suit_masks
from ..deuce.evaluator import strength_from_masks


def preflop_class(hole: jnp.ndarray) -> jnp.ndarray:
    """169-class canonical preflop index from hole cards [..., 2].

    Classes: pairs (13), suited (78), offsuit (78) → encoded as the
    standard 13x13 matrix index: row=hi, col=lo for suited/pair upper
    triangle, mirrored for offsuit.
    """
    r = hole >> 2
    s = hole & 3
    hi = jnp.maximum(r[..., 0], r[..., 1]).astype(jnp.int32)
    lo = jnp.minimum(r[..., 0], r[..., 1]).astype(jnp.int32)
    suited = s[..., 0] == s[..., 1]
    # matrix encoding: suited → [hi, lo] above diagonal; offsuit → below
    return jnp.where(suited, hi * 13 + lo, lo * 13 + hi)


def proxy_bucket(hole: jnp.ndarray, board: jnp.ndarray,
                 street: jnp.ndarray) -> jnp.ndarray:
    """Deterministic cheap bucket (u16 ``street<<8 | index``), index < 256.

    Preflop: 169 canonical classes (clipped into 8 bits via modulo-free
    mapping ≤ 168). Postflop: evaluator category (0..8) × 13 primary-rank
    + board-pairing bit → ≤ 234.
    """
    pre = preflop_class(hole)
    pre_idx = jnp.where(pre > 255, 255, pre)  # 169 ≤ 255, no-op guard

    b = hole.shape[0]
    cards = jnp.concatenate([hole, board], axis=-1)
    code = strength_from_masks(suit_masks(cards))
    category = (code >> 21) & 0xF       # 0..8
    primary = (code >> 17) & 0xF        # 0..12
    # does the board alone make the hand (e.g. board pair)?
    bcode = strength_from_masks(suit_masks(board))
    board_made = ((bcode >> 21) & 0xF) == category
    post_idx = category * 26 + primary * 2 + board_made.astype(jnp.int32)

    idx = jnp.where(street == 0, pre_idx, post_idx)
    return (street.astype(jnp.int32) << 8) | idx


class LookupBucket:
    """k-means artifact lookup: canonical iso index → cluster id.

    Holds per-street uint16 arrays produced by the lloyd pipeline. The
    canonical index kernel lives in robopoker_tpu.deuce.isomorphism.
    """

    def __init__(self, tables: dict):
        self.tables = tables  # street -> jnp.ndarray[u16]

    def __call__(self, hole, board, street):
        raise NotImplementedError(
            "wired up once the abstraction pipeline lands (lloyd)"
        )
