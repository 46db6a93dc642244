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
    # board-texture bit: paired board (pure mask ops — a second full
    # evaluator call here doubled the cost of every trainer lookup)
    bm = suit_masks(board)
    s0, s1, s2, s3 = (bm[..., i] for i in range(4))
    board_paired = ((s0 & s1) | (s0 & s2) | (s0 & s3)
                    | (s1 & s2) | (s1 & s3) | (s2 & s3)) != 0
    post_idx = category * 26 + primary * 2 + board_paired.astype(jnp.int32)

    idx = jnp.where(street == 0, pre_idx, post_idx)
    return (street.astype(jnp.int32) << 8) | idx


class LookupBucket:
    """Production bucket provider: trained k-means artifacts.

    preflop → the 169 canonical classes; flop/turn → canonical-iso hash
    → cluster lookup from the lloyd pipeline's tables; river → equity
    proxy (the reference's exact 123M-row river table is a full-sweep
    artifact — until that run lands, river falls back to
    :func:`proxy_bucket`'s category features). Canonical classes missing
    from a sampled artifact resolve to cluster 0; `coverage` reports the
    miss rate for a batch of observations.
    """

    def __init__(self, flop_lookup=None, turn_lookup=None, river_lookup=None):
        # device residency up front: eager callers (serving, litmus) would
        # otherwise re-ship the tables on every policy query
        self.flop = flop_lookup.device() if flop_lookup is not None else None
        self.turn = turn_lookup.device() if turn_lookup is not None else None
        self.river = river_lookup.device() if river_lookup is not None else None

    @classmethod
    def load(cls, out_dir):
        """Load artifacts written by scripts/build_abstraction.py."""
        import pathlib

        import numpy as np

        from ..lloyd.lookup import load_lookup

        out = pathlib.Path(out_dir)

        def one(name):
            p = out / f"{name}.npz"
            if not p.exists():
                return None
            with np.load(p) as z:
                return load_lookup(z)

        return cls(flop_lookup=one("flop"), turn_lookup=one("turn"),
                   river_lookup=one("river"))

    def _hashes(self, words):
        """Per-hash-version (h1, h2) pairs, computed once per distinct
        version among the loaded tables (artifacts may mix a legacy v1
        street with a freshly-built v2 one)."""
        from ..deuce.isomorphism import hash_for_version

        versions = {
            t.hash_version for t in (self.flop, self.turn, self.river)
            if t is not None
        }
        return {v: hash_for_version(v)(words) for v in versions}

    def __call__(self, hole, board, street):
        from ..deuce.isomorphism import canonical_key
        from ..lloyd.lookup import lookup_device

        base = proxy_bucket(hole, board, street)
        words = canonical_key(hole, board)
        hashes = self._hashes(words)
        # lookup MISSES (classes outside a sampled artifact) fall back to
        # the proxy bucket — a partial artifact refines where it has data
        # and degrades to the proxy elsewhere, instead of collapsing every
        # uncovered class onto cluster 0 (which would erase nearly all
        # card information at low artifact coverage). Fallback ids are
        # shifted into a disjoint tag range (street+4)<<8 so a proxy
        # index can never alias a trained cluster id on the same street.
        out = base
        for st, table in ((1, self.flop), (2, self.turn), (3, self.river)):
            # river table values ARE the reference abstraction: exact
            # equity quantized 0..=100 (abstraction.rs:89-103) — stored
            # values, not cluster ids; the packed form is identical
            if table is None:
                continue
            h1, h2 = hashes[table.hash_version]
            cl = lookup_device(table, h1, h2, default=-1)
            hit = (street == st) & (cl >= 0)
            out = jnp.where(hit, (st << 8) | jnp.clip(cl, 0, 255), out)
            out = jnp.where((street == st) & (cl < 0), base + (4 << 8), out)
        return out

    def tree(self):
        """Lookup arrays as a pytree, for threading through jit as
        ARGUMENTS. A jitted trainer step that merely closes over the
        tables embeds them as HLO constants — the exhaustive turn table
        (33.5M slots, ~400 MB) blows the remote-compile request limit
        (HTTP 413) and bloats every compile cache entry."""
        out = {}
        for name in ("flop", "turn", "river"):
            t = getattr(self, name)
            if t is not None:
                out[name] = (t.key1, t.key2, t.value)
        return out or None

    def bind(self, tree):
        """A shallow clone whose lookup tables use the given (possibly
        traced) arrays; static probe metadata is kept."""
        import dataclasses

        b = LookupBucket.__new__(LookupBucket)
        for name in ("flop", "turn", "river"):
            t = getattr(self, name)
            if t is not None and name in tree:
                k1, k2, v = tree[name]
                b.__dict__[name] = dataclasses.replace(
                    t, key1=k1, key2=k2, value=v)
            else:
                b.__dict__[name] = t
        return b

    def coverage(self, hole, board, street) -> float:
        """Fraction of observations resolved by a trained table."""
        from ..deuce.isomorphism import canonical_key, hash_for_version
        from ..lloyd.lookup import lookup_device

        import numpy as np

        words = canonical_key(hole, board)
        table = {1: self.flop, 2: self.turn, 3: self.river}.get(
            int(street[0]) if hasattr(street, "__getitem__")
            else int(street))
        if table is None:
            return 0.0
        h1, h2 = hash_for_version(table.hash_version)(words)
        got = np.asarray(lookup_device(table, h1, h2, default=-1))
        return float((got >= 0).mean())
