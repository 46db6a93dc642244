"""Device-resident iso → bucket lookup tables.

TPU-native counterpart of the reference's ``Lookup: BTreeMap<Isomorphism,
Abstraction>`` (ref: crates/lloyd/src/lookup.rs:25-193) and the
``NlheEncoder``'s 138M-row hydrated map (ref: crates/nlhe/src/
encoder.rs:196-215). B-trees don't exist on a TPU; the replacement is an
**open-addressed hash table built exactly on the host** (double-hashed
probing, vectorized claim rounds — a Python insert loop would take half
an hour at the exhaustive turn street's 13.96M keys) and queried on
device with a fixed probe depth: one batched ``[N, probes]`` gather plus
a select, no data-dependent loops.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

PROBES = 8  # device probe depth for small/sampled tables (load ≤ 0.25)


@dataclasses.dataclass
class IsoLookup:
    key1: np.ndarray   # i32 [T]
    key2: np.ndarray   # i32 [T]
    value: np.ndarray  # i32 [T] (bucket id; -1 empty)
    probes: int = PROBES  # device probe depth covering the longest chain
    # which deuce.isomorphism hash keyed this table (1 = legacy linear
    # folds, 2 = per-word fmix chains); queries MUST hash with the same
    # version or every lookup silently misses
    hash_version: int = 1

    @property
    def capacity(self) -> int:
        return len(self.value)

    def device(self) -> "IsoLookup":
        """One-time device residency. ``lookup_device`` calls
        ``jnp.asarray`` on the key/value words; with numpy-backed tables
        every *eager* (non-jit) query re-ships the whole table — ~12 MB
        through the MB/s remote-TPU tunnel per host-chunked dispatch,
        which is what wedged the flop histogram phase. Idempotent on
        already-device tables.

        Big sparse tables ship as compact (slot, h1, h2, val) triplets
        and scatter-fill on device: the exhaustive river street is a
        3.2 GB dense slab at load 0.46, so shipping only residents halves
        the one-time transfer through the MB/s tunnel."""
        if isinstance(self.key1, jnp.ndarray):
            return self
        cap = self.capacity
        occ = np.flatnonzero(np.asarray(self.value) >= 0)
        if len(occ) > 0.75 * cap or cap < (1 << 24):
            return IsoLookup(
                jnp.asarray(self.key1), jnp.asarray(self.key2),
                jnp.asarray(self.value), self.probes, self.hash_version,
            )

        @functools.partial(jax.jit, static_argnames="n")
        def fill(slots, h1, h2, val, n):
            k1 = jnp.zeros(n, jnp.int32).at[slots].set(h1)
            k2 = jnp.zeros(n, jnp.int32).at[slots].set(h2)
            v = jnp.full(n, -1, jnp.int32).at[slots].set(val.astype(jnp.int32))
            return k1, k2, v

        # bucket ids fit in i8/i16 (river equities 0..100, cluster ids
        # 0..255): ship the narrowest dtype through the MB/s tunnel and
        # widen on device — ~370 MB less upload for the river street
        vals = np.asarray(self.value)[occ]
        vdt = (np.int8 if vals.max() <= 127 else
               np.int16 if vals.max() <= 32767 else np.int32)
        k1, k2, v = fill(
            jnp.asarray(occ.astype(np.int32)),
            jnp.asarray(np.asarray(self.key1)[occ]),
            jnp.asarray(np.asarray(self.key2)[occ]),
            jnp.asarray(vals.astype(vdt)),
            cap,
        )
        return IsoLookup(k1, k2, v, self.probes, self.hash_version)

    def compact(self) -> dict:
        """Occupied-slot triplets for artifact files — an exhaustive
        street's table is mostly structure (load 0.5), so persisting
        (h1, h2, value) of residents halves the file.

        ``lookup_slot`` persists each resident's placement so the load
        path reconstructs the table with three scatter fills instead of
        re-running the claim rounds — ``build_lookup`` over the river
        street's 123M keys takes ~13 min of host CPU, which made every
        artifact load unusable. ``lookup_probes`` keeps the device query
        depth that covers the longest chain."""
        occ = np.flatnonzero(np.asarray(self.value) >= 0)
        return {
            "lookup_h1": np.asarray(self.key1)[occ],
            "lookup_h2": np.asarray(self.key2)[occ],
            "lookup_val": np.asarray(self.value)[occ].astype(np.int32),
            "lookup_slot": occ.astype(np.int64),
            "lookup_capacity": np.int64(self.capacity),
            "lookup_probes": np.int32(self.probes),
            "hash_version": np.int32(self.hash_version),
        }


def _chain_slots(h1, h2, depth, mask):
    """Double-hashed candidate slot at probe offset ``depth``: odd stride
    from h2 guarantees a full cycle on a power-of-two table (same scheme
    as the trainer's nlhe/table.py probe_rows)."""
    base = (h1.astype(np.int64) ^ h2.astype(np.int64)) & mask
    stride = ((h2.astype(np.int64) << 1) | 1)
    return (base + depth * stride) & mask


def build_lookup(h1: np.ndarray, h2: np.ndarray, values: np.ndarray,
                 load: float = 0.5, max_probes: int = 64,
                 hash_version: int = 1) -> IsoLookup:
    """Host-side exact insert, vectorized.

    Claim rounds: every unplaced key proposes its depth-d candidate slot;
    keys whose slot already holds their own key are done (idempotent
    rebuild), unique claimants of empty slots win them, losers advance to
    depth d+1. Rounds ≈ the longest probe chain (~log of the key count at
    load 0.5), each O(pending) numpy work.
    """
    h1 = np.asarray(h1, np.int32)
    h2 = np.asarray(h2, np.int32)
    values = np.asarray(values, np.int32)
    n = len(values)
    cap = 1 << int(np.ceil(np.log2(max(n / load, 16))))
    mask = cap - 1
    k1 = np.zeros(cap, np.int32)
    k2 = np.zeros(cap, np.int32)
    val = np.full(cap, -1, np.int32)
    pending = np.arange(n)
    depth = np.int64(0)
    max_depth = 0
    while len(pending):
        if depth >= max_probes:
            return build_lookup(h1, h2, values, load=load / 2,
                                max_probes=max_probes,
                                hash_version=hash_version)
        s = _chain_slots(h1[pending], h2[pending], depth, mask)
        mine = (val[s] >= 0) & (k1[s] == h1[pending]) & (k2[s] == h2[pending])
        free = np.flatnonzero(val[s] < 0)
        if len(free):
            _, first = np.unique(s[free], return_index=True)
            win = free[first]
            ws = s[win]
            k1[ws] = h1[pending[win]]
            k2[ws] = h2[pending[win]]
            val[ws] = values[pending[win]]
            placed = np.zeros(len(pending), bool)
            placed[win] = True
            mine = mine | placed
        if mine.any():
            val[s[mine]] = values[pending[mine]]  # idempotent overwrite
            max_depth = int(depth)
        pending = pending[~mine]
        depth += 1
    probes = max(1, max_depth + 1)
    return IsoLookup(k1, k2, val, probes=probes, hash_version=hash_version)


def lookup_device(table: IsoLookup, h1: jnp.ndarray, h2: jnp.ndarray,
                  default: int = 0) -> jnp.ndarray:
    """Device query: [N] hash pairs → [N] bucket ids (default if absent).

    One batched ``[N, probes]`` gather over the double-hashed candidate
    ladder; the host build sized ``table.probes`` to the longest real
    chain, so every present key is reachable.
    """
    cap = table.capacity
    k1 = jnp.asarray(table.key1)
    k2 = jnp.asarray(table.key2)
    val = jnp.asarray(table.value)
    mask = cap - 1
    base = (h1 ^ h2) & mask
    stride = (h2 << 1) | 1
    offs = jnp.arange(table.probes, dtype=jnp.int32)
    cand = (base[..., None] + offs * stride[..., None]) & mask
    k1c = k1[cand]
    k2c = k2[cand]
    vc = val[cand]
    hit = (k1c == h1[..., None]) & (k2c == h2[..., None]) & (vc >= 0)
    any_hit = hit.any(-1)
    pick = jnp.argmax(hit, axis=-1)
    out = jnp.take_along_axis(vc, pick[..., None], axis=-1)[..., 0]
    return jnp.where(any_hit, out, jnp.int32(default))


def verify_probe_depth(table: IsoLookup) -> int:
    """Max probe distance of any resident key from its home slot (host
    audit; must be < table.probes for device queries to see every key)."""
    occ = np.flatnonzero(np.asarray(table.value) >= 0)
    if not len(occ):
        return 0
    h1 = np.asarray(table.key1)[occ]
    h2 = np.asarray(table.key2)[occ]
    mask = table.capacity - 1
    unplaced = np.ones(len(occ), bool)
    worst = 0
    for d in range(table.probes):
        s = _chain_slots(h1, h2, np.int64(d), mask)
        here = unplaced & (s == occ)
        if here.any():
            worst = d
        unplaced &= ~here
        if not unplaced.any():
            return worst
    raise AssertionError("resident key unreachable within table.probes")


def load_lookup(z) -> IsoLookup | None:
    """Read a lookup from an open .npz: the compact triplet format
    (lookup_h1/h2/val — rebuilt exactly via build_lookup) or the legacy
    dense-slab format (lookup_key1/key2/value, linear probing era —
    rebuilt too so the probing scheme matches the current code)."""
    version = int(z["hash_version"]) if "hash_version" in z.files else 1
    if "lookup_slot" in z.files:
        # stored placement: reconstruct by direct scatter fill (no claim
        # rounds — the 123M-key river rebuild took ~13 min of host CPU)
        cap = int(z["lookup_capacity"])
        slots = z["lookup_slot"]
        k1 = np.zeros(cap, np.int32)
        k2 = np.zeros(cap, np.int32)
        val = np.full(cap, -1, np.int32)
        k1[slots] = z["lookup_h1"]
        k2[slots] = z["lookup_h2"]
        val[slots] = z["lookup_val"].astype(np.int32)
        return IsoLookup(k1, k2, val, probes=int(z["lookup_probes"]),
                         hash_version=version)
    if "lookup_h1" in z.files:
        return build_lookup(z["lookup_h1"], z["lookup_h2"], z["lookup_val"],
                            hash_version=version)
    if "lookup_key1" in z.files:
        occ = z["lookup_value"] >= 0
        return build_lookup(z["lookup_key1"][occ], z["lookup_key2"][occ],
                            z["lookup_value"][occ], hash_version=version)
    return None
