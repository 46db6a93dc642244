"""Hierarchical abstraction pipeline (streets clustered in reverse).

TPU-native counterpart of the reference's PreTraining / Layer::cluster
orchestration (ref: crates/forge/src/pretraining.rs:21-63,
crates/lloyd/src/layer.rs:195-246): Rive → Turn → Flop → Pref, each
street consuming the next street's artifacts:

- river:   equity quantization (no clustering; 101 buckets)
- turn:    101-bin equity histograms → k-means (1D-EMD variation)
- flop:    256-bin turn-cluster histograms → k-means (Sinkhorn over the
           turn centroid metric)
- preflop: 169 canonical classes → flop-cluster histograms → artifacts

Artifacts per street (the reference's Artifacts{Lookup, Metric, Future},
ref: layer.rs:62-115): an iso→bucket lookup table, the K×K centroid
metric (next street's Sinkhorn ground cost), and centroid transition
histograms.

Scale: the full sweep (14M turn / 1.3M flop isos) is a long TPU run
driven by :func:`enumerate_boards` chunks; ``sample_per_street`` trains
reduced artifacts for tests and bring-up.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..deuce.isomorphism import HASH_VERSION, canonical_key, hash_key
from ..pokerkit.hyperparams import KmeansHyperParams, SinkhornHyperParams
from .histogram import child_cluster_histograms, turn_histograms
from .kmeans import EmdSpec, KmeansResult, cluster
from .lookup import IsoLookup, build_lookup
from .sinkhorn import sinkhorn_cost, variation_distance


@dataclasses.dataclass
class StreetArtifacts:
    """Per-street clustering output (ref Artifacts, layer.rs:62-115)."""

    street: int
    centroids: np.ndarray       # [K, bins]
    lookup: IsoLookup           # canonical-iso hash → cluster id
    metric: np.ndarray          # [K, K] pairwise centroid distances
    assignment: np.ndarray      # [N] cluster per training point
    # training points themselves (optional; scripts/backfill_points.py
    # adds them to older artifacts) — lets topology queries sample a
    # concrete example observation from any bucket
    pocket: np.ndarray | None = None   # [N, 2]
    board: np.ndarray | None = None    # [N, 3|4]


def load_street_artifacts(path) -> dict:
    """Load {street: StreetArtifacts} from a directory of
    flop.npz/turn.npz files (shared by `convert` and the HTTP topology
    scope)."""
    import pathlib

    out = {}
    for street, name in ((0, "preflop"), (1, "flop"), (2, "turn"),
                         (3, "river")):
        p = pathlib.Path(path) / f"{name}.npz"
        if not p.exists():
            continue
        with np.load(p) as z:
            from .lookup import load_lookup

            out[street] = StreetArtifacts(
                street, z["centroids"], load_lookup(z),
                z["metric"], z["assignment"],
                pocket=z["pocket"] if "pocket" in z.files else None,
                board=z["board"] if "board" in z.files else None,
            )
    return out


def sample_observations(key, n: int, n_board: int, rng_seed: int = 0):
    """Random (pocket, board) observations as numpy arrays."""
    rng = np.random.default_rng(rng_seed)
    deals = np.stack([rng.permutation(52)[: 2 + n_board] for _ in range(n)])
    return deals[:, :2].astype(np.int32), deals[:, 2:].astype(np.int32)


def dedupe_canonical(pocket: np.ndarray, board: np.ndarray,
                     chunk: int = 1 << 20):
    """Keep one representative per canonical class; return arrays + hashes.

    Host-chunked device dispatches: the exhaustive turn street passes
    13.96M points — one giant canonical_key call would hold the whole
    24-permutation workspace at once and take minutes per dispatch
    (remote-tunnel wedging risk, CLAUDE.md)."""
    words = np.concatenate([
        np.ascontiguousarray(canonical_key(
            jnp.asarray(pocket[i:i + chunk]), jnp.asarray(board[i:i + chunk])
        ))
        for i in range(0, len(pocket), chunk)
    ])
    _, idx = np.unique(
        words.view([("", words.dtype)] * words.shape[1]).ravel(),
        return_index=True,
    )
    idx = np.sort(idx)
    h1, h2 = hash_key(jnp.asarray(words[idx]))
    return pocket[idx], board[idx], np.asarray(h1), np.asarray(h2)


def _build_points_device(feat_fn, pocket: np.ndarray, board: np.ndarray,
                         chunk: int, bins: int, label: str):
    """Build [N_pad, bins] feature histograms directly into a single
    device-resident buffer via donated dynamic_update_slice fills.

    The exhaustive turn street is 14M x 101 f32 = 5.6 GB: materializing
    the features on host and re-shipping them through the MB/s remote
    tunnel (the old np.concatenate path) would take hours and double HBM
    peak. Pad rows repeat row 0 (real observations) and are weight-masked
    out of the centroid update by the caller."""
    n = len(pocket)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad > n:
        pocket = np.concatenate([pocket, np.repeat(pocket[:1], n_pad - n, 0)])
        board = np.concatenate([board, np.repeat(board[:1], n_pad - n, 0)])
    buf = jnp.zeros((n_pad, bins), jnp.float32)
    fill = jax.jit(
        lambda b, x, i: jax.lax.dynamic_update_slice(b, x, (i, 0)),
        donate_argnums=0,
    )
    import time as _time

    t0 = _time.time()
    for i in range(0, n_pad, chunk):
        x = feat_fn(jnp.asarray(pocket[i:i + chunk]),
                    jnp.asarray(board[i:i + chunk]))
        buf = fill(buf, x, jnp.int32(i))
        if (i // chunk) % 128 == 0:
            print(f"  {label} {i}/{n} ({_time.time()-t0:.0f}s)", flush=True)
    valid = (jnp.arange(n_pad) < n).astype(jnp.float32)
    return buf, valid, n


def cluster_turn(pocket: np.ndarray, board4: np.ndarray, k: int,
                 key, chunk: int = 2048,
                 hp: KmeansHyperParams = KmeansHyperParams(),
                 checkpoint_dir=None) -> StreetArtifacts:
    """Turn street: equity histograms + variation-EMD k-means
    (configs: K=256, 32 iters; ref: pokerkit/src/lib.rs:185-191)."""
    pocket, board4, h1, h2 = dedupe_canonical(pocket, board4)
    points, valid, n = _build_points_device(
        turn_histograms, pocket, board4, chunk, 101, "turn histograms"
    )
    res = cluster(points, k, EmdSpec("variation"), key, hp, chunk=chunk,
                  weights=valid, checkpoint_dir=checkpoint_dir)
    assignment = res.assignment[:n]
    lookup = build_lookup(h1, h2, assignment.astype(np.int32),
                          hash_version=HASH_VERSION)
    c = jnp.asarray(res.centroids)
    metric = np.asarray(variation_distance(c[:, None, :], c[None, :, :]))
    return StreetArtifacts(2, res.centroids, lookup, metric, assignment)


def build_river(pocket: np.ndarray, board5: np.ndarray,
                chunk: int = 4096) -> StreetArtifacts:
    """River street: exact-equity buckets, no clustering
    (ref: crates/lloyd/src/lookup.rs:177-193 — ``grow(Rive)`` tabulates
    ``iso.equity()`` per isomorphism; crates/kicker/src/abstraction.rs:89
    quantizes to 0..=100). The artifact is the reference's 3.02 GB river
    table re-shaped as a hash lookup: canonical iso → equity bucket."""
    pocket, board5, h1, h2 = dedupe_canonical(pocket, board5)
    from ..deuce.observation import equity_bucket, river_equity

    @jax.jit
    def one(p, b):
        return equity_bucket(river_equity(p, b))

    bks = []
    for i in range(0, len(pocket), chunk):
        bks.append(np.asarray(one(
            jnp.asarray(pocket[i:i + chunk]), jnp.asarray(board5[i:i + chunk])
        )))
        if (i // chunk) % 128 == 0:
            print(f"  river equity {i}/{len(pocket)}", flush=True)
    buckets = np.concatenate(bks).astype(np.int32)
    lookup = build_lookup(h1, h2, buckets, hash_version=HASH_VERSION)
    # "centroids" for the river are the 101 one-hot equity bins; the
    # metric is the variation distance between bins = |i - j| / 100
    grid = np.abs(np.arange(101)[:, None] - np.arange(101)[None, :]) / 100.0
    return StreetArtifacts(3, np.eye(101, dtype=np.float32), lookup,
                           grid.astype(np.float32), buckets)


def build_preflop(flop: StreetArtifacts,
                  sinkhorn_hp: SinkhornHyperParams = SinkhornHyperParams()
                  ) -> StreetArtifacts:
    """Preflop street: the 169 canonical hole classes with their
    flop-cluster transition histograms and pairwise Sinkhorn metric
    (ref: crates/forge/src/pretraining.rs:15,48 — PrefLayer produces a
    169-point lookup + metric + future; no clustering, every class is
    its own bucket).

    The histogram of class h is the distribution of flop clusters over
    all C(50,3) = 19,600 child boards; it doubles as the reference's
    ``Future`` transition artifact. Bucket values are
    :func:`robopoker_tpu.nlhe.abstraction.preflop_class` matrix ids so
    topology queries agree with the trainer's street-0 buckets.
    """
    from math import comb

    from .. import native
    from ..deuce.isomorphism import HASH_VERSION
    from ..nlhe.abstraction import preflop_class
    from .lookup import lookup_device

    # one representative pocket per canonical class, via the exhaustive
    # preflop scan (169 — cheap CPU check of the identity path)
    from itertools import combinations

    reps = {}
    for a, b in combinations(range(52), 2):
        cls = int(preflop_class(jnp.asarray([[a, b]]))[0])
        reps.setdefault(cls, (a, b))
    assert len(reps) == 169, len(reps)

    boards = native.enumerate_subsets(0, comb(52, 3), 3).astype(np.int32)
    kf = flop.centroids.shape[0]
    flop_lk = flop.lookup.device()
    from ..deuce.isomorphism import canonical_key, hash_for_version

    hash_fn = hash_for_version(flop_lk.hash_version)
    hist = np.zeros((169, kf), np.float32)
    pockets = np.zeros((169, 2), np.int32)
    for cls, (a, b) in sorted(reps.items()):
        overlap = (boards == a).any(1) | (boards == b).any(1)
        bb = boards[~overlap]
        pk = jnp.broadcast_to(jnp.asarray([a, b], jnp.int32)[None], (len(bb), 2))
        words = canonical_key(pk, jnp.asarray(bb))
        h1, h2 = hash_fn(words)
        cl = np.asarray(lookup_device(flop_lk, h1, h2, default=-1))
        assert (cl >= 0).all(), f"flop lookup miss under class {cls}"
        hist[cls] = np.bincount(cl, minlength=kf) / len(cl)
        pockets[cls] = (a, b)

    # pairwise debiased Sinkhorn metric over the flop ground metric
    h = jnp.asarray(hist)
    cost = jnp.asarray(flop.metric, jnp.float32)
    self_c = sinkhorn_cost(h, h, cost, sinkhorn_hp)
    mu = jnp.repeat(h, 169, axis=0)
    nu = jnp.tile(h, (169, 1))
    xy = sinkhorn_cost(mu, nu, cost, sinkhorn_hp).reshape(169, 169)
    metric = np.asarray(jnp.maximum(
        xy - 0.5 * (self_c[:, None] + self_c[None, :]), 0.0))

    words = canonical_key(jnp.asarray(pockets),
                          jnp.full((169, 0), -1, jnp.int32))
    h1, h2 = hash_key(words)
    lookup = build_lookup(np.asarray(h1), np.asarray(h2),
                          np.arange(169, dtype=np.int32),
                          hash_version=HASH_VERSION)
    return StreetArtifacts(0, hist, lookup, metric,
                           np.arange(169, dtype=np.int32),
                           pocket=pockets,
                           board=np.zeros((169, 0), np.int8))


def cluster_flop(pocket: np.ndarray, board3: np.ndarray, turn: StreetArtifacts,
                 k: int, key, chunk: int = 1024,
                 hp: KmeansHyperParams = KmeansHyperParams(),
                 sinkhorn_hp: SinkhornHyperParams = SinkhornHyperParams(),
                 checkpoint_dir=None, prune_m: int = 0) -> StreetArtifacts:
    """Flop street: turn-cluster histograms + Sinkhorn k-means over the
    turn centroid metric (ref: layer.rs build() + metric dispatch)."""
    pocket, board3, h1, h2 = dedupe_canonical(pocket, board3)
    kt = turn.centroids.shape[0]
    turn_lk = turn.lookup.device()  # ship the lookup table ONCE
    points, valid, n = _build_points_device(
        lambda p, b: child_cluster_histograms(p, b, turn_lk, kt),
        pocket, board3, chunk, kt, "flop histograms",
    )
    spec = EmdSpec("sinkhorn", cost=turn.metric, sinkhorn_hp=sinkhorn_hp,
                   prune_m=prune_m)
    res = cluster(points, k, spec, key, hp, chunk=chunk, weights=valid,
                  checkpoint_dir=checkpoint_dir)
    assignment = res.assignment[:n]
    lookup = build_lookup(h1, h2, assignment.astype(np.int32),
                          hash_version=HASH_VERSION)
    c = jnp.asarray(res.centroids)
    cost = jnp.asarray(turn.metric, jnp.float32)
    kk = c.shape[0]
    mu = jnp.repeat(c, kk, axis=0)
    nu = jnp.tile(c, (kk, 1))
    xy = sinkhorn_cost(mu, nu, cost, sinkhorn_hp).reshape(kk, kk)
    self_c = sinkhorn_cost(c, c, cost, sinkhorn_hp)
    metric = np.asarray(
        jnp.maximum(xy - 0.5 * (self_c[:, None] + self_c[None, :]), 0.0)
    )
    return StreetArtifacts(1, res.centroids, lookup, metric, assignment)
