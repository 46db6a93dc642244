"""Topology query layer over the abstraction artifacts.

TPU-native counterpart of the reference portal's topology scope
(ref: crates/portal/src/topology/api.rs): observation↔abstraction
conversion, per-street histograms, EMD distances, example sampling, and
k-nearest/furthest neighbor queries — computed against the in-repo
``StreetArtifacts`` instead of Postgres abstraction tables.

Street ids follow the artifact convention: 1 = flop, 2 = turn. The
distance semantics mirror the clustering pipeline exactly (ref: lloyd
metric dispatch — turn: 1D variation EMD over 101 equity bins; flop:
debiased Sinkhorn divergence over the turn-centroid ground metric;
river: |equity delta| directly).

Sampling queries (``sample``, ``replace_obs``, ``knn``/``kfn`` rows)
need the artifact's training points; run ``scripts/backfill_points.py``
once to add them to artifacts written before points were persisted.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..deuce.observation import river_equity
from ..lloyd.histogram import child_cluster_histograms, turn_histograms
from ..lloyd.sinkhorn import sinkhorn_divergence, variation_distance

PREF, FLOP, TURN = 0, 1, 2


class Topology:
    """Query façade; all methods are host-side with device kernels for
    the per-observation features."""

    def __init__(self, artifacts: dict, bucket_fn=None, seed: int = 0):
        self.artifacts = artifacts or {}
        self.bucket_fn = bucket_fn
        self.rng = np.random.default_rng(seed)

    # -- features ------------------------------------------------------
    def obs_histogram(self, pocket: np.ndarray, board: np.ndarray,
                      street: int) -> np.ndarray:
        """The observation's clustering feature (ref: obs_histogram)."""
        if street == TURN:
            return np.asarray(turn_histograms(
                jnp.asarray(pocket[None]), jnp.asarray(board[None, :4])
            ))[0]
        if street == FLOP:
            turn = self._art(TURN)
            return np.asarray(child_cluster_histograms(
                jnp.asarray(pocket[None]), jnp.asarray(board[None, :3]),
                turn.lookup.device(), turn.centroids.shape[0],
            ))[0]
        if street == PREF:
            # preflop features are the stored per-class flop-cluster
            # transition histograms (ref: PrefLayer Future artifact)
            from ..nlhe.abstraction import preflop_class

            cls = int(preflop_class(jnp.asarray(pocket[None]))[0])
            return np.asarray(self._art(PREF).centroids[cls])
        raise ValueError("histograms exist for preflop(0)/flop(1)/turn(2)")

    def abs_histogram(self, street: int, k: int) -> np.ndarray:
        """Centroid feature of a bucket (ref: abs_histogram)."""
        return np.asarray(self._art(street).centroids[int(k)])

    # -- distances -----------------------------------------------------
    def _feature_distance(self, a: np.ndarray, b: np.ndarray,
                          street: int) -> float:
        if street == TURN:
            return float(np.asarray(variation_distance(
                jnp.asarray(a[None]), jnp.asarray(b[None])))[0])
        # flop features live over the TURN metric; preflop features over
        # the FLOP metric (each street's ground cost is its child street)
        cost = jnp.asarray(self._art(TURN if street == FLOP else FLOP).metric)
        return float(np.asarray(sinkhorn_divergence(
            jnp.asarray(a[None]), jnp.asarray(b[None]), cost))[0])

    def abs_distance(self, street: int, k1: int, k2: int) -> float:
        """Centroid↔centroid from the stored metric (ref: abs_distance)."""
        return float(self._art(street).metric[int(k1), int(k2)])

    def obs_abs_distance(self, pocket, board, street: int, k: int) -> float:
        """Observation↔centroid under the street's EMD
        (ref: obs_abs_distance)."""
        return self._feature_distance(
            self.obs_histogram(pocket, board, street),
            self.abs_histogram(street, k), street,
        )

    def obs_distance(self, p1, b1, p2, b2, street: int) -> float:
        """Observation↔observation (ref: obs_distance); river compares
        exact equities."""
        if street == 3:
            e1 = float(np.asarray(river_equity(
                jnp.asarray(p1[None]), jnp.asarray(b1[None])))[0])
            e2 = float(np.asarray(river_equity(
                jnp.asarray(p2[None]), jnp.asarray(b2[None])))[0])
            return abs(e1 - e2)
        return self._feature_distance(
            self.obs_histogram(p1, b1, street),
            self.obs_histogram(p2, b2, street), street,
        )

    # -- sampling ------------------------------------------------------
    def sample(self, street: int, k: int | None = None):
        """A concrete training observation, optionally from bucket ``k``
        (ref: exp_wrt_str / exp_wrt_abs / abs_similar)."""
        art = self._art(street)
        if art.pocket is None:
            raise LookupError(
                "artifact has no stored points — run "
                "scripts/backfill_points.py")
        idx = (np.flatnonzero(art.assignment == int(k))
               if k is not None else np.arange(len(art.assignment)))
        if idx.size == 0:
            raise LookupError(f"bucket {k} is empty in the artifact")
        i = int(self.rng.choice(idx))
        return art.pocket[i], art.board[i], int(art.assignment[i])

    def replace_obs(self, pocket, board, street: int):
        """A different observation in the same bucket (ref: replace_obs)."""
        k = self.bucket_of(pocket, board, street)
        for _ in range(8):  # avoid echoing the input back
            p, b, _ = self.sample(street, k)
            if not (np.array_equal(p, pocket) and np.array_equal(b, board)):
                return p, b, k
        return p, b, k

    def bucket_of(self, pocket, board, street: int) -> int:
        """Raw cluster id of an observation. The bucket provider returns
        tagged abstraction ids ``(street<<8)|cluster`` for artifact hits
        (ref: Abstraction(u16) = [8b street][8b index]); topology queries
        address clusters by their raw index, so translate — and reject
        proxy-fallback tags, which have no cluster to query."""
        if self.bucket_fn is None:
            raise LookupError("no bucket_fn configured")
        full = np.full(5, -1, np.int32)
        full[: board.shape[0]] = board
        tagged = int(np.asarray(self.bucket_fn(
            jnp.asarray(pocket[None].astype(np.int32)),
            jnp.asarray(full[None]),
            jnp.asarray([street], jnp.int32),
        ))[0])
        if tagged >> 8 != street:
            raise LookupError(
                "observation not covered by the clustering artifact "
                f"(tag {tagged:#x})")
        return tagged & 0xFF

    # -- neighbors -----------------------------------------------------
    def knn(self, street: int, k: int, n: int = 5,
            furthest: bool = False) -> list:
        """n nearest (or furthest) buckets of ``k`` with distances
        (ref: knn_wrt_abs / kfn_wrt_abs)."""
        row = np.asarray(self._art(street).metric[int(k)])
        order = np.argsort(-row if furthest else row)
        order = [int(j) for j in order if j != int(k)][:n]
        return [(j, float(row[j])) for j in order]

    def _art(self, street: int):
        art = self.artifacts.get(int(street))
        if art is None:
            raise LookupError(f"no street-{street} artifact loaded")
        return art
