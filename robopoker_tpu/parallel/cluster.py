"""Mesh-sharded k-means: points sharded over devices, centroids replicated.

TPU-native counterpart of the reference's rayon point-parallel Elkan
phases (ref: crates/elkan/src/elkan.rs:39-47,128-167 — init_bounds /
step_elkan / recompute all ``par_iter`` over points; SURVEY §2.5 P2:
"points sharded per host, centroid recompute = psum of per-shard partial
sums"). The distance/assignment work — the dominant clustering cost —
scales linearly with device count; the centroid update is a psum of
per-shard (weighted sums, mass) partials, so every device ends each
round with identical replicated centroids.

Host-side chunking is preserved from the single-chip path (one dispatch
per global chunk) to keep remote-relay dispatches short; within each
dispatch the chunk is split over the ``dp`` axis by ``shard_map``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..lloyd.kmeans import EmdSpec, KmeansResult, _pair_distance, kmeans_pp_init
from ..lloyd.sinkhorn import sinkhorn_cost
from ..pokerkit.hyperparams import KmeansHyperParams


def make_sharded_assign(mesh: Mesh, spec: EmdSpec, axis: str = "dp"):
    """Jitted sharded assignment: ``fn(points, centroids, cself) →
    assignment`` with points/assignment sharded over ``axis`` and
    centroids replicated. Point count must be divisible by mesh size
    (callers pad)."""

    def local(points, centroids, cself):
        # replicated operands must be cast to per-shard-varying before
        # mixing with the sharded points inside the Sinkhorn loop carries
        centroids = jax.lax.pcast(centroids, (axis,), to="varying")
        cself = jax.lax.pcast(cself, (axis,), to="varying")
        d = _pair_distance(points, centroids, spec, cself)
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    shd = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(axis),
    )
    return jax.jit(shd)


def make_sharded_recompute(mesh: Mesh, k: int, axis: str = "dp"):
    """Jitted sharded centroid update: per-shard segment-sums psum'd into
    replicated (sums, mass) partials (the reference's Absorb fold,
    distributed)."""

    def local(points, assignment, weights):
        bins = points.shape[1]
        sums = jnp.zeros((k, bins), jnp.float32).at[assignment].add(
            points * weights[:, None]
        )
        mass = jnp.zeros(k, jnp.float32).at[assignment].add(weights)
        return (
            jax.lax.psum(sums, axis),
            jax.lax.psum(mass, axis),
        )

    shd = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    return jax.jit(shd)


def _chunked_assign(fn, points: jnp.ndarray, centroids: jnp.ndarray,
                    spec: EmdSpec, chunk: int, D: int) -> jnp.ndarray:
    """Chunked-from-host sharded assignment over all points [N] → int32.

    Mirrors ``lloyd.kmeans.assign`` (short relay-safe dispatches), with
    each chunk split over the mesh by the prebuilt ``fn``.
    """
    chunk = max(chunk - chunk % D, D)
    if spec.kind == "sinkhorn":
        cost = jnp.asarray(spec.cost, jnp.float32)
        cself = sinkhorn_cost(centroids, centroids, cost, spec.sinkhorn_hp)
    else:
        cself = jnp.zeros(centroids.shape[0], jnp.float32)
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    outs = []
    for i in range(0, pts.shape[0], chunk):
        outs.append(fn(pts[i:i + chunk], centroids, cself))
    return jnp.concatenate(outs)[:n]


def sharded_assign(points: jnp.ndarray, centroids: jnp.ndarray,
                   spec: EmdSpec, mesh: Mesh, chunk: int = 4096,
                   axis: str = "dp") -> jnp.ndarray:
    """One-shot sharded assignment (builds the jitted fn; loops prefer
    :func:`sharded_cluster`, which builds it once)."""
    fn = make_sharded_assign(mesh, spec, axis)
    return _chunked_assign(fn, points, centroids, spec, chunk, mesh.size)


def sharded_cluster(points: jnp.ndarray, k: int, spec: EmdSpec,
                    key: jnp.ndarray, mesh: Mesh,
                    hp: KmeansHyperParams = KmeansHyperParams(),
                    chunk: int = 4096,
                    weights: jnp.ndarray | None = None) -> KmeansResult:
    """Mesh-parallel counterpart of ``lloyd.kmeans.cluster``: identical
    math (same kmeans++ init, same per-point distances → same argmin, and
    the psum'd Absorb partials reduce to the same centroid means), so a
    sharded run reproduces the single-device clustering."""
    D = mesh.size
    centroids = kmeans_pp_init(points, k, spec, key)
    n = points.shape[0]
    pad = (-n) % D
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    w = jnp.ones(n, jnp.float32) if weights is None else jnp.asarray(weights)
    w = jnp.pad(w, (0, pad))  # padded rows carry zero mass
    recompute_fn = make_sharded_recompute(mesh, k)
    assign_fn = make_sharded_assign(mesh, spec)

    drift, it, assignment = np.inf, 0, None
    for it in range(hp.iterations):
        assignment = _chunked_assign(assign_fn, pts, centroids, spec,
                                     chunk, D)
        sums, mass = recompute_fn(pts, assignment, w)
        new = jnp.where(
            mass[:, None] > 0, sums / jnp.maximum(mass[:, None], 1e-30), 0.0
        )
        empty = (new.sum(axis=1) == 0)[:, None]
        new = jnp.where(empty, centroids, new)
        drift = float(jnp.abs(new - centroids).sum(axis=1).mean())
        centroids = new
        if drift < hp.drift_threshold:
            break
    return KmeansResult(
        centroids=np.asarray(centroids),
        assignment=np.asarray(assignment[:n]),
        iterations=it + 1,
        drift=drift,
    )
