"""Abstraction pipeline: histograms, Sinkhorn EMD, k-means, lookups
(ref: crates/{lloyd,elkan,monge})."""

from .histogram import child_cluster_histograms, turn_histograms
from .kmeans import EmdSpec, KmeansResult, assign, cluster, kmeans_pp_init, recompute
from .lookup import IsoLookup, build_lookup, lookup_device, verify_probe_depth
from .pipeline import (
    StreetArtifacts,
    cluster_flop,
    cluster_turn,
    dedupe_canonical,
    sample_observations,
)
from .sinkhorn import sinkhorn_cost, sinkhorn_divergence, variation_distance

__all__ = [
    "child_cluster_histograms", "turn_histograms",
    "EmdSpec", "KmeansResult", "assign", "cluster", "kmeans_pp_init",
    "recompute", "IsoLookup", "build_lookup", "lookup_device",
    "verify_probe_depth", "StreetArtifacts", "cluster_flop", "cluster_turn",
    "dedupe_canonical", "sample_observations",
    "sinkhorn_cost", "sinkhorn_divergence", "variation_distance",
]
