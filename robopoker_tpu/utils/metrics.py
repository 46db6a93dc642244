"""Central metrics registry.

TPU-native counterpart of the reference's ``vitals`` crate
(ref: crates/vitals/src/lib.rs:57-100, metrics.rs:28-67): one typo-proof
registry of named counters/gauges with the same metric names, a periodic
rate logger, and an optional OTLP hook (gated — this image has no
exporter; the sink interface is a callback so any OpenTelemetry/
TensorBoard writer can attach).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable

# the reference's central metric names (metrics.rs:28-67)
COUNTERS = (
    "mccfr_steps", "mccfr_nodes", "mccfr_infos",
    # coverage-loss accounting: worklist entries dropped at a level cap
    # (bias risk if >~1% of nodes) and probe-ladder exhaustions
    "mccfr_dropped", "mccfr_fallbacks", "mccfr_cap_recompiles",
    "mccfr_pruned_branches",
    "kmeans_iterations", "subgame_decisions", "subgame_iterations",
    "http_requests", "db_ops", "slumbot_hands",
)
GAUGES = (
    "mccfr_sum_regret", "mccfr_flush_duration", "mccfr_tree_size",
    "mccfr_infoset_size", "kmeans_drift", "kmeans_reassignment",
    "kmeans_phase_ms", "kmeans_cluster_size", "subgame_decision_ms",
    "subgame_relative_regret", "subgame_policy_deviation",
    "mccfr_floor_rows",
)


@dataclasses.dataclass
class Metrics:
    sink: Callable[[dict], None] | None = None
    log_interval_s: float = 60.0

    def __post_init__(self):
        if self.sink is None:
            # env-driven exporters (TensorBoard event files / OTLP JSON;
            # ref: vitals/src/lib.rs:71-78) — None unless configured
            from .sinks import sink_from_env

            self.sink = sink_from_env()
        self.counters = {k: 0 for k in COUNTERS}
        self.gauges = {k: 0.0 for k in GAUGES}
        self._t0 = time.monotonic()
        self._last_log = self._t0
        self._last_counts = dict(self.counters)

    def inc(self, name: str, n: int = 1) -> None:
        self.counters[name] += n  # KeyError on typos, by design

    def set(self, name: str, v: float) -> None:
        self.gauges[name] = float(v)

    def maybe_log(self, force: bool = False) -> dict | None:
        """Rate checkpoint every log_interval (the reference's Checkpoint
        logger, ref: crates/mccfr/src/metrics/checkpoint.rs)."""
        now = time.monotonic()
        if not force and now - self._last_log < self.log_interval_s:
            return None
        dt = max(now - self._last_log, 1e-9)
        rates = {
            f"{k}_per_s": (v - self._last_counts[k]) / dt
            for k, v in self.counters.items()
            if v != self._last_counts[k]
        }
        record = {
            "uptime_s": round(now - self._t0, 1),
            **{k: v for k, v in self.counters.items() if v},
            **{k: v for k, v in self.gauges.items() if v},
            **{k: round(v, 1) for k, v in rates.items()},
        }
        self._last_log = now
        self._last_counts = dict(self.counters)
        if self.sink is not None:
            self.sink(record)
        else:
            print(json.dumps(record), flush=True)
        return record
