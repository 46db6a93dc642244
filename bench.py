"""Benchmark: NLHE MCCFR training throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: walker decisions per second sustained by the flagship blueprint
training step (LinearRegret + LinearWeight + PluribusSampling — the
reference's production config, ref: crates/nlhe/src/solver.rs:11) at the
EXACT configuration of our production blueprint run: batch 256 trees,
2^22-row table, k-means abstraction artifacts, walker-parity-specialized
segmented level passes. A "decision" = one walker decision node
receiving a full regret/strategy update — the same unit as the
reference's published "~309 decisions/sec sustained" dashboard figure
(BASELINE.md / README training caption).
"""

import json
import pathlib
import time

import jax
import numpy as np


def main():
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from robopoker_tpu.mccfr import LINEAR_REGRET, LINEAR_WEIGHT, PLURIBUS_SAMPLING
    from robopoker_tpu.nlhe import TrainerConfig, init_table, proxy_bucket

    from robopoker_tpu.nlhe.trainer import make_parity_steps, segmented_caps

    bucket = proxy_bucket
    art = pathlib.Path(__file__).parent / "artifacts" / "abstraction"
    if art.exists():
        from robopoker_tpu.nlhe.abstraction import LookupBucket

        bucket = LookupBucket.load(art)

    cfg = TrainerConfig(
        batch=256, work_cap=24576, cap=1536, max_levels=8,
        roll_steps=5, tail_steps=16, table_log2=22,
        level_caps=segmented_caps(256),
    )
    table = init_table(cfg.table_log2)
    steps = make_parity_steps(
        bucket, LINEAR_REGRET, LINEAR_WEIGHT, PLURIBUS_SAMPLING, cfg
    )
    key = jax.random.PRNGKey(0)

    # warmup / compile both parity programs
    table, metrics = steps[0](table, key)
    table, metrics = steps[1](table, key)
    jax.block_until_ready(table)

    n_steps = 20
    t0 = time.monotonic()
    nodes = 0
    for i in range(n_steps):
        table, metrics = steps[i % 2](table, key)
        nodes += int(metrics["nodes"])
    jax.block_until_ready(table)
    dt = time.monotonic() - t0

    decisions_per_s = nodes / dt
    baseline = 309.0  # reference sustained decisions/s (BASELINE.md)
    print(json.dumps({
        "metric": "mccfr_walker_decisions_per_s",
        "value": round(decisions_per_s, 1),
        "unit": "decisions/s",
        "vs_baseline": round(decisions_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    main()
