"""Chip A/B: segmented single-step vs walker-parity-specialized steps.

Runs at the long-train config (batch 256, table 2^22, LookupBucket
artifacts) so its compiled programs warm the persistent cache for the
production run. Parity timing alternates even/odd steps the way
FastSession dispatches them, so the number is the realized epoch rate.

    python scripts/bench_parity.py --abstraction artifacts/abstraction
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def time_steps(steps, table, key, n, label):
    import jax

    nodes = 0
    t0 = time.time()
    for i in range(n):
        table, m = steps[i % len(steps)](table, key)
        nodes += int(m["nodes"])
    jax.block_until_ready(table)
    dt = time.time() - t0
    print(f"{label:24s} {dt/n*1000:8.1f} ms/epoch  {nodes/dt:9.0f} dec/s  "
          f"dropped {int(m['dropped'])}", flush=True)
    return nodes / dt


def main():
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--abstraction", default="artifacts/abstraction")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--table-log2", type=int, default=22)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax

    from robopoker_tpu.mccfr import (LINEAR_REGRET, LINEAR_WEIGHT,
                                     PLURIBUS_SAMPLING)
    from robopoker_tpu.nlhe import TrainerConfig, init_table, make_nlhe_step
    from robopoker_tpu.nlhe.abstraction import LookupBucket
    from robopoker_tpu.nlhe.trainer import make_parity_steps, segmented_caps

    bucket = LookupBucket.load(args.abstraction)
    cfg = TrainerConfig(
        batch=args.batch, work_cap=24576, cap=1536, max_levels=8,
        roll_steps=5, tail_steps=16, table_log2=args.table_log2,
        level_caps=segmented_caps(args.batch),
    )
    key = jax.random.PRNGKey(0)

    seg = make_nlhe_step(bucket, LINEAR_REGRET, LINEAR_WEIGHT,
                         PLURIBUS_SAMPLING, cfg)
    table = init_table(cfg.table_log2)
    t0 = time.time()
    table, _ = seg(table, key)
    jax.block_until_ready(table)
    print(f"segmented compile {time.time()-t0:.1f}s", flush=True)
    time_steps([seg], table, key, args.steps, "segmented")

    even, odd = make_parity_steps(bucket, LINEAR_REGRET, LINEAR_WEIGHT,
                                  PLURIBUS_SAMPLING, cfg)
    table = init_table(cfg.table_log2)
    t0 = time.time()
    table, _ = even(table, key)
    table, _ = odd(table, key)
    jax.block_until_ready(table)
    print(f"parity pair compile {time.time()-t0:.1f}s", flush=True)
    time_steps([even, odd], table, key, args.steps, "parity(even/odd)")


if __name__ == "__main__":
    main()
