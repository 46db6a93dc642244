"""Pooled vs sequential re-solve throughput (round 5).

Times ResolverPool.solve_many on S simultaneous postflop decisions
against S sequential Resolver.solve calls at the same budget — the
decisions/hour uplift from batching the session axis (the TPU-native
form of spar/runtime.rs concurrent sessions).

    python3 scripts/pool_rate.py --tpu --workdir artifacts/r2 \
        --abstraction artifacts/abstraction_full --sessions 4
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


SPOTS = [
    dict(hero_seat=0, hero_hole=[48, 35],
         events=[("col", 2), ("col", 1), ("deal", [45, 20, 8]),
                 ("col", 1)]),
    dict(hero_seat=0, hero_hole=[30, 31],
         events=[("col", 2), ("col", 1), ("deal", [10, 21, 40]),
                 ("col", 1)]),
    dict(hero_seat=0, hero_hole=[50, 46],
         events=[("col", 2), ("col", 1), ("deal", [9, 22, 41]),
                 ("col", 1)]),
    dict(hero_seat=0, hero_hole=[12, 13],
         events=[("col", 2), ("col", 1), ("deal", [44, 33, 2]),
                 ("col", 1)]),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="artifacts/r2")
    ap.add_argument("--abstraction", default="artifacts/abstraction_full")
    ap.add_argument("--budget-s", type=float, default=5.0)
    ap.add_argument("--sessions", type=int, default=4)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--out", default="docs/pool_rate.md")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from robopoker_tpu.nlhe.abstraction import LookupBucket, proxy_bucket
    from robopoker_tpu.pokerkit.regime import RunConfig
    from robopoker_tpu.serving.policy import (Blueprint, Resolver,
                                              ResolverPool, Witness)
    from robopoker_tpu.utils.checkpoint import load_compact

    if args.abstraction:
        bucket = LookupBucket.load(args.abstraction)
        run = RunConfig(bucket=f"lookup:{args.abstraction}")
    else:
        bucket, run = proxy_bucket, RunConfig()
    table = load_compact(
        pathlib.Path(args.workdir) / "blueprint_compact.npz", run)
    bp = Blueprint(table, bucket)
    ws = [Witness(hero_seat=s["hero_seat"],
                  hero_hole=np.asarray(s["hero_hole"]),
                  events=list(s["events"]))
          for s in SPOTS[: args.sessions]]

    pool = ResolverPool(bp, budget_s=args.budget_s)
    res = Resolver(bp, budget_s=args.budget_s)

    # warm both program sets (compiles excluded from the timed runs)
    pool.solve_many(ws)
    res.solve(ws[0])

    t0 = time.time()
    outs = pool.solve_many(ws)
    pooled_wall = time.time() - t0
    t0 = time.time()
    seq_iters = []
    for w in ws:
        seq_iters.append(res.solve(w)["iterations"])
    seq_wall = time.time() - t0

    rec = {
        "sessions": len(ws),
        "budget_s": args.budget_s,
        "pooled_wall_s": round(pooled_wall, 2),
        "sequential_wall_s": round(seq_wall, 2),
        "speedup": round(seq_wall / pooled_wall, 2),
        "pooled_iters_per_decision": outs[-1]["iterations"],
        "sequential_iters_per_decision_mean": float(np.mean(seq_iters)),
        "pooled_decisions_per_hr": round(
            len(ws) / pooled_wall * 3600.0, 1),
        "sequential_decisions_per_hr": round(
            len(ws) / seq_wall * 3600.0, 1),
        "backend": "tpu" if args.tpu else "cpu",
    }
    print(json.dumps(rec))
    pathlib.Path(args.out).write_text(
        "# Pooled re-solve throughput\n\nS simultaneous decisions in one "
        "budget (vmapped session axis) vs S sequential 5 s decisions.\n\n"
        "```json\n" + json.dumps(rec, indent=2) + "\n```\n")


if __name__ == "__main__":
    main()
