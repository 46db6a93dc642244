"""Weak-scaling signal on the virtual 8-device CPU mesh (VERDICT r3 #8).

Real multi-chip hardware is unavailable in this environment, so §5.8's
≥80% scaling target can't be verified for real. What CAN be measured
here: walltime weak-scaling of the actual sharded programs — fixed
PER-DEVICE batch, device count 1/2/4/8 on a forced-host-platform CPU
mesh — for both the replicated-table and row-sharded-table steps. The
collectives (psum / all_gather / psum_scatter) are real XLA collectives
in these programs; what's fake is the transport (shared host memory)
and the compute (2 physical cores oversubscribed 4× at n=8), so the
table is a sanity signal that per-device work and collective volume
stay flat — NOT a hardware scaling claim. Record next to the dryrun.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python3 scripts/weak_scaling.py
"""

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="PER-DEVICE trees per epoch (weak scaling)")
    ap.add_argument("--table-log2", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--out", default="docs/weak_scaling.md")
    args = ap.parse_args()

    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from robopoker_tpu.mccfr import (LINEAR_REGRET, LINEAR_WEIGHT,
                                     PLURIBUS_SAMPLING)
    from robopoker_tpu.nlhe.abstraction import proxy_bucket
    from robopoker_tpu.nlhe.table import init_table
    from robopoker_tpu.nlhe.trainer import TrainerConfig
    from robopoker_tpu.parallel.train import (make_mesh,
                                              make_sharded_nlhe_step,
                                              make_sharded_table_step,
                                              shard_table)

    cfg = TrainerConfig(batch=args.batch, table_log2=args.table_log2)
    results = {}
    for mode, factory in (("replicated", make_sharded_nlhe_step),
                          ("row-sharded", make_sharded_table_step)):
        results[mode] = {}
        for n in (1, 2, 4, 8):
            if n > len(jax.devices()):
                continue
            mesh = make_mesh(n)
            step = factory(proxy_bucket, LINEAR_REGRET, LINEAR_WEIGHT,
                           PLURIBUS_SAMPLING, mesh, config=cfg)
            table = init_table(args.table_log2)
            if mode == "row-sharded":
                table = shard_table(table, mesh)
            key = jax.random.PRNGKey(0)
            # compile + warm
            table, m = step(table, key)
            jax.block_until_ready(table)
            t0 = time.time()
            nodes = 0
            for i in range(args.epochs):
                table, m = step(table, jax.random.fold_in(key, i))
                nodes += int(m["nodes"])
            jax.block_until_ready(table)
            wall = time.time() - t0
            results[mode][n] = {
                "nodes_s": nodes / wall,
                "epochs_s": args.epochs / wall,
                "global_trees_per_epoch": args.batch * n,
            }
            print(mode, n, results[mode][n], flush=True)

    lines = [
        "# Weak scaling — virtual 8-device CPU mesh", "",
        f"per-device batch {args.batch} trees, table 2^{args.table_log2}, "
        f"{args.epochs} timed epochs, host platform forced to "
        f"{len(jax.devices())} devices on {os.cpu_count()} physical "
        f"cores.", "",
        "**Caveat (honest):** transport is shared host memory and the "
        "cores are oversubscribed 4× at n=8, so absolute walltime does "
        "NOT certify the ≥80% multi-host target (§5.8 stays 'partial' "
        "until real hardware). The signal here is that global throughput "
        "(nodes/s) holds or grows as devices are added while per-device "
        "work stays fixed — i.e. the sharded program itself adds no "
        "super-linear collective or recompilation cost.", "",
        "| mode | devices | global trees/epoch | nodes/s | vs n=1 |",
        "|---|---|---|---|---|",
    ]
    for mode in results:
        base = results[mode].get(1, {}).get("nodes_s")
        for n, r in results[mode].items():
            rel = r["nodes_s"] / base if base else float("nan")
            lines.append(
                f"| {mode} | {n} | {r['global_trees_per_epoch']} | "
                f"{r['nodes_s']:,.0f} | {rel:.2f}× |")
    out = pathlib.Path(args.out)
    out.parent.mkdir(exist_ok=True)
    out.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(json.dumps({m: {str(k): v for k, v in d.items()}
                      for m, d in results.items()}))


if __name__ == "__main__":
    main()
