"""Analytical collective audit of the sharded training steps (VERDICT
r4 #7): walltime weak-scaling on this 2-core host measures contention,
not the program (docs/weak_scaling.md, demonstrated twice) — so extract
the §5.8 scaling evidence from the compiled programs themselves.

For n = 1/2/4/8 virtual devices, lower + compile the replicated-table
and row-sharded-table steps, walk the optimized HLO, and tabulate every
collective op (all-reduce / reduce-scatter / all-gather /
collective-permute / all-to-all) with its payload bytes. The per-epoch
communication volume PER DEVICE and its ratio to per-device FLOPs must
stay ~flat as n grows — that is exactly the property that yields ≥80%
weak scaling on real ICI-connected hardware, independent of this host's
core count (scaling-book recipe: comm/compute ratio decides overlap).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python3 scripts/collective_audit.py
"""

import argparse
import json
import os
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
               "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
               "pred": 1}

COLLECTIVES = ("all-reduce", "reduce-scatter", "all-gather",
               "collective-permute", "all-to-all")


def shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO shape like 'f32[512,9]' or a tuple thereof."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def audit_hlo(hlo: str) -> dict:
    """Count collective ops and payload bytes in optimized HLO text."""
    out = {c: {"count": 0, "bytes": 0} for c in COLLECTIVES}
    for line in hlo.splitlines():
        s = line.strip()
        # "%name = f32[...] all-reduce(...)" — op name after the '='
        m = re.match(r"%?[\w\.\-]+\s*=\s*(\([^)]*\)|[\w\[\],{}]+)\s+"
                     r"([\w\-]+)", s)
        if not m:
            continue
        op = m.group(2)
        if op.rstrip("-start").rstrip("-done") in COLLECTIVES:
            base = op.rstrip("-start").rstrip("-done")
        elif op in COLLECTIVES:
            base = op
        else:
            continue
        if op.endswith("-done"):
            continue  # the -start carries the shape; don't double count
        out[base]["count"] += 1
        out[base]["bytes"] += shape_bytes(m.group(1))
    out["total_bytes"] = sum(v["bytes"] for k, v in out.items()
                             if isinstance(v, dict))
    out["total_count"] = sum(v["count"] for k, v in out.items()
                             if isinstance(v, dict))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="PER-DEVICE trees per epoch (weak scaling)")
    ap.add_argument("--table-log2", type=int, default=16)
    ap.add_argument("--out", default="docs/collective_audit.md")
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
    rows = []
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
            inner = getattr(step, "jitted", None) or getattr(
                step, "__wrapped__", None) or step
            extra = getattr(step, "extra_args", ())
            lowered = jax.jit(inner).lower(table, key, *extra) \
                if not hasattr(inner, "lower") else inner.lower(
                    table, key, *extra)
            hlo = lowered.compile().as_text()
            a = audit_hlo(hlo)
            results[mode][n] = a
            print(mode, n, json.dumps(a), flush=True)
            rows.append((mode, n, a))

    lines = [
        "# Collective audit — sharded-step HLO (VERDICT r4 #7)", "",
        f"per-device batch {args.batch} trees, table 2^{args.table_log2}; "
        "optimized HLO of the actual compiled programs on the virtual "
        "CPU mesh (the collectives are real XLA collectives; only the "
        "transport is fake). 'bytes' = per-device payload bytes of each "
        "collective per epoch.", "",
        "The §5.8 signal: per-device collective volume must stay ~flat "
        "as devices are added at fixed per-device work — then on real "
        "ICI hardware the comm/compute ratio is constant and weak "
        "scaling holds (the walltime harness on this 2-core host can "
        "never show this; docs/weak_scaling.md).", "",
        "| mode | devices | all-reduce (n × bytes) | reduce-scatter | "
        "all-gather | permute/all-to-all | total bytes/epoch |",
        "|---|---|---|---|---|---|---|",
    ]
    for mode, n, a in rows:
        def cell(k):
            return f"{a[k]['count']} × {a[k]['bytes']:,}"
        pa = {"count": a["collective-permute"]["count"]
              + a["all-to-all"]["count"],
              "bytes": a["collective-permute"]["bytes"]
              + a["all-to-all"]["bytes"]}
        lines.append(
            f"| {mode} | {n} | {cell('all-reduce')} | "
            f"{cell('reduce-scatter')} | {cell('all-gather')} | "
            f"{pa['count']} × {pa['bytes']:,} | {a['total_bytes']:,} |")
    # flatness verdict
    lines.append("")
    for mode in results:
        vols = {n: a["total_bytes"] for n, a in results[mode].items()}
        if 1 in vols and len(vols) > 1:
            base = max(vols[1], 1)
            worst = max(v / base for v in vols.values())
            lines.append(
                f"- **{mode}**: per-device collective bytes/epoch grows "
                f"{worst:.2f}× from n=1 to n=8 "
                f"({'flat — weak-scaling-compatible' if worst <= 1.5 else 'NOT flat — investigate'}).")
    out = pathlib.Path(args.out)
    out.parent.mkdir(exist_ok=True)
    out.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
