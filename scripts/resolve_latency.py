"""Real-time re-solve latency on the chip (VERDICT r2 weak #6).

Measures warm-cache wall-clock per subgame decision — posterior replay,
belief partition, spend(budget), harvest — for adapt_leaf (depth-only)
and adapt_full (depth + world), plus iterations-within-budget, at a set
of canonical decision spots on each street. Derives a hands/hour figure
comparable to the reference's published 3-4K hands/hr with search
(reference README benchmarks; subgame/src/hyperparams.rs:42-52: 5 s
decision budget).

    python3 scripts/resolve_latency.py --tpu --workdir artifacts/r2 \
        --abstraction artifacts/abstraction_full --budget-s 5
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


# canonical decision spots (hero to act), one per street
SPOTS = {
    # BB facing a 2bb open with AKs
    "preflop_3bet": dict(
        hero_seat=1, hero_hole=[51, 47],
        events=[("col", 4)]),
    # SB c-bet spot on K72r after defend
    "flop_cbet": dict(
        hero_seat=0, hero_hole=[48, 35],
        events=[("col", 2), ("col", 1),
                ("deal", [45, 20, 8]), ("col", 1)]),
    # turn probe after checked flop
    "turn_probe": dict(
        hero_seat=0, hero_hole=[48, 35],
        events=[("col", 2), ("col", 1),
                ("deal", [45, 20, 8]), ("col", 1), ("col", 1),
                ("deal", [30]), ("col", 1)]),
    # river TPTK facing a bet
    "river_call": dict(
        hero_seat=0, hero_hole=[48, 35],
        events=[("col", 2), ("col", 1),
                ("deal", [45, 20, 8]), ("col", 1), ("col", 1),
                ("deal", [30]), ("col", 1), ("col", 1),
                ("deal", [17]), ("col", 4)]),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="artifacts/r2")
    ap.add_argument("--abstraction", default="artifacts/abstraction_full")
    ap.add_argument("--budget-s", type=float, default=5.0)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--out", default="docs/resolve_latency.md")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from robopoker_tpu.nlhe.abstraction import LookupBucket, proxy_bucket
    from robopoker_tpu.pokerkit.regime import RunConfig
    from robopoker_tpu.serving.policy import Blueprint, Resolver, Witness
    from robopoker_tpu.utils.checkpoint import load_compact

    if args.abstraction:
        bucket = LookupBucket.load(args.abstraction)
        run = RunConfig(bucket=f"lookup:{args.abstraction}")
    else:
        bucket, run = proxy_bucket, RunConfig()
    table = load_compact(
        pathlib.Path(args.workdir) / "blueprint_compact.npz", run)
    bp = Blueprint(table, bucket_fn=(bucket if args.abstraction else None))

    rows = []
    for family, use_worlds in (("adapt_leaf", False), ("adapt_full", True)):
        # preflop_blueprint=False: this harness measures re-solve cost
        # at EVERY street, including the preflop spot the serving path
        # now delegates to the blueprint (reference brain.rs parity)
        res = Resolver(bp, use_worlds=use_worlds, preflop_blueprint=False)
        res.budget_s = args.budget_s
        for name, spec in SPOTS.items():
            w = Witness(hero_seat=spec["hero_seat"],
                        hero_hole=np.asarray(spec["hero_hole"]),
                        events=list(spec["events"]))
            # cold call compiles; the two warm calls are the measurement
            t0 = time.monotonic()
            out = res.solve(w)
            cold_s = time.monotonic() - t0
            warm = []
            for _ in range(2):
                t0 = time.monotonic()
                out = res.solve(w)
                warm.append(time.monotonic() - t0)
            t_post0 = time.monotonic()
            bp.head_state(w)
            posterior_s = time.monotonic() - t_post0
            rows.append({
                "family": family, "spot": name,
                "cold_s": round(cold_s, 2),
                "warm_s": round(float(np.mean(warm)), 3),
                "posterior_s": round(posterior_s, 3),
                "iterations": int(out.get("iterations", 0)),
                "elapsed_ms": float(out.get("elapsed_ms", 0.0)),
            })
            print(json.dumps(rows[-1]), flush=True)

    # hands/hr: ~2.5 hero decisions/hand with search at budget_s each,
    # everything else (blueprint lookups) is sub-ms
    warm_mean = float(np.mean([r["warm_s"] for r in rows]))
    hands_hr = 3600.0 / (2.5 * warm_mean)
    dev = jax.devices()[0].platform
    md = ["# Real-time re-solve latency", "",
          f"device: {dev}; budget {args.budget_s}s; blueprint epoch "
          f"{int(table.epoch)}; abstraction: {args.abstraction}", "",
          "| family | spot | warm s/decision | iterations in budget | "
          "posterior s | cold compile s |", "|---|---|---|---|---|---|"]
    for r in rows:
        md.append(f"| {r['family']} | {r['spot']} | {r['warm_s']} | "
                  f"{r['iterations']} | {r['posterior_s']} | {r['cold_s']} |")
    md += ["", f"mean warm decision: {warm_mean:.3f} s → ~"
           f"{hands_hr:,.0f} hands/hr at 2.5 searched decisions/hand "
           f"(reference publishes 3-4K hands/hr with search)."]
    out_p = pathlib.Path(args.out)
    out_p.parent.mkdir(exist_ok=True)
    out_p.write_text("\n".join(md) + "\n")
    print(f"\nwrote {out_p}")


if __name__ == "__main__":
    main()
