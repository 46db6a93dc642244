"""Does re-solving IMPROVE play over the raw blueprint? (VERDICT r3 #5)

The reference publishes blueprint-vs-variant comparisons (README
Benchmarks: base −32.8 vs world+dirac −22.8 mbb/hand); the repo has the
full resolver (subgame/solver.py adapt_leaf/adapt_full + worlds) but
round 3 never measured whether it helps. This runs every litmus
scenario's decision through three arms —

- raw blueprint lookup
- adapt_leaf  (depth-limited resolve, blueprint-EV leaves)
- adapt_full  (L×L pick-game frontier with biased rollouts)

— under the reference's per-decision budget (5,000 ms,
ref: crates/subgame/src/hyperparams.rs:42-52) and reports per-arm
litmus scores, per-case deltas, and the latency/iterations actually
spent. Litmus cases are curated strategy assertions, so the arm scores
are a decision-quality comparison at exactly the spots the reference's
own litmus bin checks.

    python3 scripts/resolve_value.py --workdir artifacts/r2 \
        --abstraction artifacts/abstraction_full --budget-ms 5000
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


class _ResolverPolicy:
    """litmus.evaluate adapter: distribution() re-solves, replay/menu
    delegate to the underlying blueprint."""

    def __init__(self, resolver):
        self.resolver = resolver
        self.blueprint = resolver.blueprint
        self.menu = resolver.blueprint.menu
        self.elapsed_ms = []
        self.iterations = []

    def head_state(self, witness):
        return self.blueprint.head_state(witness)

    def distribution(self, witness):
        out = self.resolver.solve(witness)
        self.elapsed_ms.append(out["elapsed_ms"])
        self.iterations.append(out["iterations"])
        return out["policy"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="artifacts/r2")
    ap.add_argument("--abstraction", default="artifacts/abstraction_full")
    ap.add_argument("--budget-ms", type=float, default=5000.0)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--scenarios", default=None)
    ap.add_argument("--out", default="docs/resolve_value.md")
    ap.add_argument("--arms", default=None,
                    help="comma list subset of blueprint,adapt_leaf,adapt_full")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from robopoker_tpu.nlhe.abstraction import LookupBucket, proxy_bucket
    from robopoker_tpu.pokerkit.regime import RunConfig
    from robopoker_tpu.serving import litmus as L
    from robopoker_tpu.serving.policy import Blueprint, Resolver
    from robopoker_tpu.subgame.solver import ResolveConfig
    from robopoker_tpu.utils.checkpoint import load_compact

    if args.abstraction:
        bucket = LookupBucket.load(args.abstraction)
        run = RunConfig(bucket=f"lookup:{args.abstraction}")
    else:
        bucket, run = proxy_bucket, RunConfig()
    table = load_compact(
        pathlib.Path(args.workdir) / "blueprint_compact.npz", run)
    bp = Blueprint(table, bucket)
    budget = args.budget_ms / 1000.0
    arms = {
        "blueprint": bp,
        # preflop_blueprint=False: this harness asks whether re-solving
        # changes litmus decisions at EVERY spot, including the preflop
        # rows the serving path delegates (brain.rs parity)
        "adapt_leaf": _ResolverPolicy(Resolver(
            bp, ResolveConfig(frontier_picks=False), budget_s=budget,
            preflop_blueprint=False)),
        "adapt_full": _ResolverPolicy(Resolver(
            bp, ResolveConfig(frontier_picks=True), budget_s=budget,
            preflop_blueprint=False)),
    }
    if args.arms:
        keep = [a.strip() for a in args.arms.split(",")]
        arms = {k: v for k, v in arms.items() if k in keep}

    scen = args.scenarios or str(
        pathlib.Path(L.__file__).parent / "scenarios.json")
    doc = L.load(scen)

    rows = {}
    scores = {}
    timing = {}
    for name, policy in arms.items():
        t0 = time.time()
        results = L.evaluate(policy, doc)
        wall = time.time() - t0
        scores[name] = sum(r.passed for r in results)
        rows[name] = results
        if isinstance(policy, _ResolverPolicy):
            timing[name] = {
                "mean_ms": float(np.mean(policy.elapsed_ms)),
                "p99_ms": float(np.percentile(policy.elapsed_ms, 99)),
                "mean_iterations": float(np.mean(policy.iterations)),
            }
        print(f"{name}: {scores[name]}/{len(results)} in {wall:.0f}s",
              flush=True)

    n = len(rows["blueprint"])
    lines = [
        "# Re-solve value — litmus decision quality per arm",
        "",
        f"workdir {args.workdir}; abstraction {args.abstraction}; "
        f"budget {args.budget_ms:.0f} ms/decision "
        f"(ref: subgame/src/hyperparams.rs:42-52); backend "
        f"{'tpu' if args.tpu else 'cpu'}",
        "",
        "| arm | litmus | mean ms/decision | p99 ms | mean iters |",
        "|---|---|---|---|---|",
    ]
    for name in arms:
        t = timing.get(name, {})
        lines.append(
            f"| {name} | {scores[name]}/{n} | "
            f"{t.get('mean_ms', 0):.0f} | {t.get('p99_ms', 0):.0f} | "
            f"{t.get('mean_iterations', 0):.0f} |")
    others = [a for a in arms if a != "blueprint"]
    lines += ["", "## Cases that changed vs the raw blueprint", "",
              "| case | blueprint | " + " | ".join(others) + " |",
              "|---|---|" + "---|" * len(others)]
    for i in range(n):
        b = rows["blueprint"][i]
        alt = [rows[a][i] for a in others]
        if any(b.passed != r.passed for r in alt):
            def mark(r):
                return ("✅" if r.passed else "❌") + f" {r.observed}"
            cells = " | ".join(mark(r) for r in alt)
            lines.append(f"| {b.name} | {mark(b)} | {cells} |")
    out = pathlib.Path(args.out)
    out.parent.mkdir(exist_ok=True)
    out.write_text("\n".join(lines) + "\n")
    print("\n".join(lines[:12]))
    print(json.dumps(scores))


if __name__ == "__main__":
    main()
