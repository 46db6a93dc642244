"""Measured hands/hr WITH search (VERDICT r4 #2 'done' criterion).

Plays full hands through the parlor engine with the hero on the
re-solving stack (depth or depth+world) and the villain on the raw
blueprint, under the reference's decision semantics: preflop decisions
are blueprint lookups (ref: crates/parlor/src/players/brain.rs:58-71 —
the reference NEVER re-solves preflop; that is how its README reports
3-4K hands/hr against slumbot with a 5 s postflop budget), postflop
decisions spend the budget. Reports wall-clock hands/hr plus the
per-hand searched-decision distribution so the number is auditable.

    python3 scripts/search_handrate.py --tpu --workdir artifacts/r2 \
        --abstraction artifacts/abstraction_full --hands 40
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="artifacts/r2")
    ap.add_argument("--abstraction", default="artifacts/abstraction_full")
    ap.add_argument("--hands", type=int, default=40)
    ap.add_argument("--budget-s", type=float, default=5.0)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--full", action="store_true",
                    help="adapt_full (worlds + pick game); default depth-only")
    ap.add_argument("--sessions", type=int, default=1,
                    help="concurrent sessions (threaded) — the accounting "
                         "the reference's 3-4K H/hr uses: spar/runtime.rs "
                         "runs depth*4 = 4 concurrent CFR solves to fill "
                         "idle cores during each solve's wait; here "
                         "concurrent sessions fill the device queue "
                         "during host/tunnel gaps")
    ap.add_argument("--out", default="docs/search_handrate.md")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from robopoker_tpu.nlhe.abstraction import LookupBucket, proxy_bucket
    from robopoker_tpu.pokerkit.regime import RunConfig
    from robopoker_tpu.serving.parlor import Engine
    from robopoker_tpu.serving.policy import Agent, Blueprint, Resolver
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

    def make_session(seed):
        res = Resolver(bp, ResolveConfig(frontier_picks=args.full),
                       budget_s=args.budget_s, use_worlds=args.full)
        hero = Agent(res, use_dirac=True)
        villain = Agent(bp, use_dirac=True)
        engine = Engine([hero, villain], seed=seed)

        orig_solve = res.solve

        def counting_solve(w):
            out = orig_solve(w)
            if out.get("delegated") is None:
                counting_solve.count += 1
                counting_solve.iters.append(out["iterations"])
            return out

        counting_solve.count = 0
        counting_solve.iters = []
        res.solve = counting_solve
        return engine, counting_solve

    sessions = [make_session(11 + s) for s in range(args.sessions)]

    # warm the programs on one untimed hand (shared compile cache)
    sessions[0][0].play_hand(999_983)
    sessions[0][1].count = 0
    sessions[0][1].iters.clear()

    per_hand = []
    n_iters = []
    t0 = time.time()
    if args.sessions == 1:
        engine, counter = sessions[0]
        for h in range(args.hands):
            before = counter.count
            engine.play_hand(h)
            per_hand.append(counter.count - before)
        total_hands = args.hands
    else:
        # the reference's accounting: N concurrent sessions share the
        # device; each session's host/tunnel gaps are filled by the
        # others' dispatches (spar/runtime.rs:20-24)
        import threading

        lock = threading.Lock()

        def run_session(idx):
            engine, counter = sessions[idx]
            for h in range(args.hands):
                before = counter.count
                engine.play_hand(1000 * idx + h)
                with lock:
                    per_hand.append(counter.count - before)

        threads = [threading.Thread(target=run_session, args=(i,))
                   for i in range(args.sessions)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        total_hands = args.hands * args.sessions
    wall = time.time() - t0
    for _, counter in sessions:
        n_iters.extend(counter.iters)
    hands_hr = total_hands / wall * 3600.0

    rec = {
        "hands": total_hands,
        "sessions": args.sessions,
        "wall_s": round(wall, 1),
        "hands_per_hr": round(hands_hr, 1),
        "budget_s": args.budget_s,
        "family": "adapt_full" if args.full else "adapt_leaf",
        "searched_decisions_per_hand_mean": float(np.mean(per_hand)),
        "searched_decisions_hist": np.bincount(per_hand).tolist(),
        "iters_per_search_mean": float(np.mean(n_iters)) if n_iters else 0.0,
        "backend": "tpu" if args.tpu else "cpu",
    }
    print(json.dumps(rec))
    out = pathlib.Path(args.out)
    out.parent.mkdir(exist_ok=True)
    out.write_text(
        "# Hands/hr with search (reference accounting)\n\n"
        "Hero = re-solver (preflop delegates to the blueprint, exactly "
        "the reference's brain.rs semantics), villain = raw blueprint, "
        "full hands through the parlor engine.\n\n"
        "```json\n" + json.dumps(rec, indent=2) + "\n```\n\n"
        "Reference comparison: README Benchmarks reports 3-4K hands/hr "
        "with search vs slumbot — an opponent pool whose hands mostly "
        "end preflop (zero searched decisions). The searched-decision "
        "histogram above converts between the two accountings.\n")


if __name__ == "__main__":
    main()
