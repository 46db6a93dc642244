"""Measure AIVAT variance reduction on large-scale blueprint self-play.

VERDICT r2 weak #4: the test suite only proves reduction > 1x; the
reference claims 10-44x (ref: crates/arena/src/lib.rs:4-5). This runs
the batched lockstep self-play estimator (serving/aivat.selfplay_delta)
on >= 10k hands against a real trained blueprint and reports the
measured reduction.

CPU-pinned by default so it can run concurrently with a chip-bound
train:

    python3 scripts/aivat_bench.py --workdir artifacts/r2 \
        --abstraction artifacts/abstraction_full --hands 10240
"""

import argparse
import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="artifacts/r2")
    ap.add_argument("--abstraction", default="artifacts/abstraction_full")
    ap.add_argument("--hands", type=int, default=10_240)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from robopoker_tpu.nlhe.abstraction import LookupBucket, proxy_bucket
    from robopoker_tpu.pokerkit.regime import RunConfig
    from robopoker_tpu.serving.aivat import selfplay_delta
    from robopoker_tpu.utils.checkpoint import load_compact

    if args.abstraction:
        bucket = LookupBucket.load(args.abstraction)
        run = RunConfig(bucket=f"lookup:{args.abstraction}")
    else:
        bucket = proxy_bucket
        run = RunConfig()
    table = load_compact(
        pathlib.Path(args.workdir) / "blueprint_compact.npz", run)
    print(f"blueprint epoch {int(table.epoch)}; {args.hands} hands "
          f"batch {args.batch}", flush=True)
    t0 = time.time()
    d = selfplay_delta(table, bucket, n_hands=args.hands,
                       batch=args.batch, seed=args.seed)
    out = {**dataclasses.asdict(d), "wall_s": round(time.time() - t0, 1),
           "epoch": int(table.epoch)}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
