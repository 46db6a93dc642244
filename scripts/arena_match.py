"""Variant-arena head-to-head: blueprint A vs blueprint B with AIVAT.

The repo analog of the reference's README Benchmarks matches (base vs
depth/world/dirac variants, played through the spar runtime). Each seat
probes its OWN table under its OWN abstraction, seats swap every other
batch, and the round-4 AIVAT channels (action / deal / locked-runout)
cut the hands needed for a decision-grade winrate.

    python3 scripts/arena_match.py --tpu \
        --a artifacts/r4 --abstraction-a artifacts/abstraction_full \
        --b artifacts   --abstraction-b artifacts/abstraction \
        --hands 16384
"""

import argparse
import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def _load(workdir, abstraction):
    from robopoker_tpu.nlhe.abstraction import LookupBucket, proxy_bucket
    from robopoker_tpu.pokerkit.regime import RunConfig
    from robopoker_tpu.utils.checkpoint import load_compact

    if abstraction:
        bucket = LookupBucket.load(abstraction)
        run = RunConfig(bucket=f"lookup:{abstraction}")
    else:
        bucket, run = proxy_bucket, RunConfig()
    table = load_compact(
        pathlib.Path(workdir) / "blueprint_compact.npz", run)
    return table, bucket


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="artifacts/r4")
    ap.add_argument("--abstraction-a", default="artifacts/abstraction_full")
    ap.add_argument("--b", default="artifacts")
    ap.add_argument("--abstraction-b", default="artifacts/abstraction")
    ap.add_argument("--hands", type=int, default=16_384)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dirac-a", action="store_true")
    ap.add_argument("--dirac-b", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from robopoker_tpu.serving.aivat import match_delta

    ta, ba = _load(args.a, args.abstraction_a)
    tb, bb = _load(args.b, args.abstraction_b)
    print(f"A: {args.a} ep{int(ta.epoch)}  vs  B: {args.b} "
          f"ep{int(tb.epoch)}; {args.hands} hands", flush=True)
    t0 = time.time()
    d = match_delta(ta, tb, ba, n_hands=args.hands, batch=args.batch,
                    seed=args.seed, dirac_a=args.dirac_a,
                    dirac_b=args.dirac_b,
                    bucket_fn_b=bb if bb is not ba else None)
    out = dataclasses.asdict(d)
    # chips → mbb/hand (B_BLIND = 2 chips)
    out["a_minus_b_mbb_per_hand"] = d.aivat_mean / 2.0 * 1000.0
    out["stderr_mbb"] = d.aivat_stderr / 2.0 * 1000.0
    out["raw_mbb_per_hand"] = d.raw_mean / 2.0 * 1000.0
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
