"""Litmus a compact checkpoint directly (bypasses FastSession's
dense-checkpoint preference — during a live train the dense file is the
stale previous exit; the compact twin is the fresh one)."""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint",
                    default="artifacts/r2/blueprint_compact.npz")
    ap.add_argument("--abstraction", default="artifacts/abstraction_full")
    args = ap.parse_args()
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from robopoker_tpu.nlhe.abstraction import LookupBucket
    from robopoker_tpu.pokerkit.regime import RunConfig
    from robopoker_tpu.serving import litmus
    from robopoker_tpu.serving.policy import Blueprint
    from robopoker_tpu.utils.checkpoint import load_compact

    bucket = LookupBucket.load(args.abstraction)
    run = RunConfig(bucket=f"lookup:{args.abstraction}")
    table = load_compact(args.checkpoint, run)
    print(f"litmus @ epoch {int(table.epoch)}")
    scen = str(pathlib.Path(__file__).parent.parent / "robopoker_tpu"
               / "serving" / "scenarios.json")
    md, ok = litmus.run(Blueprint(table, bucket_fn=bucket), scen)
    print(md)


if __name__ == "__main__":
    main()
