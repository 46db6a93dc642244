"""LBR exploitability-lower-bound curve over training checkpoints.

Replays the epoch-stamped compact snapshot history that FastSession
writes (artifacts/compact/ep*.npz) through ``lbr_eval`` at a fixed
seed, producing the blueprint convergence curve the reference can only
approximate via its slumbot winrate dashboard (SURVEY §6).

Runs on CPU by default so it can evaluate snapshots while the chip is
busy training; pass --tpu to use the device.

    python scripts/lbr_curve.py --abstraction artifacts/abstraction \
        --hands 1024 --out docs/lbr_curve.jsonl
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="artifacts")
    ap.add_argument("--abstraction", default="artifacts/abstraction")
    ap.add_argument("--hands", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--rollouts", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mode", choices=("fc", "fcpa"), default="fc")
    ap.add_argument("--out", default="docs/lbr_curve.jsonl")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the device (default: CPU so the chip "
                    "stays free for training)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from robopoker_tpu.nlhe.abstraction import LookupBucket, proxy_bucket
    from robopoker_tpu.pokerkit.regime import RunConfig
    from robopoker_tpu.serving.lbr import lbr_eval
    from robopoker_tpu.utils.checkpoint import load_compact

    # mirror cli.py's RunConfig wiring: the bucket provider is part of
    # the fingerprint, so snapshots written by `train --abstraction X`
    # only load under the same bucket tag
    if args.abstraction:
        bucket = LookupBucket.load(args.abstraction)
        run = RunConfig(bucket=f"lookup:{args.abstraction}")
    else:
        bucket = proxy_bucket
        run = RunConfig()

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    done = set()
    if out.exists():
        for line in out.read_text().splitlines():
            if line:
                done.add(json.loads(line)["epoch"])

    snaps = sorted((pathlib.Path(args.workdir) / "compact").glob("ep*.npz"))
    if not snaps:
        print("no snapshot history found", file=sys.stderr)
        return
    for snap in snaps:
        epoch = int(snap.stem[2:])
        if epoch in done:
            continue
        table = load_compact(snap, run)
        r = lbr_eval(table, bucket, n_hands=args.hands, batch=args.batch,
                     n_rollouts=args.rollouts, seed=args.seed,
                     mode=args.mode)
        row = {"epoch": epoch, **r}
        with out.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"ep{epoch:6d}  LBR {r['lbr_mbb_per_hand']:+9.1f} "
              f"± {r['stderr_mbb']:.1f} mbb/hand  ({r['hands']} hands)",
              flush=True)

    # markdown twin for the docs
    rows = [json.loads(l) for l in out.read_text().splitlines() if l]
    rows.sort(key=lambda r: r["epoch"])
    md = out.with_suffix(".md")
    with md.open("w") as f:
        f.write("# LBR exploitability lower bound vs training epoch\n\n")
        f.write(f"mode={args.mode}, hands={args.hands}, "
                f"rollouts={args.rollouts}, seed={args.seed}. "
                "Negative = LBR loses to the blueprint (bound satisfied).\n\n")
        f.write("| epoch | LBR mbb/hand | stderr |\n|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['epoch']} | {r['lbr_mbb_per_hand']:+.1f} "
                    f"| ±{r['stderr_mbb']:.1f} |\n")
    print(f"wrote {out} and {md}")


if __name__ == "__main__":
    main()
