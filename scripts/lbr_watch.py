"""Decisive LBR curve: watch a training run's snapshots and score each.

VERDICT r2 next-round #4: the round-2 curve's ±900-1,030 stderr at
1,024 hands made consecutive checkpoints indistinguishable. This runner
gets the stderr down by (a) 8-16x the hands and (b) AIVAT control
variates, and removes the per-checkpoint ~4-minute CPU recompile by
compiling the LBR program ONCE and threading each checkpoint's table
through as an argument (make_lbr_play's .jitted hook).

Runs CPU-pinned alongside the chip train; appends one JSON line per
scored checkpoint to --out and keeps watching until --until-epoch or
the snapshot stream goes quiet.

    python3 scripts/lbr_watch.py --workdir artifacts/r2 \
        --abstraction artifacts/abstraction_full --hands 16384
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
    ap.add_argument("--hands", type=int, default=16_384)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--rollouts", type=int, default=32)
    ap.add_argument("--mode", default="fc")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--min-epoch-gap", type=int, default=900,
                    help="skip checkpoints closer than this to the last "
                         "scored one")
    ap.add_argument("--idle-exit-s", type=float, default=3600.0,
                    help="exit after this long with no new checkpoint")
    ap.add_argument("--out", default="docs/lbr_curve_r3.jsonl")
    ap.add_argument("--tpu", action="store_true",
                    help="score on the device (post-train sweep: each "
                         "16k-hand point is seconds instead of tens of "
                         "CPU minutes)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from robopoker_tpu.nlhe.abstraction import LookupBucket, proxy_bucket
    from robopoker_tpu.pokerkit.regime import RunConfig
    from robopoker_tpu.serving.lbr import make_lbr_play
    from robopoker_tpu.utils.checkpoint import load_compact

    if args.abstraction:
        bucket = LookupBucket.load(args.abstraction)
        run = RunConfig(bucket=f"lookup:{args.abstraction}")
    else:
        bucket, run = proxy_bucket, RunConfig()

    compact_dir = pathlib.Path(args.workdir) / "compact"
    out = pathlib.Path(args.out)
    out.parent.mkdir(exist_ok=True)
    scored = set()
    if out.exists():
        for line in out.read_text().splitlines():
            try:
                scored.add(int(json.loads(line)["epoch"]))
            except Exception:
                pass

    play = None
    key = jax.random.PRNGKey(args.seed)
    last_new = time.time()
    while True:
        cks = sorted(compact_dir.glob("ep*.npz"))
        todo = []
        for p in cks:
            ep = int(p.stem[2:])
            if ep in scored:
                continue
            if scored and min(abs(ep - s) for s in scored) < args.min_epoch_gap:
                # too close to an already-scored point; skip QUIETLY but
                # don't mark scored (a later pass may widen the grid)
                continue
            todo.append((ep, p))
        if not todo:
            if time.time() - last_new > args.idle_exit_s:
                print("idle — exiting")
                return
            time.sleep(60)
            continue
        # newest first: the freshest checkpoint is the most informative
        ep, path = todo[-1]
        t0 = time.time()
        table = load_compact(path, run)
        if play is None:
            play = make_lbr_play(table, bucket, batch=args.batch,
                                 n_rollouts=args.rollouts, mode=args.mode,
                                 aivat=True)
        chips, cchips = [], []
        n_batches = max(1, args.hands // args.batch)
        for b in range(n_batches):
            pnl, cor, done = play.jitted(
                jax.random.fold_in(key, b), jnp.int32(b % 2), table,
                *play.extra_args)
            done = np.asarray(done)
            chips.append(np.asarray(pnl)[done])
            cchips.append(np.asarray(cor)[done])
        from robopoker_tpu.serving.aivat import guard_corrected

        mbb = np.concatenate(chips) / 2.0 * 1000.0
        amb = np.concatenate(cchips) / 2.0 * 1000.0
        n = len(mbb)
        amb, reduction, fell_back = guard_corrected(mbb, amb)
        rec = {
            "epoch": ep, "hands": int(n), "mode": args.mode,
            "lbr_mbb": float(mbb.mean()),
            "stderr": float(mbb.std(ddof=1) / np.sqrt(n)),
            "lbr_mbb_aivat": float(amb.mean()),
            "stderr_aivat": float(amb.std(ddof=1) / np.sqrt(n)),
            "aivat_reduction": reduction,
            **({"aivat_fallback": True} if fell_back else {}),
            "wall_s": round(time.time() - t0, 1),
        }
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        scored.add(ep)
        last_new = time.time()
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
