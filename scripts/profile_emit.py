"""Measure the per-level walker-node emit profile under full artifacts.

The trainer's segmented level_caps are sized from EMIT_PROFILE /
EMIT_PROFILE_EVEN (nlhe/trainer.py). Round 1 profiled them on the
300k-point artifacts and reused them under the exhaustive ones — the
mismatch dropped ~3% of nodes in the production run (systematic coverage
loss; VERDICT round-1 weak #3). This re-measures with UNCLIPPED generous
caps on the real abstraction and prints replacement profiles.

    python scripts/profile_emit.py --abstraction artifacts/abstraction_full
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--abstraction", default="artifacts/abstraction_full")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--work-cap", type=int, default=49152)
    ap.add_argument("--epochs", type=int, default=16, help="per parity")
    ap.add_argument("--table-log2", type=int, default=20)
    ap.add_argument("--cap", type=int, default=4096,
                    help="per-tree slot cap (generous: nothing may clip)")
    ap.add_argument("--workdir", default=None,
                    help="resume the profiling run from this workdir's "
                         "blueprint_compact.npz — measures the emit "
                         "profile under the CURRENT strategy (trees "
                         "widen as the strategy sharpens; a fresh-table "
                         "profile under-provisions long trains)")
    args = ap.parse_args()

    import jax

    from robopoker_tpu.mccfr import LINEAR_REGRET, LINEAR_WEIGHT, PLURIBUS_SAMPLING
    from robopoker_tpu.nlhe import TrainerConfig, init_table, make_nlhe_step
    from robopoker_tpu.nlhe.abstraction import LookupBucket, proxy_bucket

    bucket = (LookupBucket.load(args.abstraction)
              if args.abstraction else proxy_bucket)
    cfg = TrainerConfig(batch=args.batch, work_cap=args.work_cap,
                        cap=args.cap, table_log2=args.table_log2)
    step = make_nlhe_step(bucket, LINEAR_REGRET, LINEAR_WEIGHT,
                          PLURIBUS_SAMPLING, cfg)
    if args.workdir:
        from robopoker_tpu.pokerkit.regime import RunConfig
        from robopoker_tpu.utils.checkpoint import load_compact

        run = RunConfig(bucket=f"lookup:{args.abstraction}")
        table = load_compact(
            pathlib.Path(args.workdir) / "blueprint_compact.npz", run)
        print(f"profiling from checkpoint epoch {int(table.epoch)}")
    else:
        table = init_table(args.table_log2)
    key = jax.random.PRNGKey(0)

    epoch0 = int(table.epoch)  # walker parity follows the DEVICE epoch
    peaks = {0: None, 1: None}  # parity -> [max_levels] peak emits
    drops = 0
    t0 = time.time()
    for t in range(2 * args.epochs):
        table, m = step(table, jax.random.fold_in(key, t))
        emit = np.asarray(m["level_emit"], np.float64) / args.batch
        drops += int(m["dropped"])
        par = (epoch0 + t) % 2
        peaks[par] = emit if peaks[par] is None else np.maximum(peaks[par], emit)
        print(f"epoch {t} (walker {par}): emit/tree "
              f"{np.round(emit, 1).tolist()} dropped {int(m['dropped'])} "
              f"({time.time()-t0:.0f}s)", flush=True)
    assert drops == 0, (
        f"{drops} drops under generous caps - raise --work-cap and rerun")

    def fmt(p):
        return tuple(float(np.ceil(v)) for v in p)

    print("\nEMIT_PROFILE (odd walker / seat 1, wide) =", fmt(peaks[1]))
    print("EMIT_PROFILE_EVEN (seat 0, narrow)        =", fmt(peaks[0]))


if __name__ == "__main__":
    main()
