"""Trainer cost-split profiling on the real chip.

Times the flagship epoch step under config variants to locate where the
epoch budget goes (level passes vs tail roll vs table update) and to
smoke the probing + LookupBucket path on hardware before a long run.

    python scripts/profile_trainer.py --abstraction artifacts/abstraction
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def run_variant(name, bucket_fn, cfg, steps=8):
    import jax

    from robopoker_tpu.mccfr import (LINEAR_REGRET, LINEAR_WEIGHT,
                                     PLURIBUS_SAMPLING)
    from robopoker_tpu.nlhe import init_table, make_nlhe_step

    step = make_nlhe_step(bucket_fn, LINEAR_REGRET, LINEAR_WEIGHT,
                          PLURIBUS_SAMPLING, cfg)
    table = init_table(cfg.table_log2)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    table, m = step(table, key)
    jax.block_until_ready(table)
    compile_s = time.time() - t0
    t0 = time.time()
    nodes = 0
    for _ in range(steps):
        table, m = step(table, key)
        nodes += int(m["nodes"])
    jax.block_until_ready(table)
    dt = time.time() - t0
    print(f"{name:28s} compile {compile_s:6.1f}s  "
          f"{dt/steps*1000:8.1f} ms/epoch  {nodes/dt:9.0f} dec/s  "
          f"dropped {int(m['dropped'])}  fallbacks {int(m['fallbacks'])}",
          flush=True)
    return nodes / dt


def main():
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--abstraction", default=None)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    from robopoker_tpu.nlhe import TrainerConfig, proxy_bucket

    bucket = proxy_bucket
    if args.abstraction:
        from robopoker_tpu.nlhe.abstraction import LookupBucket

        bucket = LookupBucket.load(args.abstraction)

    from robopoker_tpu.nlhe.trainer import segmented_caps

    base = dict(batch=256, work_cap=24576, cap=1536, max_levels=8,
                roll_steps=5, tail_steps=16, table_log2=21)
    seg = segmented_caps(base["batch"])
    variants = [
        ("baseline", TrainerConfig(**base)),
        ("work_cap=12288", TrainerConfig(**{**base, "work_cap": 12288})),
        ("segmented", TrainerConfig(**base, level_caps=seg)),
        ("seg+batch=512", TrainerConfig(
            **{**base, "batch": 512}, level_caps=segmented_caps(512))),
        ("seg+margin=1.1", TrainerConfig(
            **base, level_caps=segmented_caps(base["batch"], margin=1.1))),
        ("seg+probes=4", TrainerConfig(
            **{**base, "n_probes": 4}, level_caps=seg)),
        ("seg+roll=4", TrainerConfig(
            **{**base, "roll_steps": 4}, level_caps=seg)),
    ]
    for name, cfg in variants:
        run_variant(name, bucket, cfg, steps=args.steps)


if __name__ == "__main__":
    main()
