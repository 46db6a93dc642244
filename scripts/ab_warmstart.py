"""A/B the warmstart bias (ref: crates/kicker/src/bias.rs) on CPU.

Trains two identically-seeded small NLHE blueprints — one with
BiasHyperParams() seeding fresh rows, one without — then scores both
with fc-LBR and the 48-case litmus. The reference's production default
is ACTIVE bias; round-2's litmus failures (AQo over-jam, rag
stuck-folds) are the fresh-row-transient symptoms bias exists to damp
(VERDICT r2 next-round #3). This pins the default with evidence, the
same way round-1's parity A/B did (logs/parity_ab.log).

Runs pinned to the host CPU backend so it can share the session with a
chip-bound production train.

    python3 scripts/ab_warmstart.py --epochs 800 --out logs/ab_warmstart.log
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=800)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--table-log2", type=int, default=18)
    ap.add_argument("--hands", type=int, default=1024)
    ap.add_argument("--workdir", default="artifacts/ab_warmstart")
    args = ap.parse_args()

    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from robopoker_tpu.nlhe.abstraction import proxy_bucket
    from robopoker_tpu.nlhe.forge import FastSession
    from robopoker_tpu.nlhe.trainer import TrainerConfig
    from robopoker_tpu.pokerkit.hyperparams import BiasHyperParams
    from robopoker_tpu.serving import litmus
    from robopoker_tpu.serving.lbr import lbr_eval
    from robopoker_tpu.serving.policy import Blueprint

    scen = str(pathlib.Path(__file__).parent.parent / "robopoker_tpu"
               / "serving" / "scenarios.json")
    results = {}
    for label, bias in (("nobias", None), ("bias", BiasHyperParams())):
        wd = pathlib.Path(args.workdir) / label
        wd.mkdir(parents=True, exist_ok=True)
        cfg = TrainerConfig(
            batch=args.batch, table_log2=args.table_log2,
            work_cap=4096, cap=1024, warmstart_bias=bias,
        )
        s = FastSession(workdir=str(wd), trainer=cfg)
        t0 = time.time()
        s.train(args.epochs)
        train_s = time.time() - t0
        lbr = lbr_eval(s.table, proxy_bucket, n_hands=args.hands,
                       batch=64, n_rollouts=32, seed=0, mode="fc")
        md, ok = litmus.run(Blueprint(s.table, bucket_fn=None), scen)
        # header line: "**N/M passed**"
        score = next((l.strip("* ") .split()[0] for l in md.splitlines()
                      if l.startswith("**")), "?")
        results[label] = {
            "train_s": round(train_s, 1),
            "lbr_mbb": lbr["lbr_mbb_per_hand"],
            "lbr_stderr": lbr["stderr_mbb"],
            "litmus": score,
        }
        print(f"[{label}] {json.dumps(results[label])}", flush=True)
        (wd / "litmus.md").write_text(md)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
