"""Command-line entry points.

TPU-native counterpart of the reference's binaries
(ref: bin/{trainer,backend,litmus,slumbot}/src/main.rs): one argparse
front door with subcommands —

    python -m robopoker_tpu train    [--epochs N] [--workdir DIR] [--mesh N]
    python -m robopoker_tpu cluster  [--street S] [--samples N]
    python -m robopoker_tpu status   [--workdir DIR]
    python -m robopoker_tpu reset    [--workdir DIR]
    python -m robopoker_tpu litmus   [--scenarios FILE] [--workdir DIR]
    python -m robopoker_tpu serve    [--port P] [--workdir DIR]
    python -m robopoker_tpu bench

Mode semantics mirror forge's Mode enum (ref: crates/forge/src/mode.rs).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys



def _bucket_session(args):
    """FastSession + bucket_fn matching the training fingerprint."""
    from .nlhe.forge import FastSession

    bucket = None
    run_kw = {}
    if getattr(args, "abstraction", None):
        from .nlhe.abstraction import LookupBucket
        from .pokerkit.regime import RunConfig

        bucket = LookupBucket.load(args.abstraction)
        run_kw["run"] = RunConfig(bucket=f"lookup:{args.abstraction}")
    session = FastSession(workdir=args.workdir, bucket_fn=bucket, **run_kw)
    return session, (bucket or None)


def main(argv=None):
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(prog="robopoker_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="blueprint MCCFR training (forge fast mode)")
    t.add_argument("--epochs", type=int, default=None)
    t.add_argument("--workdir", default="artifacts")
    t.add_argument("--batch", type=int, default=128)
    t.add_argument("--mesh", type=int, default=0,
                   help="data-parallel devices (0 = single chip)")
    t.add_argument("--table-log2", type=int, default=20)
    t.add_argument("--work-cap", type=int, default=8192)
    t.add_argument("--cap", type=int, default=1536)
    t.add_argument("--max-levels", type=int, default=8)
    t.add_argument("--segmented", action="store_true",
                   help="unrolled per-level worklist widths (measured "
                        "emit profile) instead of constant work-cap")
    t.add_argument("--parity", action="store_true",
                   help="walker-parity-specialized steps (even-walker "
                        "trees are ~3x narrower; implies --segmented)")
    t.add_argument("--cap-margin", type=float, default=1.4,
                   help="headroom multiplier over the measured emit "
                        "profile; trees WIDEN as the strategy sharpens "
                        "past the warmup-measured profile, so long runs "
                        "need 1.8-2.0 (drops are coverage loss)")
    t.add_argument("--abstraction", default=None,
                   help="dir with turn.npz/flop.npz → LookupBucket "
                        "(default: proxy buckets)")
    t.add_argument("--warmstart-bias", action="store_true",
                   help="seed fresh infoset rows' legal columns with the "
                        "reference's warmstart bias weights (~50/25/25 "
                        "fold/call/raise, shove unseeded; ref: "
                        "crates/kicker/src/bias.rs — the reference's "
                        "production default is ACTIVE bias)")
    t.add_argument("--no-adaptive-caps", action="store_true",
                   help="disable in-run emit re-measurement + cap-widening "
                        "recompiles (drop-rate creep returns; see "
                        "FastSession.adaptive_caps)")
    t.add_argument("--settle", choices=("jnp", "pallas"), default="jnp",
                   help="terminal-settlement kernel (pallas = fused "
                        "Mosaic evaluate+compare+pnl; bit-identical)")
    t.add_argument("--drop-rate", type=float, default=0.005,
                   help="marginal dropped-nodes rate that triggers an "
                        "adaptive cap-widening recompile")
    t.add_argument("--lbr-every-min", type=float, default=0.0,
                   help="score the live table with fc-LBR every N min "
                        "(0 = off; VERDICT r4 #4 in-train chip LBR)")
    t.add_argument("--lbr-hands", type=int, default=16_384)
    t.add_argument("--flush-min", type=float, default=30.0,
                   help="snapshot cadence in minutes (each flush also "
                        "appends an epoch-stamped compact checkpoint "
                        "for convergence curves)")

    c = sub.add_parser("cluster", help="abstraction pipeline (reduced or full)")
    c.add_argument("--samples", type=int, default=4096)
    c.add_argument("--k", type=int, default=64)
    c.add_argument("--workdir", default="artifacts")

    s = sub.add_parser("status")
    s.add_argument("--workdir", default="artifacts")

    r = sub.add_parser("reset")
    r.add_argument("--workdir", default="artifacts")

    fg = sub.add_parser("forget")
    fg.add_argument("--workdir", default="artifacts")

    l = sub.add_parser("litmus")
    l.add_argument("--scenarios", default=None)
    l.add_argument("--workdir", default="artifacts")
    l.add_argument("--abstraction", default=None)
    l.add_argument("--why", action="store_true",
                   help="append the per-failing-case table-row probe "
                        "(visits/regret/policy + epoch-bound-vs-"
                        "structural verdict)")

    sb = sub.add_parser("slumbot", help="play the flagship against "
                                        "slumbot.com (ref: spar binary)")
    sb.add_argument("--workdir", default="artifacts")
    sb.add_argument("--abstraction", default=None)
    sb.add_argument("--hands", type=int, default=100)
    sb.add_argument("--sample", action="store_true",
                    help="sample the policy instead of dirac argmax")

    x = sub.add_parser("lbr", help="LBR exploitability lower bound vs the "
                                   "trained blueprint")
    x.add_argument("--workdir", default="artifacts")
    x.add_argument("--abstraction", default=None)
    x.add_argument("--hands", type=int, default=2048)
    x.add_argument("--batch", type=int, default=64)
    x.add_argument("--rollouts", type=int, default=32)
    x.add_argument("--seed", type=int, default=0)
    x.add_argument("--mode", choices=("fc", "fcpa"), default="fcpa")
    x.add_argument("--aivat", action="store_true",
                   help="variance-reduced estimate via AIVAT control "
                        "variates (blueprint-action + chance terms)")

    v = sub.add_parser("serve", help="HTTP strategy/training API (portal)")
    v.add_argument("--port", type=int, default=8080)
    v.add_argument("--workdir", default="artifacts")
    v.add_argument("--abstraction", default=None)

    cv = sub.add_parser("convert", help="interactive poker-analysis REPL "
                                        "(ref: bin/convert)")
    cv.add_argument("--abstraction", default=None)

    sub.add_parser("bench")

    args = p.parse_args(argv)

    if args.cmd == "train":
        from .nlhe.forge import FastSession
        from .nlhe.trainer import TrainerConfig, segmented_caps

        mesh = None
        if args.mesh:
            from .parallel import make_mesh

            mesh = make_mesh(args.mesh)
        bucket = None
        run_kw = {}
        if args.abstraction:
            from .nlhe.abstraction import LookupBucket
            from .pokerkit.regime import RunConfig

            bucket = LookupBucket.load(args.abstraction)
            print(f"abstraction artifacts: {args.abstraction} "
                  f"(turn={'yes' if bucket.turn else 'no'}, "
                  f"flop={'yes' if bucket.flop else 'no'})")
            # bucket provider is part of the config fingerprint: a
            # checkpoint trained on artifacts must not resume on proxy
            run_kw["run"] = RunConfig(bucket=f"lookup:{args.abstraction}")
        from .pokerkit.hyperparams import TrainingHyperParams

        from .pokerkit.hyperparams import BiasHyperParams

        session = FastSession(
            workdir=args.workdir,
            **run_kw,
            training_hp=TrainingHyperParams(
                flush_interval_s=args.flush_min * 60.0),
            trainer=TrainerConfig(
                batch=args.batch, table_log2=args.table_log2,
                work_cap=args.work_cap, cap=args.cap,
                max_levels=args.max_levels,
                # --parity derives caps from the emit profiles inside
                # make_parity_steps (so adaptive widening stays the
                # single source of truth); --segmented without parity
                # still pins explicit caps here
                level_caps=(segmented_caps(args.batch, args.max_levels,
                                           margin=args.cap_margin)
                            if args.segmented and not args.parity else None),
                warmstart_bias=(BiasHyperParams() if args.warmstart_bias
                                else None),
                settle=args.settle,
            ),
            bucket_fn=bucket,
            mesh=mesh,
            parity_steps=args.parity,
            cap_margin=args.cap_margin,
            adaptive_caps=not args.no_adaptive_caps,
            adaptive_drop_rate=args.drop_rate,
            lbr_every_s=args.lbr_every_min * 60.0,
            lbr_hands=args.lbr_hands,
        )
        session.train(args.epochs)
        return 0

    if args.cmd == "cluster":
        import jax

        from .lloyd import cluster_flop, cluster_turn, sample_observations

        key = jax.random.PRNGKey(0)
        p4, b4 = sample_observations(key, args.samples, 4, rng_seed=0)
        turn = cluster_turn(p4, b4, k=args.k, key=key)
        print(f"turn: {turn.centroids.shape} centroids, "
              f"{len(turn.assignment)} points")
        p3, b3 = sample_observations(key, args.samples // 2, 3, rng_seed=1)
        flop = cluster_flop(p3, b3, turn, k=args.k, key=key)
        print(f"flop: {flop.centroids.shape} centroids")
        out = pathlib.Path(args.workdir)
        out.mkdir(parents=True, exist_ok=True)
        import numpy as np

        np.savez_compressed(
            out / "abstraction.npz",
            turn_centroids=turn.centroids, turn_metric=turn.metric,
            flop_centroids=flop.centroids, flop_metric=flop.metric,
        )
        print(f"artifacts → {out/'abstraction.npz'}")
        return 0

    if args.cmd == "status":
        from .nlhe.forge import status

        print(json.dumps(status(args.workdir), indent=2))
        return 0

    if args.cmd == "reset":
        from .nlhe.forge import reset

        reset(args.workdir)
        print("artifacts dropped")
        return 0

    if args.cmd == "forget":
        from .nlhe.forge import forget

        forget(args.workdir)
        print("gameplay records dropped (blueprint kept)")
        return 0

    if args.cmd == "litmus":
        from .serving import litmus
        from .serving.policy import Blueprint

        session, bucket = _bucket_session(args)
        scen = args.scenarios or str(
            pathlib.Path(__file__).parent / "serving" / "scenarios.json"
        )
        md, ok = litmus.run(Blueprint(session.table, bucket_fn=bucket), scen,
                            why=getattr(args, "why", False))
        print(md)
        return 0 if ok else 1

    if args.cmd == "slumbot":
        import urllib.error
        import urllib.request

        from .serving.policy import Agent, Blueprint
        from .serving.slumbot import Runtime, Session, SlumbotAgent

        session, bucket = _bucket_session(args)
        agent = SlumbotAgent(Blueprint(session.table, bucket_fn=bucket),
                             use_dirac=not args.sample)

        def transport(endpoint, payload):
            # live client: POST to slumbot.com/api/* with the session
            # token (ref: spar/src/session.rs + api.rs)
            data = json.dumps(payload).encode()
            req = urllib.request.Request(
                f"https://slumbot.com/api/{endpoint}", data=data,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=30) as r:
                return json.loads(r.read())

        s = Session(transport=transport, agent=agent)
        try:
            out = Runtime(sessions=[s],
                          hands_per_session=args.hands).run()
        except (urllib.error.URLError, OSError) as e:
            print(f"slumbot.com unreachable ({e}); this environment has "
                  f"no network egress. The transport/session/runtime "
                  f"stack is exercised by tests/test_serving.py's "
                  f"fake-transport suite.")
            return 2
        print(json.dumps(out, indent=2))
        return 0

    if args.cmd == "lbr":
        from .nlhe.abstraction import proxy_bucket
        from .serving.lbr import lbr_eval

        session, bucket = _bucket_session(args)
        res = lbr_eval(session.table, bucket or proxy_bucket,
                       n_hands=args.hands, batch=args.batch,
                       n_rollouts=args.rollouts, seed=args.seed,
                       mode=args.mode, aivat=args.aivat)
        print(json.dumps(res, indent=2))
        return 0

    if args.cmd == "serve":
        from .serving import api
        from .serving.policy import Blueprint, Resolver

        session, bucket = _bucket_session(args)
        bp = Blueprint(session.table, bucket_fn=bucket)
        artifacts = None
        if args.abstraction:
            from .lloyd.pipeline import load_street_artifacts

            artifacts = load_street_artifacts(args.abstraction)
        api.run(bp, Resolver(bp), workdir=args.workdir,
                artifacts=artifacts, port=args.port)
        return 0

    if args.cmd == "convert":
        from .nlhe.abstraction import proxy_bucket
        from .serving.convert import repl

        ctx = {"bucket_fn": proxy_bucket, "artifacts": {}}
        if args.abstraction:
            from .lloyd.pipeline import load_street_artifacts
            from .nlhe.abstraction import LookupBucket

            ctx["bucket_fn"] = LookupBucket.load(args.abstraction)
            ctx["artifacts"] = load_street_artifacts(args.abstraction)
        repl(ctx)
        return 0

    if args.cmd == "bench":
        import runpy

        runpy.run_path(
            str(pathlib.Path(__file__).parent.parent / "bench.py"),
            run_name="__main__",
        )
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
