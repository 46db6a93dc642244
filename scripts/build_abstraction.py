"""Full/large-scale hierarchical abstraction build.

The production counterpart of the reference's ``trainer --cluster``
(ref: crates/forge/src/pretraining.rs, SURVEY §3.1): enumerate canonical
observations per street with the native combinadic kernels, build
feature histograms on the TPU, run the k-means pipeline in reverse
street order, and persist artifacts + lookups.

Scale is driven by --budget (canonical points per street); the full
sweep (14M turn / 1.3M flop isos) is the same code at budget=0 (all).

    python scripts/build_abstraction.py --budget 200000 --k 256 \
        --out artifacts/abstraction
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def canonical_sample(n_board: int, budget: int, chunk: int = 1 << 16,
                     seed: int = 0):
    """Collect up to `budget` distinct canonical observations (or all if
    budget == 0) by scanning the native enumeration in strided chunks."""
    import jax.numpy as jnp

    from robopoker_tpu import native
    from robopoker_tpu.deuce.isomorphism import canonical_key

    from robopoker_tpu.deuce.isomorphism import hash_key

    def exact_pack(words_np):
        """[N,4] canonical words (26-bit each) → [N,2] int64 EXACT key.

        The exhaustive sweep must dedupe on the exact 104-bit identity:
        the 64-bit hash_key words collide for ~792 of the 13.96M turn
        classes (its per-pair linear combines w0*c+w1 admit structured
        collisions), silently merging distinct isomorphism classes and
        undercounting vs the reference's street.rs oracle."""
        w = words_np.astype(np.int64)
        return np.column_stack([(w[:, 0] << 26) | w[:, 1],
                                (w[:, 2] << 26) | w[:, 3]])

    def unique_rows(kv):
        """Indices of first occurrences of unique [N,2] int64 rows."""
        v = kv.view([("a", np.int64), ("b", np.int64)]).ravel()
        return np.unique(v, return_index=True)[1]

    total = native.n_observations(n_board)
    rng = np.random.default_rng(seed)
    # random-origin strided scan: covers the space uniformly-ish without
    # enumerating all observations when budget << total; budget == 0
    # walks every observation (the exhaustive sweep)
    n_chunks = max(1, min(total // chunk, 65536))
    starts = (np.sort(rng.integers(0, total, size=n_chunks))
              if budget else np.arange(0, total, chunk))
    t0 = time.time()
    seen_hashes = np.empty(0, np.int64)
    pockets_acc, boards_acc, hashes_acc = [], [], []
    count = 0
    for i, s in enumerate(starts):
        p, b = native.enumerate_observations(int(s), chunk, n_board)
        words = jnp.asarray(
            canonical_key(jnp.asarray(p), jnp.asarray(b))
        )
        if not budget:
            # exhaustive: dedupe on the EXACT packed words (hash dedupe
            # merged 792 turn classes); a per-chunk isin against the
            # (millions-deep) accumulated set re-sorts it every chunk —
            # dedupe per chunk and compact the accumulators every 2048
            # chunks instead, which bounds host memory across the heavy
            # cross-chunk duplication of a river-scale sweep (ADVICE
            # round-1 #4) while keeping the final global unique cheap.
            kv = exact_pack(np.asarray(words))
            keep = unique_rows(kv)
            hashes_acc.append(kv[keep])
            pockets_acc.append(p[keep].astype(np.int8))
            boards_acc.append(b[keep].astype(np.int8))
            count += len(keep)
            if len(hashes_acc) >= 2048:
                kv_all = np.concatenate(hashes_acc)
                keep_all = unique_rows(kv_all)
                hashes_acc = [kv_all[keep_all]]
                pockets_acc = [np.concatenate(pockets_acc)[keep_all]]
                boards_acc = [np.concatenate(boards_acc)[keep_all]]
                count = len(keep_all)
            if i % 64 == 0:
                print(f"  scan {i}/{len(starts)}: {count} canonical "
                      f"({time.time()-t0:.0f}s)", flush=True)
            continue
        h1, h2 = hash_key(words)
        h = (np.asarray(h1).astype(np.int64) << 32) | (
            np.asarray(h2).astype(np.int64) & 0xFFFFFFFF
        )
        # sampled path: vectorized two-stage dedupe (within-chunk by hash,
        # then vs seen) — hash collisions only cost a dropped sample here
        uniq, idx = np.unique(h, return_index=True)
        fresh = ~np.isin(uniq, seen_hashes, assume_unique=False)
        keep = idx[fresh]
        seen_hashes = np.concatenate([seen_hashes, uniq[fresh]])
        pockets_acc.append(p[keep])
        boards_acc.append(b[keep])
        count += len(keep)
        if count >= budget:
            break
        if i % 64 == 0:
            print(f"  scan {i}/{len(starts)}: {count} canonical "
                  f"({time.time()-t0:.0f}s)", flush=True)
    pockets = np.concatenate(pockets_acc)[: budget or None].astype(np.int32)
    boards = np.concatenate(boards_acc)[: budget or None].astype(np.int32)
    if not budget:
        kv = np.concatenate(hashes_acc)
        keep = unique_rows(kv)
        pockets, boards = pockets[keep], boards[keep]
    print(f"street {n_board}-board: {len(pockets)} canonical points "
          f"({time.time()-t0:.0f}s)", flush=True)
    return pockets, boards


def main():
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=100_000,
                    help="canonical points per street (0 = exhaustive)")
    ap.add_argument("--turn-budget", type=int, default=None,
                    help="override turn budget (0 = exhaustive)")
    ap.add_argument("--flop-budget", type=int, default=None,
                    help="override flop budget (0 = exhaustive)")
    ap.add_argument("--river-budget", type=int, default=None,
                    help="override river budget (0 = exhaustive: 123M "
                         "isos — a multi-hour scan)")
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--flop-iters", type=int, default=None,
                    help="override flop k-means iterations (Sinkhorn "
                         "assignment dominates the exhaustive sweep)")
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--prune-m", type=int, default=0,
                    help="flop assignment shortlist width (0 = exact "
                         "full-K Sinkhorn; 16 cuts iteration time ~K/M)")
    ap.add_argument("--out", default="artifacts/abstraction")
    ap.add_argument("--streets", default="turn,flop",
                    help="comma list; 'flop' alone reuses <out>/turn.npz")
    args = ap.parse_args()

    import jax

    from robopoker_tpu.lloyd import cluster_flop, cluster_turn
    from robopoker_tpu.lloyd.lookup import IsoLookup
    from robopoker_tpu.lloyd.pipeline import StreetArtifacts
    from robopoker_tpu.pokerkit.hyperparams import KmeansHyperParams

    hp = KmeansHyperParams(iterations=args.iters)
    key = jax.random.PRNGKey(0)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    streets = set(args.streets.split(","))

    def save_street(name, art, pocket, board):
        # compact triplet lookup (rebuilt exactly at load), int8 cards,
        # uint8 assignment (K ≤ 256): the exhaustive turn street (13.96M
        # points) stays a git-committable artifact
        np.savez_compressed(
            out / f"{name}.npz", centroids=art.centroids, metric=art.metric,
            assignment=np.asarray(art.assignment).astype(np.uint8),
            pocket=pocket.astype(np.int8), board=board.astype(np.int8),
            **art.lookup.compact(),
        )

    turn_budget = args.budget if args.turn_budget is None else args.turn_budget
    flop_budget = ((args.budget // 2 if args.budget else 0)
                   if args.flop_budget is None else args.flop_budget)

    if "river" in streets:
        from robopoker_tpu.lloyd.pipeline import build_river

        print("== river street ==", flush=True)
        p5, b5 = canonical_sample(
            5, args.budget if args.river_budget is None else args.river_budget
        )
        t0 = time.time()
        river = build_river(p5, b5, chunk=max(args.chunk, 2048))
        print(f"river tabulated in {time.time()-t0:.0f}s", flush=True)
        save_street("river", river, p5, b5)

    if "turn" in streets:
        print("== turn street ==", flush=True)
        p4, b4 = canonical_sample(4, turn_budget)
        t0 = time.time()
        turn = cluster_turn(p4, b4, k=args.k, key=key, chunk=args.chunk, hp=hp,
                            checkpoint_dir=out / "ckpt_turn")
        print(f"turn clustered in {time.time()-t0:.0f}s", flush=True)
        save_street("turn", turn, p4, b4)
    else:
        from robopoker_tpu.lloyd.lookup import load_lookup

        with np.load(out / "turn.npz") as z:
            turn = StreetArtifacts(
                2, z["centroids"], load_lookup(z), z["metric"],
                z["assignment"],
            )
        print(f"turn artifact loaded: {turn.centroids.shape[0]} clusters, "
              f"{len(turn.assignment)} points", flush=True)

    flop = None
    if "flop" in streets:
        print("== flop street ==", flush=True)
        p3, b3 = canonical_sample(3, flop_budget)
        t0 = time.time()
        fhp = (hp if args.flop_iters is None
               else KmeansHyperParams(iterations=args.flop_iters))
        flop = cluster_flop(p3, b3, turn, k=args.k, key=key,
                            chunk=max(args.chunk // 4, 256), hp=fhp,
                            checkpoint_dir=out / "ckpt_flop",
                            prune_m=args.prune_m)
        print(f"flop clustered in {time.time()-t0:.0f}s", flush=True)
        save_street("flop", flop, p3, b3)

    if "preflop" in streets:
        from robopoker_tpu.lloyd.lookup import load_lookup
        from robopoker_tpu.lloyd.pipeline import build_preflop

        if flop is None:
            with np.load(out / "flop.npz") as z:
                flop = StreetArtifacts(1, z["centroids"], load_lookup(z),
                                       z["metric"], z["assignment"])
        print("== preflop street ==", flush=True)
        t0 = time.time()
        pref = build_preflop(flop)
        print(f"preflop built in {time.time()-t0:.0f}s", flush=True)
        save_street("preflop", pref, pref.pocket, pref.board)
    print(f"artifacts → {out}", flush=True)


if __name__ == "__main__":
    main()
