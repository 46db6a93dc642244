"""Exhaustive river abstraction: all 123,156,254 canonical isomorphisms.

The reference's river street is an exact-equity table over every river
isomorphism (ref: crates/lloyd/src/lookup.rs:177-193 ``grow(Rive)``; the
3.02 GB artifact in its README "System requirements"), quantized to
0..=100 equity buckets (crates/kicker/src/abstraction.rs:89-103).

Board-factored sweep (vs the reference's per-observation equity calls):

1. Enumerate all C(52,5) = 2,598,960 boards, canonicalize each board
   alone, keep one representative per board class (~1.3M -> 134k). Every
   observation class has a representative over a canonical board (apply
   the board-canonicalizing suit permutation to the pocket too), so
   {canonical boards} x {all C(47,2) = 1081 pockets} covers all classes.
2. Per board, ONE 1326-strength pass + order-statistics counting gives
   every pocket's exact (wins, ties) vs its 990 live opponents
   (native rp_river_board_equities, ~800x fewer evaluator calls).
3. Canonicalize all ~145M (pocket, board) observations (JAX CPU,
   chunked), dedupe on the exact 104-bit canonical words, assert the
   count equals the reference's street.rs oracle: 123,156,254.
4. Hash v2, audit zero collisions, build the open-addressed lookup,
   save artifacts/abstraction_full/river.npz.

Equity is an exact rational count ((wins + ties/2) / 990), so every
representative of a class produces the identical bucket - dedupe can
keep any representative.

Runs entirely on the CPU host (the chip stays free for clustering):
~20 min end to end. Memory: peak ~8 GB (145M x 16B canonical words +
the 2^28-slot lookup build).

    python scripts/build_river.py --out artifacts/abstraction_full
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

# CPU only - never claim the TPU grant (clustering jobs own it)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N_RIVER_CLASSES = 123_156_254  # ref: crates/deuce/src/street.rs:118-146


def canonical_boards(chunk: int = 1 << 18) -> np.ndarray:
    """One representative 5-card board per suit-isomorphism board class."""
    from math import comb

    from robopoker_tpu import native
    from robopoker_tpu.deuce.isomorphism import canonical_key

    total = comb(52, 5)
    no_pocket = jnp.full((chunk, 2), -1, jnp.int32)
    reps, seen_keys = [], []
    t0 = time.time()
    for s in range(0, total, chunk):
        b = native.enumerate_subsets(s, chunk, 5)
        words = np.asarray(canonical_key(no_pocket[: len(b)], jnp.asarray(b)))
        # board-only canonical words: 13-bit masks in the low half
        kv = ((words[:, 0].astype(np.int64) << 13) | words[:, 1]) << 32 \
            | ((words[:, 2].astype(np.int64) << 13) | words[:, 3])
        keep = np.unique(kv, return_index=True)[1]
        reps.append(b[keep])
        seen_keys.append(kv[keep])
    kv = np.concatenate(seen_keys)
    boards = np.concatenate(reps)
    keep = np.unique(kv, return_index=True)[1]
    boards = boards[keep]
    print(f"canonical boards: {len(boards)} of {total} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return boards


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/abstraction_full")
    ap.add_argument("--board-chunk", type=int, default=512)
    ap.add_argument("--key-chunk", type=int, default=1 << 19)
    ap.add_argument("--limit", type=int, default=0,
                    help="board cap for smoke tests (0 = all; skips the "
                         "exact-count assertion)")
    args = ap.parse_args()

    from robopoker_tpu import native
    from robopoker_tpu.deuce.isomorphism import (
        HASH_VERSION, canonical_key, hash_key)
    from robopoker_tpu.deuce.observation import ALL_POCKETS
    from robopoker_tpu.lloyd.lookup import build_lookup

    boards = canonical_boards()
    if args.limit:
        boards = boards[: args.limit]
    nb = len(boards)
    n_obs = nb * 1081  # every board contributes exactly C(47,2) pockets

    words_all = np.empty((n_obs, 4), np.int32)
    buckets_all = np.empty(n_obs, np.uint8)
    pockets32 = ALL_POCKETS.astype(np.int32)  # [1326, 2]

    t0 = time.time()
    w = 0
    for s in range(0, nb, args.board_chunk):
        bchunk = boards[s:s + args.board_chunk]
        c = len(bchunk)
        eq, valid = native.river_board_equities(bchunk)
        v = valid.astype(bool)                               # [c, 1326]
        # river abstraction = equity quantized 0..=100 (abstraction.rs:89)
        bk = np.clip((eq * 100 + 0.5).astype(np.int32), 0, 100)
        pk = np.broadcast_to(pockets32[None], (c, 1326, 2))[v]
        bd = np.repeat(bchunk[:, None, :].astype(np.int32), 1326, 1)[v]
        n = len(pk)
        for i in range(0, n, args.key_chunk):
            words_all[w + i:w + min(i + args.key_chunk, n)] = np.asarray(
                canonical_key(jnp.asarray(pk[i:i + args.key_chunk]),
                              jnp.asarray(bd[i:i + args.key_chunk])))
        buckets_all[w:w + n] = bk[v]
        w += n
        if (s // args.board_chunk) % 32 == 0:
            rate = w / max(time.time() - t0, 1e-9)
            print(f"  boards {s}/{nb}: {w} observations "
                  f"({rate:,.0f} obs/s, eta {(n_obs-w)/max(rate,1):.0f}s)",
                  flush=True)
    assert w == n_obs, (w, n_obs)
    print(f"swept {w} observations in {time.time()-t0:.0f}s", flush=True)

    # exact dedupe on the 104-bit canonical words
    t0 = time.time()
    view = words_all.view([("", np.int32)] * 4).ravel()
    _, keep = np.unique(view, return_index=True)
    words = words_all[keep]
    buckets = buckets_all[keep]
    del words_all, buckets_all, view
    print(f"{len(words)} canonical river classes ({time.time()-t0:.0f}s)",
          flush=True)
    if not args.limit and len(words) != N_RIVER_CLASSES:
        raise SystemExit(
            f"class count {len(words)} != street.rs oracle {N_RIVER_CLASSES}")

    # hash v2 + collision audit (birthday estimate at 123M keys in 64
    # bits is ~4e-4 collisions; any observed collision is a hash defect)
    t0 = time.time()
    h1 = np.empty(len(words), np.int32)
    h2 = np.empty(len(words), np.int32)
    for i in range(0, len(words), args.key_chunk):
        a, b = hash_key(jnp.asarray(words[i:i + args.key_chunk]))
        h1[i:i + args.key_chunk] = np.asarray(a)
        h2[i:i + args.key_chunk] = np.asarray(b)
    pairs = (h1.astype(np.int64) << 32) ^ (h2.astype(np.int64) & 0xFFFFFFFF)
    n_unique = len(np.unique(pairs))
    if n_unique != len(words):
        raise SystemExit(f"hash v{HASH_VERSION} collides: "
                         f"{len(words) - n_unique} of {len(words)}")
    del pairs
    print(f"hashed + audited in {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    lookup = build_lookup(h1, h2, buckets.astype(np.int32),
                          hash_version=HASH_VERSION)
    print(f"lookup built: capacity {lookup.capacity}, probes "
          f"{lookup.probes} ({time.time()-t0:.0f}s)", flush=True)

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    grid = np.abs(np.arange(101)[:, None] - np.arange(101)[None, :]) / 100.0
    # training points are NOT stored (123M x 7B; the sweep itself is the
    # regeneration path and reruns in ~20 min) - assignment keeps the
    # per-class buckets for street stats
    compact = lookup.compact()
    compact["lookup_val"] = compact["lookup_val"].astype(np.uint8)  # 0..100
    tmp = out / "river.tmp.npz"
    np.savez_compressed(
        tmp, centroids=np.eye(101, dtype=np.float32),
        metric=grid.astype(np.float32), assignment=buckets,
        **compact,
    )
    tmp.replace(out / "river.npz")
    print(f"river artifact -> {out / 'river.npz'}", flush=True)


if __name__ == "__main__":
    main()
