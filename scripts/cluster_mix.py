"""Diagnose abstraction cluster mixing at the failing litmus value spots.

VERDICT r3 next #6: the 842r-overpair and turn-nut-flush litmus cases
are abstraction-blamed ("cluster space hides made-hand strength").
This measures it: for each spot, find its cluster in the exhaustive
artifact, sample members of that cluster, and summarize their current
hand categories and equities. If the nut hand shares its cluster with
a mass of mediocre holdings, the blueprint's pure-check there is the
cluster average speaking — the fix is feature/K work in the lloyd
pipeline, not more epochs.

    python3 scripts/cluster_mix.py --abstraction artifacts/abstraction_full
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

CATS = ("HighCard", "OnePair", "TwoPair", "Trips", "Straight", "Flush",
        "FullHouse", "Quads", "StraightFlush")

SPOTS = [
    ("QQ on 842r flop (litmus: overpair value line)",
     "Qc Qs", "8d 4c 2h", 1),
    ("AsQs on KsTs2s7d turn (litmus: nut flush bet)",
     "As Qs", "Ks Ts 2s 7d", 2),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--abstraction", default="artifacts/abstraction_full")
    ap.add_argument("--samples", type=int, default=4096)
    ap.add_argument("--rollouts", type=int, default=64)
    ap.add_argument("--out", default="docs/cluster_mix.md")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from robopoker_tpu.deuce.cards import parse_cards, suit_masks
    from robopoker_tpu.deuce.evaluator import strength_from_masks
    from robopoker_tpu.deuce.observation import equity_mc
    from robopoker_tpu.nlhe.abstraction import LookupBucket

    bucket = LookupBucket.load(args.abstraction)
    rng = np.random.default_rng(7)
    lines = ["# Cluster mixing at the failing litmus value spots", "",
             f"abstraction {args.abstraction}; {args.samples} sampled "
             f"cluster members; equity = {args.rollouts}-rollout MC", ""]

    for title, hole_s, board_s, street in SPOTS:
        hole = parse_cards(hole_s).astype(np.int32)
        board5 = np.full(5, -1, np.int32)
        bc = parse_cards(board_s).astype(np.int32)
        board5[:len(bc)] = bc
        tag = int(np.asarray(bucket(
            jnp.asarray(hole[None]), jnp.asarray(board5[None]),
            jnp.asarray(np.int32(street))))[0])
        cluster = tag & 0xFF
        art = np.load(pathlib.Path(args.abstraction) /
                      ("flop.npz" if street == 1 else "turn.npz"))
        members = np.flatnonzero(art["assignment"] == cluster)
        take = rng.choice(members, min(args.samples, len(members)),
                          replace=False)
        mp = art["pocket"][take].astype(np.int32)
        mb = art["board"][take].astype(np.int32)
        nb = 3 if street == 1 else 4
        mb5 = np.full((len(take), 5), -1, np.int32)
        mb5[:, :nb] = mb[:, :nb]
        cards = np.concatenate([mp, mb5], axis=1)
        codes = np.asarray(strength_from_masks(
            suit_masks(jnp.asarray(cards))))
        cats = (codes >> 21) & 0xF
        eq = np.asarray(equity_mc(
            jnp.asarray(mp), jnp.asarray(mb5),
            jnp.full(len(take), nb, jnp.int32),
            jax.random.PRNGKey(3), n_samples=args.rollouts))
        spot_cards = np.concatenate([hole, board5])[None]
        spot_code = int(np.asarray(strength_from_masks(
            suit_masks(jnp.asarray(spot_cards))))[0])
        spot_eq = float(np.asarray(equity_mc(
            jnp.asarray(hole[None]), jnp.asarray(board5[None]),
            jnp.asarray([nb], jnp.int32), jax.random.PRNGKey(4),
            n_samples=256))[0])
        pct = float((eq < spot_eq).mean())
        lines += [
            f"## {title}", "",
            f"- cluster {cluster} ({len(members):,} isos); spot category "
            f"**{CATS[(spot_code >> 21) & 0xF]}**, equity ≈ {spot_eq:.2f} "
            f"(stronger than {pct:.0%} of its own cluster)",
            f"- member equity: mean {eq.mean():.2f}, p10 "
            f"{np.percentile(eq, 10):.2f}, p50 {np.percentile(eq, 50):.2f},"
            f" p90 {np.percentile(eq, 90):.2f}",
            "- member hand categories: " + ", ".join(
                f"{CATS[c]} {100 * (cats == c).mean():.0f}%"
                for c in range(9) if (cats == c).mean() >= 0.005),
            "",
        ]
        print(lines[-5], flush=True)

    out = pathlib.Path(args.out)
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
