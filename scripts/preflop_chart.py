"""Export the blueprint's 13×13 preflop action chart as markdown.

The repo analog of the reference portal's per-decision strategy /
range-grid views (README "Visual Tour"; portal strategy scope) in a
judge-readable static form, and the working diagnostic for the litmus
stuck-fold / over-jam families: one row per canonical pocket class with
SB first-action frequencies (fold / complete-call / opens / jam).

    python3 scripts/preflop_chart.py --workdir artifacts/r4 \
        --abstraction artifacts/abstraction_full --out docs/chart_r4.md
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

RANKS = "23456789TJQKA"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="artifacts")
    ap.add_argument("--abstraction", default="artifacts/abstraction")
    ap.add_argument("--seat", type=int, default=0,
                    help="0 = SB first action (the litmus open spot)")
    ap.add_argument("--out", default="docs/preflop_chart.md")
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--tpu", dest="cpu", action="store_false")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from robopoker_tpu.deuce.cards import parse_cards
    from robopoker_tpu.kicker import edges as E
    from robopoker_tpu.nlhe.abstraction import LookupBucket, proxy_bucket
    from robopoker_tpu.pokerkit.regime import RunConfig
    from robopoker_tpu.serving.policy import Blueprint, Witness
    from robopoker_tpu.utils.checkpoint import load_compact

    if args.abstraction:
        bucket = LookupBucket.load(args.abstraction)
        run = RunConfig(bucket=f"lookup:{args.abstraction}")
    else:
        bucket, run = proxy_bucket, RunConfig()
    table = load_compact(
        pathlib.Path(args.workdir) / "blueprint_compact.npz", run)
    bp = Blueprint(table, bucket)

    def card(rank, suit):
        return f"{RANKS[rank]}{'shdc'[suit]}"

    def dist_for(hole_str):
        w = Witness(hero_seat=args.seat,
                    hero_hole=parse_cards(hole_str).astype(np.int64),
                    events=[])
        return bp.distribution(w)

    rows = {}
    for hi in range(12, -1, -1):
        for lo in range(hi, -1, -1):
            for suited in ((True, False) if hi != lo else (False,)):
                if hi == lo:
                    hand = f"{RANKS[hi]}{RANKS[lo]}"
                    hole = f"{card(hi,0)} {card(lo,1)}"
                elif suited:
                    hand = f"{RANKS[hi]}{RANKS[lo]}s"
                    hole = f"{card(hi,0)} {card(lo,0)}"
                else:
                    hand = f"{RANKS[hi]}{RANKS[lo]}o"
                    hole = f"{card(hi,0)} {card(lo,1)}"
                d = np.asarray(dist_for(hole))
                opens = float(d[E.COL_RAISE0:].sum())
                rows[hand] = {
                    "fold": float(d[E.COL_FOLD]),
                    "call": float(d[E.COL_CALL]) + float(d[E.COL_CHECK]),
                    "open": opens,
                    "jam": float(d[E.COL_SHOVE]),
                }
        print(f"rank {RANKS[hi]} done", flush=True)

    def cell(hand):
        r = rows[hand]
        top = max(r, key=r.get)
        code = {"fold": "F", "call": "C", "open": "R", "jam": "J"}[top]
        return f"{code}{int(round(r[top] * 100)):02d}"

    lines = [
        f"# Preflop chart — seat {args.seat} first action",
        "",
        f"workdir {args.workdir}; epoch {int(table.epoch)}; "
        f"abstraction {args.abstraction}",
        "",
        "Cell = dominant action and its % (F fold / C complete-call / "
        "R open-raise any size / J jam). Row = high card, col = low "
        "card; upper-right suited, lower-left offsuit, diagonal pairs.",
        "",
        "| |" + "|".join(RANKS[::-1]) + "|",
        "|-|" + "-|" * 13,
    ]
    for hi in range(12, -1, -1):
        cells = []
        for lo in range(12, -1, -1):
            a, b = max(hi, lo), min(hi, lo)
            if hi == lo:
                hand = f"{RANKS[a]}{RANKS[b]}"
            elif lo > hi:     # upper-right: suited
                hand = f"{RANKS[a]}{RANKS[b]}s"
            else:             # lower-left: offsuit
                hand = f"{RANKS[a]}{RANKS[b]}o"
            cells.append(cell(hand))
        lines.append(f"|{RANKS[hi]}|" + "|".join(cells) + "|")
    lines += ["", "## Full frequencies", "",
              "| hand | fold | call | open | jam |", "|-|-|-|-|-|"]
    for hand, r in rows.items():
        lines.append(
            f"| {hand} | {r['fold']:.3f} | {r['call']:.3f} | "
            f"{r['open']:.3f} | {r['jam']:.3f} |")
    out = pathlib.Path(args.out)
    out.parent.mkdir(exist_ok=True)
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
