"""Render the RPS CFR simplex trajectories to a standalone HTML file
(ref: crates/roshambo/src/{simplex,assets}.rs — bin target `roshambo`).

    python3 scripts/rps_simplex.py --epochs 4096 --out docs/rps_simplex.html
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4096)
    ap.add_argument("--stride", type=int, default=64)
    ap.add_argument("--out", default="docs/rps_simplex.html")
    args = ap.parse_args()
    from robopoker_tpu.games.simplex import render_html, trajectory

    p1, p2 = trajectory(n_epochs=args.epochs, stride=args.stride)
    out = pathlib.Path(args.out)
    out.write_text(render_html(p1, p2))
    print(f"wrote {out}: final P1 averaged = "
          f"{tuple(round(v, 3) for v in p1[-1].averaged)} (nash 0.4/0.4/0.2)")


if __name__ == "__main__":
    main()
