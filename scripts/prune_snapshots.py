"""Thin a train's compact snapshot directory before committing.

8-min snapshots over a 5-6 h train leave ~40 files (~300 MB); the git
history only needs enough for resume + the LBR curve. Keeps the first,
the last, and ~N evenly spaced by epoch; deletes the rest.

    python3 scripts/prune_snapshots.py --dir artifacts/r4/compact --keep 10
"""

import argparse
import pathlib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="artifacts/r4/compact")
    ap.add_argument("--keep", type=int, default=10)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    d = pathlib.Path(args.dir)
    snaps = sorted(d.glob("ep*.npz"))
    if len(snaps) <= args.keep:
        print(f"{len(snaps)} snapshots ≤ keep={args.keep}; nothing to do")
        return
    idx = {0, len(snaps) - 1}
    for i in range(1, args.keep - 1):
        idx.add(round(i * (len(snaps) - 1) / (args.keep - 1)))
    drop = [s for i, s in enumerate(snaps) if i not in idx]
    for s in drop:
        print(f"drop {s.name}")
        if not args.dry_run:
            s.unlink()
    print(f"kept {len(snaps) - len(drop)}/{len(snaps)}")


if __name__ == "__main__":
    main()
