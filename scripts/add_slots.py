"""Migrate lookup artifacts to the slot-persisted format.

Older artifacts store only the (h1, h2, val) triplets, so every load
re-runs build_lookup's claim rounds — ~13 min of host CPU at the river
street's 123M keys. This runs the rounds ONE more time per artifact and
persists the placement (lookup_slot/capacity/probes); load_lookup then
reconstructs with three scatter fills.

    python scripts/add_slots.py artifacts/abstraction artifacts/abstraction_full
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def migrate(path: pathlib.Path) -> None:
    from robopoker_tpu.lloyd.lookup import build_lookup

    z = dict(np.load(path))
    if "lookup_slot" in z:
        print(f"  {path}: already slot-persisted")
        return
    if "lookup_h1" not in z:
        print(f"  {path}: no compact lookup (skipped)")
        return
    t0 = time.time()
    table = build_lookup(z["lookup_h1"], z["lookup_h2"],
                         z["lookup_val"].astype(np.int32),
                         hash_version=int(z.get("hash_version", 1)))
    val_dtype = z["lookup_val"].dtype
    z.update(table.compact())
    z["lookup_val"] = z["lookup_val"].astype(val_dtype)  # keep uint8 rivers
    tmp = path.with_suffix(".tmp.npz")
    np.savez_compressed(tmp, **z)
    tmp.replace(path)
    print(f"  {path}: slots persisted (capacity {table.capacity}, "
          f"probes {table.probes}, {time.time()-t0:.0f}s)", flush=True)


def main():
    for d in sys.argv[1:] or ["artifacts/abstraction"]:
        for p in sorted(pathlib.Path(d).glob("*.npz")):
            migrate(p)


if __name__ == "__main__":
    main()
