"""Migrate abstraction artifacts to the current hash version (v2).

Round-1 artifacts key their iso→bucket lookup on hash_key_v1, whose
linear pair folds merge ~792 of the 13,960,050 turn classes (VERDICT
round-1 item 3; deuce/isomorphism.py hash_key_v1 docstring). Every
artifact stores its training points (pocket/board) and per-point
assignment, so the lookup can be re-keyed EXACTLY without re-clustering:
recompute canonical words from the points, hash with v2, rebuild the
compact triplets, stamp hash_version=2.

Runs entirely on CPU. Usage:
    python scripts/rehash_artifacts.py artifacts/abstraction \
        artifacts/abstraction_full ...
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def rehash_file(path: pathlib.Path) -> bool:
    from robopoker_tpu.deuce.isomorphism import (
        HASH_VERSION, canonical_key, hash_key)
    from robopoker_tpu.lloyd.lookup import build_lookup, verify_probe_depth

    z = dict(np.load(path))
    version = int(z.get("hash_version", 1))
    if version == HASH_VERSION:
        print(f"  {path}: already v{version}")
        return False
    if "pocket" not in z or "board" not in z:
        raise SystemExit(
            f"{path}: no stored points — cannot rehash exactly; "
            "run scripts/backfill_points.py first")

    pocket = z["pocket"].astype(np.int32)
    board = z["board"].astype(np.int32)
    values = z["assignment"].astype(np.int32)
    n = len(values)
    assert len(pocket) == n and len(board) == n

    chunk = 1 << 19
    h1s, h2s = [], []
    for i in range(0, n, chunk):
        words = canonical_key(jnp.asarray(pocket[i:i + chunk]),
                              jnp.asarray(board[i:i + chunk]))
        h1, h2 = hash_key(words)
        h1s.append(np.asarray(h1))
        h2s.append(np.asarray(h2))
    h1 = np.concatenate(h1s)
    h2 = np.concatenate(h2s)

    # exactness audit: artifact points are one-per-canonical-class, so
    # every (h1, h2) pair must be distinct under the new hash
    pairs = (h1.astype(np.int64) << 32) ^ (h2.astype(np.int64) & 0xFFFFFFFF)
    n_unique = len(np.unique(pairs))
    if n_unique != n:
        raise SystemExit(
            f"{path}: v{HASH_VERSION} hash still collides "
            f"({n - n_unique} of {n}) — refusing to write")

    table = build_lookup(h1, h2, values, hash_version=HASH_VERSION)
    verify_probe_depth(table)

    for k in ("lookup_key1", "lookup_key2", "lookup_value"):  # legacy slabs
        z.pop(k, None)
    z.update(table.compact())
    tmp = path.with_suffix(".tmp.npz")
    np.savez_compressed(tmp, **z)
    tmp.replace(path)
    print(f"  {path}: v{version} -> v{HASH_VERSION} "
          f"({n} keys, all distinct, probes={table.probes})")
    return True


def main():
    dirs = sys.argv[1:] or ["artifacts/abstraction"]
    for d in dirs:
        for p in sorted(pathlib.Path(d).glob("*.npz")):
            rehash_file(p)


if __name__ == "__main__":
    main()
