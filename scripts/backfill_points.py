"""Backfill training points into existing abstraction artifacts.

The original artifact writer stored (centroids, metric, assignment,
lookup) but not the sampled (pocket, board) observations themselves.
``canonical_sample`` is deterministic (seeded rng + strided native
enumeration), so this script regenerates the exact points the build
used, verifies them — every regenerated point's canonical hash must
resolve through the stored lookup to the stored assignment — and
rewrites the npz with ``pocket``/``board`` arrays added. Topology
queries (e.g. "show me an example observation in bucket k", ref:
crates/portal/src/topology/api.rs exp_wrt_abs/abs_similar) need these.

    python scripts/backfill_points.py --abstraction artifacts/abstraction
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

from build_abstraction import canonical_sample  # noqa: E402  (same dir)


def verify(name: str, z: dict, pocket: np.ndarray, board: np.ndarray) -> None:
    import jax.numpy as jnp

    from robopoker_tpu.deuce.isomorphism import canonical_key, hash_for_version
    from robopoker_tpu.lloyd.lookup import load_lookup, lookup_device

    class _Z:  # np.load-like view over the in-memory dict
        files = list(z.keys())

        def __getitem__(self, k):
            return z[k]

    # load_lookup rebuilds either artifact format (compact triplets or
    # legacy dense slabs) with the CURRENT probing scheme — constructing
    # IsoLookup straight from legacy slab arrays would leave pre-ladder
    # residents unreachable (ADVICE round-1, medium)
    lut = load_lookup(_Z())
    words = np.asarray(canonical_key(jnp.asarray(pocket), jnp.asarray(board)))
    h1, h2 = hash_for_version(lut.hash_version)(jnp.asarray(words))
    got = np.asarray(lookup_device(lut, jnp.asarray(h1), jnp.asarray(h2),
                                   default=-1))
    want = z["assignment"]
    if len(got) != len(want):
        raise SystemExit(
            f"{name}: regenerated {len(got)} points but artifact has "
            f"{len(want)} — sampling parameters drifted, refusing to write"
        )
    bad = int((got != want).sum())
    if bad:
        raise SystemExit(
            f"{name}: {bad}/{len(want)} regenerated points disagree with "
            "the stored assignment — refusing to write"
        )
    print(f"{name}: {len(want)} points verified against stored lookup")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--abstraction", default="artifacts/abstraction")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # pure host work
    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    out = pathlib.Path(args.abstraction)
    for name, n_board in (("turn", 4), ("flop", 3)):
        p = out / f"{name}.npz"
        if not p.exists():
            continue
        with np.load(p) as zf:
            z = {k: zf[k] for k in zf.files}
        if "pocket" in z:
            print(f"{name}: already has points, skipping")
            continue
        budget = len(z["assignment"])
        print(f"{name}: regenerating {budget} canonical points ...",
              flush=True)
        pocket, board = canonical_sample(n_board, budget)
        verify(name, z, pocket, board)
        np.savez_compressed(p, **z, pocket=pocket, board=board)
        print(f"{name}: rewrote {p}")


if __name__ == "__main__":
    main()
