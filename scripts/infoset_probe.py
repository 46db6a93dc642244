"""Inspect the trained table rows behind specific litmus spots.

Follow-up to scripts/cluster_mix.py (which cleared the abstraction):
print visits / per-edge regret / averaged policy for the exact infoset
rows the failing value-line litmus cases read, to separate
"under-visited" from "visited but mis-valued".

    python3 scripts/infoset_probe.py --workdir artifacts/r2 \
        --abstraction artifacts/abstraction_full
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

SPOTS = [
    # (title, hand cards, history events, hero_seat) — histories copied
    # verbatim from serving/scenarios.json
    ("QQ on 842r: BB first to act after raised pot",
     "Qc Qs",
     [("col", 4), ("col", 2), ("deal", "8h 4d 2s")], 1),
    ("AsQs turn nut flush: SB facing check on KsTs2s7d",
     "As Qs",
     [("col", 4), ("col", 2), ("deal", "Ks Ts 2s"), ("col", 1),
      ("col", 1), ("deal", "7d"), ("col", 1)], 0),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="artifacts/r2")
    ap.add_argument("--abstraction", default="artifacts/abstraction_full")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from robopoker_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from robopoker_tpu.deuce.cards import parse_cards
    from robopoker_tpu.kicker import game as G
    from robopoker_tpu.mccfr.engine import averaged
    from robopoker_tpu.nlhe.abstraction import LookupBucket
    from robopoker_tpu.nlhe.table import make_key, probe_rows, N_COLS
    from robopoker_tpu.pokerkit.regime import RunConfig
    from robopoker_tpu.serving.litmus import _witness
    from robopoker_tpu.serving.policy import Blueprint
    from robopoker_tpu.utils.checkpoint import load_compact

    bucket = LookupBucket.load(args.abstraction)
    run = RunConfig(bucket=f"lookup:{args.abstraction}")
    table = load_compact(
        pathlib.Path(args.workdir) / "blueprint_compact.npz", run)
    bp = Blueprint(table, bucket)
    print(f"blueprint epoch {int(table.epoch)}; total occupied rows "
          f"{int((np.asarray(table.key_lo) != 0).sum()):,}")

    for title, hand, history, seat in SPOTS:
        w = _witness(hand, history, seat)
        head, _, _ = bp.head_state(w)
        idx = G.actor_idx(head)
        hole = jnp.take_along_axis(
            head.hole, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        b = bucket(hole.astype(jnp.int32), head.board.astype(jnp.int32),
                   head.street)
        legal = G.legal_cols(head, jnp.asarray(bp.menu))
        cmask = (legal * (1 << jnp.arange(N_COLS))).sum(1).astype(jnp.int32)
        klo, khi = make_key(b, G.packed_subgame(head), cmask)
        row, hit = probe_rows(table.key_lo, table.key_hi, klo, khi)
        r = int(np.asarray(row)[0])
        print(f"\n== {title}")
        print(f"   street {int(np.asarray(head.street)[0])} bucket "
              f"{int(np.asarray(b)[0]) & 0xFF} row {r} "
              f"claimed={int(np.asarray(table.key_lo)[r]) != 0}")
        print(f"   visits {int(np.asarray(table.visits)[r])}")
        with np.printoptions(precision=2, suppress=True):
            print(f"   legal  {np.asarray(legal)[0].astype(int)}")
            print(f"   regret {np.asarray(table.regret)[r]}")
            print(f"   weight {np.asarray(table.weight)[r]}")
            sig = np.asarray(averaged(table.weight[row], legal))[0]
            print(f"   policy {sig}")


if __name__ == "__main__":
    main()
