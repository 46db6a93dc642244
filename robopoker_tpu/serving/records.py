"""Hand-history records: the bridge from live play to evaluation.

TPU-native counterpart of the reference's ``parlor`` record types and
``arena``'s replay reconstruction (ref: crates/parlor/src/records/*,
crates/arena/src/{replay,repository}.rs): completed hands serialize to a
JSONL log; AIVAT evaluation replays them via ``to_aivat``. Chip amounts
are stored big-blind-scaled for bb/100 reporting parity with the
reference's benchmark tables.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import numpy as np

from ..pokerkit.constants import B_BLIND
from .aivat import HandRecord
from .parlor import HandResult


def to_wire(result: HandResult, hand_id: int) -> dict:
    """HandResult → JSON-serializable record (the reference's DTO layer,
    ref: crates/kicker/src/dto/*)."""
    return {
        "hand_id": hand_id,
        "pnl": [float(x) for x in result.pnl],
        "events": [[k, v if isinstance(v, (int, list)) else int(v)]
                   for k, v in result.events],
        "holes": result.holes.astype(int).tolist(),
        "board": result.board.astype(int).tolist(),
    }


def from_wire(doc: dict) -> HandResult:
    return HandResult(
        pnl=np.asarray(doc["pnl"], np.float32),
        events=[tuple(e) for e in doc["events"]],
        holes=np.asarray(doc["holes"], np.int8),
        board=np.asarray(doc["board"], np.int8),
    )


def to_aivat(result: HandResult, hero_seat: int) -> HandRecord:
    """Replay-reconstruct a hand for AIVAT (ref: arena/src/replay.rs):
    annotates each action with its actor by re-walking turn order."""
    from ..kicker import game as G
    import jax

    state = G.root(jax.random.PRNGKey(0), 1)
    state = state._replace(hole=np.asarray(result.holes)[None].astype(np.int8))
    events = []
    for kind, payload in result.events:
        if kind == "col":
            actor = int(np.asarray(G.turn_of(state))[0])
            events.append(("col", int(payload), actor))
            import jax.numpy as jnp

            from ..kicker import MENU_PLURIBUS

            state = G.apply_cols(
                state, jnp.asarray([int(payload)]),
                jnp.asarray(MENU_PLURIBUS), jnp.asarray([True]),
            )
        else:
            events.append(("deal", list(payload)))
            from ..subgame.posterior import force_deal
            import jax.numpy as jnp

            cards = np.full(3, -1, np.int64)
            for j, c in enumerate(payload):
                cards[j] = c
            state = force_deal(state, jnp.asarray(cards), jnp.asarray([True]))
    return HandRecord(
        hero_seat=hero_seat,
        hero_hole=np.asarray(result.holes)[hero_seat].astype(np.int64),
        events=events,
        chips_won=float(result.pnl[hero_seat]) / B_BLIND,  # bb units
    )


class HandLog:
    """Append-only JSONL session log (the reference's DB hand tables)."""

    def __init__(self, path: str | pathlib.Path):
        self.path = pathlib.Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def append(self, result: HandResult, hand_id: int) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(to_wire(result, hand_id)) + "\n")

    def load(self) -> list[HandResult]:
        if not self.path.exists():
            return []
        return [from_wire(json.loads(l))
                for l in self.path.read_text().splitlines() if l]
