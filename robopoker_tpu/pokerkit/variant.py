"""Bot-variant cube identity.

Counterpart of the reference's ``Variant`` (ref:
crates/pokerkit/src/variant.rs): the single shape used everywhere a bot
is picked — serving endpoints, slumbot CLI, gameplay UI. A variant is
``fish`` or one cell of the {depth, world, dirac} cube; the label, DB
username (``bot:<label>``), deterministic UUIDv5, wire format, and CLI
parse grammar are all derived from the axis triple, byte-compatible
with the reference (same namespace UUID, same ``uuid5`` construction)
so identities persisted by either implementation agree.
"""

from __future__ import annotations

import dataclasses
import uuid

# Namespace for deterministic bot identity (ref: variant.rs:38-41 —
# the bytes spell "robopoker.bots.v").
VARIANT_NAMESPACE = uuid.UUID(bytes=b"robopoker.bots.v")

_FLAGS = ("depth", "world", "dirac")


@dataclasses.dataclass(frozen=True)
class Variant:
    """``Variant := Fish | Bot{depth, world, dirac}`` (ref: variant.rs:44-66).

    ``fish`` is the random player outside the cube; ``is_bot`` selects
    the 8 cube cells.
    """

    is_bot: bool = False
    depth: bool = False
    world: bool = False
    dirac: bool = False

    # --- identity ---------------------------------------------------------

    @property
    def label(self) -> str:
        """Canonical token: CLI grammar and username suffix
        (ref: variant.rs:69-84)."""
        if not self.is_bot:
            return "fish"
        flags = [f for f in _FLAGS if getattr(self, f)]
        return "+".join(flags) if flags else "base"

    @property
    def description(self) -> str:
        """UI tooltip line (ref: variant.rs:93-108)."""
        if not self.is_bot:
            return "Random actions"
        return {
            "base": "Sampled blueprint",
            "depth": "Depth-limited subgame",
            "world": "World-partitioned subgame",
            "dirac": "Argmax blueprint",
            "depth+world": "Depth + world subgame",
            "depth+dirac": "Argmax + depth",
            "world+dirac": "Argmax + world",
            "depth+world+dirac": "Full subgame solver",
        }[self.label]

    @property
    def username(self) -> str:
        """Stable DB identity ``bot:<label>`` (ref: variant.rs:110-112)."""
        return f"bot:{self.label}"

    @property
    def uuid(self) -> uuid.UUID:
        """Deterministic UUIDv5 from the username (ref: variant.rs:114-116)."""
        return uuid.uuid5(VARIANT_NAMESPACE, self.username)

    @property
    def requires_blueprint(self) -> bool:
        return self.is_bot

    # --- wire format ------------------------------------------------------

    def to_wire(self) -> dict:
        """Serde-tagged JSON shape (ref: variant.rs:17-21)."""
        if not self.is_bot:
            return {"kind": "fish"}
        return {"kind": "bot", "depth": self.depth, "world": self.world,
                "dirac": self.dirac}

    @classmethod
    def from_wire(cls, doc: dict) -> "Variant":
        if doc.get("kind") == "fish":
            return FISH
        if doc.get("kind") == "bot":
            return cls(is_bot=True, depth=bool(doc.get("depth")),
                       world=bool(doc.get("world")),
                       dirac=bool(doc.get("dirac")))
        raise ValueError(f"unknown variant wire shape: {doc}")

    # --- CLI grammar ------------------------------------------------------

    @classmethod
    def parse(cls, token: str) -> "Variant | None":
        """Parse a CLI/wire token; flags must appear in canonical order
        (``depth`` < ``world`` < ``dirac``) so every variant has exactly
        one token, matching its label (ref: variant.rs:145-190).
        Returns None on unknown tokens."""
        token = token.strip()
        if token == "fish":
            return FISH
        if token == "base":
            return cls(is_bot=True)
        got = {}
        last = -1
        for flag in token.split("+"):
            if flag not in _FLAGS or flag in got:
                return None
            pos = _FLAGS.index(flag)
            if pos <= last:
                return None
            got[flag] = True
            last = pos
        return cls(is_bot=True, **got)

    @classmethod
    def all(cls) -> tuple["Variant", ...]:
        """Canonical UI display order: 8 cube cells (by axis triple),
        then fish (ref: variant.rs:130-143)."""
        cells = [
            (False, False, False), (True, False, False),
            (False, True, False), (False, False, True),
            (True, True, False), (True, False, True),
            (False, True, True), (True, True, True),
        ]
        return tuple(
            [cls(is_bot=True, depth=d, world=w, dirac=x)
             for d, w, x in cells] + [FISH]
        )


FISH = Variant(is_bot=False)

# The slumbot.com adversary, recorded as a fixed pseudo-bot when hands
# are persisted (ref: variant.rs:193-200). Not in the zoo.
SLUMBOT_USERNAME = "bot:slumbot"
SLUMBOT_UUID = uuid.uuid5(VARIANT_NAMESPACE, SLUMBOT_USERNAME)
