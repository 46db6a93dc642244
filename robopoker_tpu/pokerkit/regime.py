"""Run configuration: regime, version, and config fingerprinting.

TPU-native counterpart of the reference's ``Regime``/``Version`` process
globals and the ``config_string`` drift guard
(ref: crates/pokerkit/src/regime.rs:10-72, version.rs:16-86). Instead of
OnceLock globals + DB-stored fingerprints, we carry a frozen ``RunConfig``
and fingerprint artifacts on disk: a checkpoint written under one
fingerprint refuses to resume under another (the reference's "config drift
is a first-class failure mode" contract, SURVEY.md §5.6).
"""

from __future__ import annotations

import dataclasses
import enum
import hashlib

from . import constants


class Regime(enum.Enum):
    """Bet-grid regime — selects the action abstraction menu."""

    PLURIBUS = "pluribus"
    SLUMBOT = "slumbot"

    def indices(self, street: int, depth: int):
        """Raise-menu (RAISES indices) for a (street, depth) cell."""
        if self is Regime.PLURIBUS:
            row = street * 3 + min(depth, 2)
            return constants.PLURIBUS_INDICES[row]
        return constants.SLUMBOT_INDICES


class Version(enum.Enum):
    """Abstraction/blueprint lineage version.

    V2/V3 reuse V1's clustering artifacts (ref: crates/pokerkit/src/version.rs:60-86).
    """

    V0 = 0
    V1 = 1
    V2 = 2
    V3 = 3

    @property
    def clustering_version(self) -> "Version":
        return Version.V1 if self in (Version.V2, Version.V3) else self


class Translation(enum.Enum):
    """Action-translation scheme dispatch (ref: crates/pokerkit/src/translation.rs:36-90)."""

    SNAP = "snap"
    HARMONIC = "harmonic"
    PHARGMAX = "phargmax"


@dataclasses.dataclass(frozen=True)
class RunConfig:
    regime: Regime = Regime.PLURIBUS
    version: Version = Version.V3
    translation: Translation = Translation.PHARGMAX
    seed: int = 0
    # card-abstraction provider version — part of the infoset keyspace,
    # so checkpoints must refuse to resume across bucket changes
    bucket: str = "proxy-v2"

    def config_string(self) -> str:
        """Stable fingerprint input of every tree-shape constant.

        Mirrors the reference's ``Regime::config_string`` coverage
        (ref: crates/pokerkit/src/regime.rs:49-72): anything that changes
        the game tree or table layout must appear here.
        """
        c = constants
        grid = (
            c.PLURIBUS_INDICES if self.regime is Regime.PLURIBUS
            else (c.SLUMBOT_INDICES,) * 12
        )
        parts = [
            f"regime={self.regime.value}",
            f"version={self.version.value}",
            f"n={c.N_PLAYERS}", f"stack={c.STACK}",
            f"bb={c.B_BLIND}", f"sb={c.S_BLIND}",
            f"raise_repeats={c.MAX_RAISE_REPEATS}",
            f"path_edges={c.MAX_PATH_EDGES}",
            f"opens={c.OPENS}", f"raises={c.RAISES}", f"grid={grid}",
            f"kflop={c.KMEANS_FLOP_CLUSTER_COUNT}",
            f"kturn={c.KMEANS_TURN_CLUSTER_COUNT}",
            f"keqty={c.KMEANS_EQTY_CLUSTER_COUNT}",
            f"worlds={c.N_WORLDS}", f"frontier={c.FRONTIER_LEAVES}",
            f"bucket={self.bucket}",
        ]
        return ";".join(parts)

    def fingerprint(self) -> str:
        return hashlib.sha256(self.config_string().encode()).hexdigest()[:16]


class FingerprintMismatch(RuntimeError):
    """Raised when resuming artifacts written under a different config."""


def check_fingerprint(stored: str, config: RunConfig) -> None:
    """Block silently-incompatible resumes (ref: crates/forge/src/fingerprint.rs)."""
    current = config.fingerprint()
    if stored != current:
        raise FingerprintMismatch(
            f"artifact fingerprint {stored!r} != current config {current!r}; "
            "tree-shape constants changed since this artifact was written"
        )
