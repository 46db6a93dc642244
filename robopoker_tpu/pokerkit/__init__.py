"""Foundation layer: constants, dtypes, hyperparams, config, translation."""

from .constants import (
    ASYMMETRIC_UTILITY,
    B_BLIND,
    EPSILON,
    FRONTIER_LEAVES,
    KMEANS_EQTY_CLUSTER_COUNT,
    KMEANS_FLOP_CLUSTER_COUNT,
    KMEANS_MAX_CLUSTER_COUNT,
    KMEANS_TURN_CLUSTER_COUNT,
    MAX_PATH_EDGES,
    MAX_RAISE_REPEATS,
    N_PLAYERS,
    N_WORLDS,
    OPENS,
    PLURIBUS_INDICES,
    RAISES,
    S_BLIND,
    SLUMBOT_INDICES,
    STACK,
)
from .hyperparams import (
    KmeansHyperParams,
    PruningHyperParams,
    SamplingHyperParams,
    SinkhornHyperParams,
    SubgameHyperParams,
    TrainingHyperParams,
    WarmstartHyperParams,
)
from .regime import (
    FingerprintMismatch,
    Regime,
    RunConfig,
    Translation,
    Version,
    check_fingerprint,
)

__all__ = [
    "ASYMMETRIC_UTILITY", "B_BLIND", "EPSILON", "FRONTIER_LEAVES",
    "KMEANS_EQTY_CLUSTER_COUNT", "KMEANS_FLOP_CLUSTER_COUNT",
    "KMEANS_MAX_CLUSTER_COUNT", "KMEANS_TURN_CLUSTER_COUNT",
    "MAX_PATH_EDGES", "MAX_RAISE_REPEATS", "N_PLAYERS", "N_WORLDS",
    "OPENS", "PLURIBUS_INDICES", "RAISES", "S_BLIND", "SLUMBOT_INDICES",
    "STACK",
    "KmeansHyperParams", "PruningHyperParams", "SamplingHyperParams",
    "SinkhornHyperParams", "SubgameHyperParams", "TrainingHyperParams",
    "WarmstartHyperParams",
    "FingerprintMismatch", "Regime", "RunConfig", "Translation", "Version",
    "check_fingerprint",
]
