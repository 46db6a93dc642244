"""Game-agnostic MCCFR core: engine, schedules, sampling, solver."""

from .engine import (
    Profile,
    averaged,
    exploration,
    init_profile,
    make_exploitability,
    make_solve,
    make_step,
    regret_matching,
)
from .sampling import (
    EXTERNAL_SAMPLING,
    TARGETED_SAMPLING,
    PLURIBUS_SAMPLING,
    PRUNABLE_SAMPLING,
    SAMPLING_SCHEMES,
    VANILLA_SAMPLING,
    SamplingConfig,
)
from .schedules import (
    ASYMMETRIC_REGRET,
    CONSTANT_WEIGHT,
    DISCOUNTED_REGRET,
    EXPONENTIAL_WEIGHT,
    FLOORED_REGRET,
    LINEAR_REGRET,
    LINEAR_WEIGHT,
    QUADRATIC_WEIGHT,
    REGRET_SCHEDULES,
    SUMMED_REGRET,
    WEIGHT_SCHEDULES,
    RegretSchedule,
    WeightSchedule,
)
from .solver import Solver
from .tree import CHANCE, TERMINAL, DenseTree, SmallGame, build_tree

__all__ = [
    "Profile", "averaged", "exploration", "init_profile",
    "make_exploitability", "make_solve", "make_step", "regret_matching",
    "EXTERNAL_SAMPLING", "PLURIBUS_SAMPLING", "PRUNABLE_SAMPLING",
    "SAMPLING_SCHEMES", "TARGETED_SAMPLING", "VANILLA_SAMPLING", "SamplingConfig",
    "ASYMMETRIC_REGRET", "CONSTANT_WEIGHT", "DISCOUNTED_REGRET",
    "EXPONENTIAL_WEIGHT", "FLOORED_REGRET", "LINEAR_REGRET",
    "LINEAR_WEIGHT", "QUADRATIC_WEIGHT", "REGRET_SCHEDULES",
    "SUMMED_REGRET", "WEIGHT_SCHEDULES", "RegretSchedule",
    "WeightSchedule", "Solver", "CHANCE", "TERMINAL", "DenseTree",
    "SmallGame", "build_tree",
]
