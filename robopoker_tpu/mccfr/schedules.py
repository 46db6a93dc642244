"""Regret and weight accumulation schedules.

TPU-native counterpart of the reference's pluggable ``RegretSchedule`` /
``WeightSchedule`` traits (ref: crates/mccfr/src/regret/*.rs,
crates/mccfr/src/policy/*.rs). Each schedule is a pair of pure elementwise
functions over the accumulator arrays, applied under a "touched" mask —
the reference only updates (info, edge) pairs present in the epoch's
update vector, so discount-style schedules must not decay untouched rows.

All formulas are value-identical to the reference:
- SUMMED      vanilla CFR, floor −∞         (ref: regret/summed.rs)
- FLOORED     CFR+, floor 0                 (ref: regret/floored.rs)
- LINEAR      t/(t+1) discount (Pluribus)   (ref: regret/linear.rs)
- DISCOUNTED  DCFR α=1.5 β=0.5              (ref: regret/discounted.rs)
- ASYMMETRIC  undiscounted +, decayed −     (ref: regret/asymmetric.rs)
and weights:
- CONSTANT / LINEAR (·t) / QUADRATIC (·t²) / EXPONENTIAL (0.9999 decay)
  (ref: policy/{constant,linear,quadratic,exponential}.rs)

``gain``/``learn`` floors mirror the reference: regret floors at the
schedule floor (default ``TrainingHyperParams.regret_min``), weight floors
at EPSILON (ref: regret/mod.rs:22-28, policy/mod.rs:17-21).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from ..pokerkit.constants import EPSILON

NEG_INF = float("-inf")


@dataclasses.dataclass(frozen=True)
class RegretSchedule:
    name: str
    # accumulate(cum, delta, t) -> new cum (pre-floor)
    accumulate: Callable
    floor: float = NEG_INF  # None → use hyperparam regret_min

    def gain(self, cum, delta, t, regret_min: float | None = None):
        floor = self.floor if self.floor is not None else regret_min
        return jnp.maximum(self.accumulate(cum, delta, t), floor)


@dataclasses.dataclass(frozen=True)
class WeightSchedule:
    name: str
    accumulate: Callable

    def learn(self, cum, delta, t):
        return jnp.maximum(self.accumulate(cum, delta, t), EPSILON)


def _summed(cum, delta, t):
    return cum + delta


def _linear(cum, delta, t):
    t = jnp.float32(t)
    return cum * (t / (t + 1.0)) + delta


def _discounted(cum, delta, t, alpha=1.5, beta=0.5):
    t = jnp.float32(t)
    xp = t ** alpha
    xn = t ** beta
    dpos = xp / (xp + 1.0)
    dneg = xn / (xn + 1.0)
    dzero = t / (t + 1.0)
    d = jnp.where(cum > 0.0, dpos, jnp.where(cum < 0.0, dneg, dzero))
    return cum * d + delta


def _asymmetric(cum, delta, t):
    t = jnp.float32(t)
    return jnp.where(cum > 0.0, cum + delta, cum * (t / (t + 1.0)) + delta)


SUMMED_REGRET = RegretSchedule("summed", _summed, floor=NEG_INF)
FLOORED_REGRET = RegretSchedule("floored", _summed, floor=0.0)  # CFR+
LINEAR_REGRET = RegretSchedule("linear", _linear, floor=None)
DISCOUNTED_REGRET = RegretSchedule("discounted", _discounted, floor=None)
ASYMMETRIC_REGRET = RegretSchedule("asymmetric", _asymmetric, floor=None)


def _w_constant(cum, delta, t):
    return cum + delta


def _w_linear(cum, delta, t):
    return cum + delta * jnp.float32(t)


def _w_quadratic(cum, delta, t):
    t = jnp.float32(t)
    return cum + delta * t * t


def _w_exponential(cum, delta, t, decay=0.9999):
    return cum * decay + delta


CONSTANT_WEIGHT = WeightSchedule("constant", _w_constant)
LINEAR_WEIGHT = WeightSchedule("linear", _w_linear)
QUADRATIC_WEIGHT = WeightSchedule("quadratic", _w_quadratic)
EXPONENTIAL_WEIGHT = WeightSchedule("exponential", _w_exponential)

REGRET_SCHEDULES = {
    s.name: s for s in (
        SUMMED_REGRET, FLOORED_REGRET, LINEAR_REGRET,
        DISCOUNTED_REGRET, ASYMMETRIC_REGRET,
    )
}
WEIGHT_SCHEDULES = {
    s.name: s for s in (
        CONSTANT_WEIGHT, LINEAR_WEIGHT, QUADRATIC_WEIGHT, EXPONENTIAL_WEIGHT,
    )
}
