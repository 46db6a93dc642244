"""AIVAT variance-reduced evaluation.

TPU-native counterpart of the reference's ``arena`` crate
(ref: crates/arena/src/{aivat,correction,replay}.rs): the AIVAT estimator
(Burch et al. 2018) subtracts zero-mean control variates from each hand's
observed chips so the skill signal emerges from far fewer hands
("reduce variance by 10-44x", ref: crates/arena/src/lib.rs:4-5).

Correction terms per hand (ref: correction.rs:4-29, aivat.rs:94-145):

- hero action nodes:    Σ_a σ(a)·v̂(s,a) − v̂(s, a_taken)
- villain action nodes: the same from the villain's infoset, negated
- chance nodes (turn + river deals): mean_c B(deal c) − B(dealt card),
  signed for whoever acts next, where B is the next actor's blueprint
  baseline Σ_a σ(a)·v̂(a). Flop deals are skipped like the reference
  (C(48,3) = 17,296 candidate deals; aivat.rs:151-153).

v̂(s, a) is the blueprint's accumulated per-edge EV — the InfoTable's
``payoff`` column (the reference's eval_policy (edge, weight, value)
rows). Villain corrections and chance corrections need the villain's
hole (the reference replays *recorded* hands where both holes are
known); hands without ``villain_hole`` fall back to hero-action
corrections only, which keeps the estimator unbiased — every correction
term is zero-mean independently.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax
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
    # villain's revealed hole (showdown / recorded self-play). None →
    # villain-action and chance corrections are skipped for this hand.
    villain_hole: np.ndarray | None = None


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

    def _rows(self, state):
        """(σ [B,9], per-edge v̂ [B,9], legal [B,9]) at decision states."""
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
        sigma = np.asarray(averaged(self.table.weight[row], legal))
        pay = np.asarray(self.table.payoff[row])
        return sigma, pay, np.asarray(legal)

    def _action_correction(self, state, col: int) -> float:
        """Σ_a σ(a)·v̂(a) − v̂(a_taken) from the actor's own infoset
        (ref: correction.rs action_correction)."""
        sigma, pay, lg = self._rows(state)
        sigma, pay, lg = sigma[0], pay[0], lg[0]
        ev = float((sigma * pay * lg).sum())
        if not lg[col]:
            return 0.0  # observed action outside the row (ref: idx=None → 0)
        return ev - float(pay[col])

    def _chance_correction(self, state, seen: np.ndarray,
                           observed: int, hero_seat: int) -> float:
        """mean_c B(deal c) − B(dealt) over every unseen single-card deal,
        where B is the next actor's blueprint baseline, hero-signed
        (ref: aivat.rs chance_node_correction)."""
        from ..subgame.posterior import force_deal

        cards = np.setdiff1d(np.arange(52), seen[seen >= 0])
        if observed not in cards:
            cards = np.sort(np.append(cards, observed))
        n = len(cards)
        batch = jax.tree.map(
            lambda a: jnp.broadcast_to(a[0][None], (n,) + a.shape[1:]), state
        )
        deal = np.full((n, 3), -1, np.int64)
        deal[:, 0] = cards
        nxt = force_deal(batch, jnp.asarray(deal), jnp.asarray([True] * n))
        # every single-card runout leads to the same actor's turn
        t = int(np.asarray(G.turn_of(nxt))[0])
        if t > 1:
            return 0.0
        sigma, pay, lg = self._rows(nxt)
        base = (sigma * pay * lg).sum(axis=1)          # [n]
        obs_idx = int(np.flatnonzero(cards == observed)[0])
        delta = float(base.mean() - base[obs_idx])
        return delta if t == hero_seat else -delta

    def evaluate(self, hands: list[HandRecord]) -> AivatDelta:
        raw = np.array([h.chips_won for h in hands], np.float64)
        corrected = raw.copy()
        for i, h in enumerate(hands):
            corr = 0.0
            villain_seat = 1 - h.hero_seat
            state = G.root(jnp.zeros(2, jnp.uint32), 1)
            hh = jnp.asarray(h.hero_hole.astype(np.int8))[None]
            newhole = state.hole.at[0, h.hero_seat].set(hh[0])
            if h.villain_hole is not None:
                vh = jnp.asarray(h.villain_hole.astype(np.int8))[None]
                newhole = newhole.at[0, villain_seat].set(vh[0])
            state = state._replace(hole=newhole)
            for ev in h.events:
                if ev[0] == "col":
                    _, col, actor = ev
                    if actor == h.hero_seat:
                        corr += self._action_correction(state, col)
                    elif h.villain_hole is not None:
                        corr -= self._action_correction(state, col)
                    state = G.apply_cols(
                        state, jnp.asarray([col]), self.menu,
                        jnp.asarray([True]),
                    )
                else:
                    from ..subgame.posterior import force_deal

                    dealt = [int(c) for c in ev[1] if int(c) >= 0]
                    if len(dealt) == 1 and h.villain_hole is not None:
                        # turn/river: correct for card luck (flop deals
                        # are skipped like the reference)
                        seen = np.concatenate([
                            np.asarray(h.hero_hole, np.int64),
                            np.asarray(h.villain_hole, np.int64),
                            np.asarray(state.board, np.int64)[0],
                        ])
                        corr += self._chance_correction(
                            state, seen, dealt[0], h.hero_seat)
                    cards = np.full(3, -1, np.int64)
                    for j, c in enumerate(dealt):
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


# --- batched self-play AIVAT -------------------------------------------------
#
# The replay path above mirrors the reference's per-recorded-hand walk
# (aivat.rs evaluate) — fine for UI hand queries, hopeless for measuring
# the variance reduction on 10k+ hands. This path is the TPU-native
# formulation: a [N]-lane lockstep rollout (same shape as serving/lbr.py)
# where BOTH seats sample the blueprint's averaged policy and every
# correction term is computed batched at generation time — action
# corrections as [N, 9] row gathers, chance corrections as a [52·N]
# forced-deal enumeration — so no hand is ever replayed.


def _selfplay_kernel(table: InfoTable, bucket_fn, menu, n: int,
                     max_steps: int, key):
    """One jittable batch of n self-play hands.

    Returns (pnl [n], corrected [n], finished [n]) with hero = seat 0.
    """
    from ..subgame.posterior import force_deal

    def rows_of(states, m):
        """(σ, v̂, legal) [m, 9] at each lane's current actor."""
        idx = G.actor_idx(states)
        hole = jnp.take_along_axis(
            states.hole, idx[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        bucket = bucket_fn(hole.astype(jnp.int32),
                           states.board.astype(jnp.int32), states.street)
        legal = G.legal_cols(states, menu)
        cmask = (legal * (1 << jnp.arange(N_COLS))).sum(1).astype(jnp.int32)
        klo, khi = make_key(bucket, G.packed_subgame(states), cmask)
        row, _ = probe_rows(table.key_lo, table.key_hi, klo, khi)
        sigma = averaged(table.weight[row], legal)
        return sigma, table.payoff[row], legal

    states = G.root(key, n)

    def body(i, carry):
        states, corr = carry
        k = jax.random.fold_in(key, 1000 + i)
        t = G.turn_of(states)

        # --- chance correction (turn/river single-card deals only) ----
        nb = (states.board >= 0).sum(axis=1)
        is_single = (t == G.TURN_CHANCE) & ((nb == 3) | (nb == 4))
        # enumerate all 52 forced next-cards for every lane (unseen
        # cards are masked below; [52·n] lanes in one shot)
        cand = jnp.repeat(jnp.arange(52, dtype=jnp.int64), n)
        rep = lambda a: jnp.tile(a, (52,) + (1,) * (a.ndim - 1))
        wide = jax.tree.map(rep, states)
        deal = jnp.full((52 * n, 3), -1, jnp.int64).at[:, 0].set(cand)
        forced = force_deal(wide, deal, jnp.tile(is_single, (52,)))
        sig_f, pay_f, leg_f = rows_of(forced, 52 * n)
        base = (sig_f * pay_f * leg_f).sum(1).reshape(52, n)    # [52, n]
        seen = jnp.concatenate(
            [states.hole.reshape(n, 4), states.board], axis=1)  # [n, 9]
        # [52, n]: card c still in the deck from lane j's view
        unseen = ~(jnp.arange(52)[:, None, None]
                   == seen[None, :, :]).any(-1)
        n_unseen = jnp.maximum(unseen.sum(0), 1)
        mean_base = (jnp.where(unseen, base, 0.0).sum(0)) / n_unseen

        states2 = G.deal_board(states, k)
        dealt = jnp.where(
            (states2.board >= 0) & (states.board < 0), states2.board, -1
        ).max(axis=1)                                           # [n]
        dealt_base = base[jnp.clip(dealt, 0), jnp.arange(n)]
        # signed for whoever acts next after the deal
        t_next = G.turn_of(states2)
        sign = jnp.where(t_next == 0, 1.0, -1.0)
        chance_corr = jnp.where(
            is_single, sign * (mean_base - dealt_base), 0.0)

        # --- action corrections + blueprint sampling ------------------
        t2 = G.turn_of(states2)
        acting = t2 <= G.TURN_P1
        sigma, pay, legal = rows_of(states2, n)
        logits = jnp.where(legal & (sigma > 0),
                           jnp.log(jnp.maximum(sigma, 1e-20)), -jnp.inf)
        safe = jnp.where(jnp.isfinite(logits).any(1, keepdims=True),
                         logits, jnp.where(legal, 0.0, -jnp.inf))
        col = jax.random.categorical(jax.random.fold_in(k, 7), safe, -1)
        ev = (sigma * pay * legal).sum(1)
        taken = jnp.take_along_axis(pay, col[:, None], axis=1)[:, 0]
        # hero-signed: hero's own transient luck is subtracted, the
        # villain's mirrored (ref: correction.rs action_correction)
        sign_a = jnp.where(t2 == 0, 1.0, -1.0)
        act_corr = jnp.where(acting, sign_a * (ev - taken), 0.0)

        states3 = G.apply_cols(states2, col.astype(jnp.int32), menu, acting)
        return states3, corr + chance_corr + act_corr

    states, corr = jax.lax.fori_loop(
        0, max_steps, body, (states, jnp.zeros(n, jnp.float32))
    )
    pnl = G.settle(states)[:, 0]
    finished = G.turn_of(states) == G.TURN_TERMINAL
    return pnl, pnl + corr, finished


def selfplay_delta(table: InfoTable, bucket_fn, n_hands: int = 10_240,
                   batch: int = 256, seed: int = 0, menu=None,
                   max_steps: int = 24) -> AivatDelta:
    """Measured AIVAT variance reduction on blueprint self-play
    (ref: arena/src/lib.rs:4-5 claims 10-44×). Both seats play the
    blueprint, so true skill is 0 and every chip of spread is luck the
    control variates should absorb."""
    menu = jnp.asarray(MENU_PLURIBUS if menu is None else menu)
    # thread lookup tables through jit as ARGUMENTS (closing over a
    # LookupBucket embeds its device arrays as HLO constants — the
    # exhaustive artifacts make the program gigabytes; CLAUDE.md round-1)
    btree = bucket_fn.tree() if hasattr(bucket_fn, "tree") else None
    _bound = [bucket_fn]

    def kern_inner(tbl, key, bt):
        if bt is not None:
            _bound[0] = bucket_fn.bind(bt)
        try:
            return _selfplay_kernel(tbl, lambda *a: _bound[0](*a), menu,
                                    batch, max_steps, key)
        finally:
            _bound[0] = bucket_fn

    jitted = jax.jit(kern_inner)
    kern = lambda tbl, key: jitted(tbl, key, btree)
    raws, cors = [], []
    n_batches = -(-n_hands // batch)
    for b in range(n_batches):
        pnl, corrected, fin = kern(table, jax.random.PRNGKey(seed * 7919 + b))
        fin = np.asarray(fin)
        raws.append(np.asarray(pnl)[fin])
        cors.append(np.asarray(corrected)[fin])
    raw = np.concatenate(raws).astype(np.float64)
    corrected = np.concatenate(cors).astype(np.float64)
    # Fitted control-variate coefficient (beyond-reference): the plain
    # AIVAT estimator pins α = 1 on the zero-mean correction C, which
    # only reduces variance when the learned baselines are already
    # strong. α* = −Cov(raw, C)/Var(C) minimizes variance and can never
    # do worse than raw asymptotically; fitting on the OTHER half keeps
    # the estimator unbiased (split-sample cross-fitting).
    C = corrected - raw
    n = len(raw)
    if n > 3 and C.var(ddof=1) > 0:
        h = n // 2
        out = np.empty_like(raw)
        for (fit, app) in ((slice(0, h), slice(h, None)),
                           (slice(h, None), slice(0, h))):
            a = -np.cov(raw[fit], C[fit])[0, 1] / C[fit].var(ddof=1)
            out[app] = raw[app] + a * C[app]
        corrected = out
    rm, cm = raw.mean(), corrected.mean()
    rs = raw.std(ddof=1) / math.sqrt(n) if n > 1 else 0.0
    cs = corrected.std(ddof=1) / math.sqrt(n) if n > 1 else 0.0
    var_ratio = (raw.var(ddof=1) / corrected.var(ddof=1)
                 if n > 1 and corrected.var(ddof=1) > 0 else 1.0)
    z = cm / cs if cs > 0 else 0.0
    p = 2.0 * (1.0 - _phi(abs(z)))
    return AivatDelta(n_hands=n, raw_mean=rm, raw_stderr=rs,
                      aivat_mean=cm, aivat_stderr=cs,
                      reduction=var_ratio, pvalue=p)
