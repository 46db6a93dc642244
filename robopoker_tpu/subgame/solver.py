"""Real-time subgame re-solving: depth-limited + world-partitioned MCCFR.

TPU-native counterpart of the reference's combined ``SubGameSolver<W,L>``
(ref: crates/subgame/src/solver.rs:24-143, depth/*.rs, world/*.rs) and
the ``adapt_leaf/adapt_safe/adapt_full`` entry points
(ref: crates/nlhe/src/solver.rs:96-137):

- **worlds**: each rollout tree samples a world by posterior mass, then a
  villain hole within that world (the reference's weighted world draw +
  rejection re-deal, world/solver.rs + restrict.rs — here a masked
  categorical, no rejection loop needed); infoset keys mix the world id
  so worlds accrue regret independently (WorldInfo, world/info.rs:15)
- **depth frontier**: the first chance node past the origin ends the
  rollout. Two configurations, selected by ``ResolveConfig.frontier_picks``:
  *adapt_leaf* (default) values the frontier with the blueprint's
  accumulated infoset EV at the nearest decision ancestor (the
  reference's chance-frontier terminal_value, ref: crates/mccfr/src/
  strategy/nash.rs:62-80), walker-signed; *adapt_full* plays the L×L
  biased-continuation pick game (ref: crates/subgame/src/depth/*): both
  players pick one of FRONTIER_LEAVES continuation styles (blueprint /
  fold- / passive- / aggro-biased ×5), the payoff matrix is estimated by
  biased Monte-Carlo rollouts through the blueprint to hand end (HOT
  LOOP #4, ref: nlhe/src/encoder.rs:77-147), and the pick strategies
  are themselves learned infosets in the local table
- **warmstart read-through**: reads fall through to the frozen blueprint
  transformed by the iteration-agnostic warmstart (weight = σ̄·K(K+1)/2,
  regret = R·K/T_bp; ref: crates/mccfr/src/strategy/profile.rs:96-146);
  writes land in a small local table (the reference's WorldProfile
  local-map-over-frozen-blueprint routing, world/profile.rs:30-70)
- fixed scheme per the reference: ExternalSampling + SummedRegret +
  LinearWeight (subgame/src/solver.rs:24-60)
- **harvest + blend**: refined policy summed over worlds, then per-edge
  visit-gated convex mix with the blueprint
  (ref: crates/parlor/src/players/solved.rs:127-150).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kicker import edges as E
from ..kicker import game as G
from ..mccfr.engine import averaged
from ..nlhe.table import (InfoTable, N_COLS, init_table, make_key,
                          probe_rows)
from ..nlhe.trainer import exploration_rows, regret_matching_rows, _scat, _scat_state
from ..pokerkit.constants import EPSILON, N_WORLDS
from ..pokerkit.hyperparams import (
    SamplingHyperParams,
    SubgameHyperParams,
    WarmstartHyperParams,
)


@dataclasses.dataclass(frozen=True)
class ResolveConfig:
    batch: int = 64            # rollout trees per local epoch
    level_cap: int = 64
    cap: int = 512
    max_levels: int = 6
    roll_steps: int = 4
    table_log2: int = 14       # local table (subgame infosets are few)
    # L×L frontier pick game (adapt_full; ref: subgame/src/depth/*):
    # False = blueprint-EV leaves (adapt_leaf)
    frontier_picks: bool = False
    # MC rollouts per payoff cell — matches the reference's ROLLOUTS
    # (ref: crates/subgame/src/depth/hyperparams.rs:29-43)
    frontier_rollouts: int = 16
    frontier_roll_steps: int = 14  # biased-rollout depth to hand end
    frontier_bias: float = 5.0     # bias multiplier (ref: hyperparams.rs)
    n_picks: int = 4               # FRONTIER_LEAVES continuation styles


def make_resolve_step(
    bucket_fn,
    config: ResolveConfig = ResolveConfig(),
    sampling_hp: SamplingHyperParams = SamplingHyperParams(),
    warmstart_hp: WarmstartHyperParams = WarmstartHyperParams(),
    menu: np.ndarray | None = None,
    multi: bool = False,
):
    """Build the jitted subgame re-solve epoch.

    Returns ``step(local, blueprint, head, hero_seat, probs, world_of,
    wweights, key) -> local`` where ``head`` is the observed decision
    state (batch of 1, replicated), ``probs``/``world_of``/``wweights``
    come from the posterior module. With ``multi=True`` the returned
    function takes a trailing ``n`` (int32) and runs n epochs in one
    device dispatch (dynamic fori_loop trip count — one compile serves
    every chunk size).
    """
    from ..kicker.edges import MENU_PLURIBUS
    from ..deuce.observation import ALL_POCKETS

    MENU = jnp.asarray(MENU_PLURIBUS if menu is None else menu)
    C = config
    K = float(warmstart_hp.prior_strength)
    pockets = jnp.asarray(ALL_POCKETS)
    N = C.batch * C.level_cap
    # lookup tables thread through jit as ARGUMENTS via _bound rebinding
    # (same trap + same fix as make_nlhe_step, CLAUDE.md round-1): a
    # step that closes over a full-artifact LookupBucket embeds ~3.7 GB
    # of HLO constants and the remote compile rejects/wedges
    _bound = [bucket_fn]

    def lookup(states, world):
        idx = G.actor_idx(states)
        hole = jnp.take_along_axis(
            states.hole, idx[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        bucket = _bound[0](hole.astype(jnp.int32),
                           states.board.astype(jnp.int32), states.street)
        legal = G.legal_cols(states, MENU)
        cmask = (legal * (1 << jnp.arange(N_COLS))).sum(axis=1).astype(jnp.int32)
        sub = G.packed_subgame(states)
        klo, khi = make_key(bucket, sub, cmask)
        # base (blueprint) key is world-free; local key mixes the world
        wlo = klo ^ (world * jnp.int32(0x9E3779B)) if world is not None else klo
        return klo, khi, wlo, legal

    def read_rows(local: InfoTable, blueprint: InfoTable, states, world, t_bp):
        """Read-through cumulative regret/weight with warmstart transform.

        The local row resolves through the exact probe ladder over the
        local table's stored key words (claimed on write below) — the
        round-1 single-shot ``slot_of`` silently shared regret between
        distinct subgame infosets that collided in the 2^14 table
        (VERDICT round-1 weak #4)."""
        klo, khi, wlo, legal = lookup(states, world)
        bp_row, _ = probe_rows(blueprint.key_lo, blueprint.key_hi, klo, khi)
        lc_row, _ = probe_rows(local.key_lo, local.key_hi, wlo, khi)
        seeded = local.visits[lc_row] > 0
        bp_sigma = averaged(blueprint.weight[bp_row], legal)
        warm_w = bp_sigma * (K * (K + 1.0) / 2.0)
        warm_r = blueprint.regret[bp_row] * (K / jnp.maximum(t_bp, 1.0))
        regret = jnp.where(seeded[:, None], local.regret[lc_row], warm_r)
        weight = jnp.where(seeded[:, None], local.weight[lc_row], warm_w)
        return regret, weight, legal, lc_row, bp_row, wlo, khi

    def frontier_value(blueprint: InfoTable, last_row, last_actor, walker,
                       last_legal):
        """Blueprint V(I) at the nearest decision ancestor, walker-signed.

        V(I) = Σ σ̄(a)·v̂(a) over the averaged strategy. With the
        round-2 payoff semantics (infoset EV replicated per edge —
        the reference's storage, nash.rs:46-49) this equals the flat
        legal mean; with round-3 PER-EDGE values the σ̄-weighting is
        the correct reduction, and it is exact for both."""
        from ..mccfr.engine import averaged

        pay = blueprint.payoff[last_row]
        sigma = averaged(blueprint.weight[last_row], last_legal)
        v = (pay * sigma * last_legal).sum(-1)
        return jnp.where(last_actor == walker, v, -v)

    # --- L×L continuation pick game (ref: subgame/src/depth/*) -------------
    L = C.n_picks
    PICK_LEGAL = jnp.arange(N_COLS) < L  # picks live on columns 0..L-1

    # bias class per (continuation style, action column):
    # 0 = raw blueprint, 1 = fold-biased, 2 = passive-biased, 3 = aggro
    # (ref: continuation.rs + encoder.rs sample_biased)
    BIAS_CLASS = np.zeros((4, N_COLS), bool)
    BIAS_CLASS[1, E.COL_FOLD] = True
    BIAS_CLASS[2, E.COL_CHECK] = BIAS_CLASS[2, E.COL_CALL] = True
    BIAS_CLASS[3, E.COL_SHOVE] = True
    BIAS_CLASS[3, E.COL_RAISE0:] = True
    BIAS_CLASS = jnp.asarray(BIAS_CLASS)

    def biased_roll(states, blueprint: InfoTable, internal_seat,
                    bias_int, bias_ext, key):
        """Both players play the blueprint σ̄ with continuation biases to
        hand end; returns the internal player's terminal pnl
        (ref: crates/nlhe/src/encoder.rs:77-147 biased_rollout)."""
        n = states.pot.shape[0]

        def body(i, st):
            st = G.deal_board(st, jax.random.fold_in(key, i))
            t = G.turn_of(st)
            is_choice = t <= 1
            klo, khi, _, legal = lookup(st, None)
            row, _ = probe_rows(blueprint.key_lo, blueprint.key_hi,
                                klo, khi)
            sigma = averaged(blueprint.weight[row], legal)
            actor_bias = jnp.where(t == internal_seat, bias_int, bias_ext)
            boost = BIAS_CLASS[jnp.clip(actor_bias, 0, 3)]  # [n, 9]
            w = sigma * jnp.where(boost, C.frontier_bias, 1.0)
            w = jnp.where(legal, w, 0.0)
            logits = jnp.where(legal, jnp.log(jnp.maximum(w, EPSILON)), -jnp.inf)
            keys = jax.vmap(jax.random.fold_in, (None, 0))(
                jax.random.fold_in(key, 1000 + i), jnp.arange(n)
            )
            col = jax.vmap(jax.random.categorical)(keys, logits)
            return G.apply_cols(st, col, MENU, is_choice)

        st = jax.lax.fori_loop(0, C.frontier_roll_steps, body, states)
        st = G.deal_board(st, jax.random.fold_in(key, 9999))
        pnl = G.settle(st)
        return jnp.take_along_axis(
            pnl, jnp.broadcast_to(internal_seat, (n,))[:, None], axis=1
        )[:, 0]

    def pick_rows(states, local, world, phase):
        """Local-table rows for pick infosets: frontier identity + phase
        marker (1 = internal pick, 2 = external pick), world-mixed like
        every other subgame infoset (WorldInfo over DepthInfo). Exact
        probe ladder, like every other local read."""
        klo, khi, wlo, _ = lookup(states, world)
        plo = wlo ^ (jnp.int32(0x51C3) * jnp.int32(phase + 1))
        row, _ = probe_rows(local.key_lo, local.key_hi, plo, khi)
        return row, plo, khi

    def frontier_picks_value(states, frontier, world, reach_here, walker,
                             local, blueprint, hero_seat, key, acc):
        """Value of frontier lanes under the L×L pick game + local-table
        regret/weight deltas for the walker's pick infosets.

        acc = (rdelta, touched, occ, counts) over [T+1] pick rows.
        Returns (value [n] walker-perspective, acc').
        """
        n = states.pot.shape[0]
        T = 1 << C.table_log2
        r_int, plo_int, khi_p = pick_rows(states, local, world, 1)
        r_ext, plo_ext, _ = pick_rows(states, local, world, 2)
        walker_is_int = walker == hero_seat

        # opponent's pick: sampled from its exploration distribution
        opp_row = jnp.where(walker_is_int, r_ext, r_int)
        own_row = jnp.where(walker_is_int, r_int, r_ext)
        own_plo = jnp.where(walker_is_int, plo_int, plo_ext)
        q_opp = exploration_rows(local.weight[opp_row], PICK_LEGAL[None, :],
                                 sampling_hp)
        pi_opp = regret_matching_rows(local.regret[opp_row], PICK_LEGAL[None, :])
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.fold_in(key, 31337), jnp.arange(n)
        )
        logits = jnp.where(PICK_LEGAL[None, :],
                           jnp.log(jnp.maximum(q_opp, EPSILON)), -jnp.inf)
        opp_pick = jax.vmap(jax.random.categorical)(keys, logits)
        opp_ratio = (
            jnp.take_along_axis(pi_opp, opp_pick[:, None], 1)[:, 0]
            / jnp.maximum(
                jnp.take_along_axis(q_opp, opp_pick[:, None], 1)[:, 0], EPSILON)
        )

        # payoff cells for the walker's own 4 picks: [n, L] means over R
        # biased rollouts each (internal-perspective values)
        R = C.frontier_rollouts
        reps = L * R
        big = jax.tree.map(
            lambda a: jnp.repeat(a, reps, axis=0), states
        )  # [n*L*R, ...]
        cell = jnp.tile(jnp.repeat(jnp.arange(L), R), n)          # own pick
        opp_big = jnp.repeat(opp_pick, reps)
        wint = jnp.repeat(jnp.full(n, 0, jnp.int32) + walker_is_int.astype(jnp.int32), reps)
        bias_int = jnp.where(wint == 1, cell, opp_big)
        bias_ext = jnp.where(wint == 1, opp_big, cell)
        pnl_int = biased_roll(
            big, blueprint, jnp.repeat(jnp.full(n, hero_seat, jnp.int32), reps),
            bias_int, bias_ext, jax.random.fold_in(key, 77777),
        )
        P = pnl_int.reshape(n, L, R).mean(-1)                     # [n, L]
        vals = jnp.where(walker_is_int, P, -P)                    # walker sign
        vals = vals * opp_ratio[:, None]
        vals = jnp.pad(vals, ((0, 0), (0, N_COLS - L)))

        # walker's pick policy from the local table
        pi_own = regret_matching_rows(local.regret[own_row], PICK_LEGAL[None, :])
        v = (pi_own * vals).sum(-1)

        # deltas for the walker's pick infoset (+ its key words so the
        # write path can claim the rows for exact probing)
        rd, tc, oc, ct, kl, kh = acc
        rows = jnp.where(frontier, own_row, T)
        contrib = jnp.where(
            frontier[:, None] & PICK_LEGAL[None, :],
            reach_here[:, None] * (vals - v[:, None]), 0.0,
        )
        rd = rd.at[rows].add(contrib)
        tc = tc.at[rows].max(frontier[:, None] & PICK_LEGAL[None, :])
        oc = oc.at[rows].max(frontier)
        ct = ct.at[rows].add(frontier.astype(jnp.int32))
        # atomic pairing: winner by max lane id, then gather BOTH words
        # from it; merge into the accumulator by lexicographic pair max
        # (associative across calls, never mixes words of two keys)
        imin = jnp.iinfo(jnp.int32).min
        wid = jnp.full(T + 1, -1, jnp.int32).at[rows].max(
            jnp.where(frontier, jnp.arange(n, dtype=jnp.int32), -1))
        safe = jnp.maximum(wid, 0)
        kl_new = jnp.where(wid >= 0, own_plo[safe], imin)
        kh_new = jnp.where(wid >= 0, khi_p[safe], imin)
        take = (kl_new > kl) | ((kl_new == kl) & (kh_new > kh))
        kl = jnp.where(take, kl_new, kl)
        kh = jnp.where(take, kh_new, kh)
        return v, (rd, tc, oc, ct, kl, kh)

    def roll(states, local, blueprint, world, walker, t_bp, key,
             init_last=None):
        """Opponent/chance roll that STOPS at chance nodes (depth frontier)
        and returns (states, ratio, frontier_mask, frontier_value).

        ``init_last`` seeds the nearest-decision-ancestor backstop with the
        expanding parent's (bp_row, actor, legal) so a frontier reached
        with no decision inside the roll (walker's action closed the
        street) still values against the correct infoset."""
        B = states.pot.shape[0]

        def body(i, carry):
            states, ratio, last_row, last_actor, last_legal = carry
            t = G.turn_of(states)
            is_opp = (t <= 1) & (t != walker)
            regret, weight, legal, lc_row, bp_row, _, _ = read_rows(
                local, blueprint, states, world, t_bp
            )
            q = exploration_rows(weight, legal, sampling_hp)
            pi = regret_matching_rows(regret, legal)
            logits = jnp.where(legal, jnp.log(jnp.maximum(q, EPSILON)), -jnp.inf)
            keys = jax.vmap(jax.random.fold_in, (None, 0))(
                jax.random.fold_in(key, i), jnp.arange(B)
            )
            col = jax.vmap(jax.random.categorical)(keys, logits)
            picked_pi = jnp.take_along_axis(pi, col[:, None], axis=1)[:, 0]
            picked_q = jnp.take_along_axis(q, col[:, None], axis=1)[:, 0]
            ratio = ratio * jnp.where(
                is_opp, picked_pi / jnp.maximum(picked_q, EPSILON), 1.0
            )
            # remember the acting infoset (frontier backstop)
            dec = t <= 1
            last_row = jnp.where(dec, bp_row, last_row)
            last_actor = jnp.where(dec, t, last_actor)
            last_legal = jnp.where(dec[:, None], legal, last_legal)
            states = G.apply_cols(states, col, MENU, is_opp)
            return states, ratio, last_row, last_actor, last_legal

        ratio0 = jnp.ones(B, jnp.float32)
        if init_last is None:
            init_last = (jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
                         jnp.zeros((B, N_COLS), bool))
        init = (states, ratio0) + tuple(init_last)
        states, ratio, last_row, last_actor, last_legal = jax.lax.fori_loop(
            0, C.roll_steps, body, init
        )
        t = G.turn_of(states)
        at_frontier = t == G.TURN_CHANCE
        fval = frontier_value(blueprint, last_row, last_actor, walker, last_legal)
        return states, ratio, at_frontier, fval, last_row, last_actor, last_legal

    def step(local: InfoTable, blueprint: InfoTable, head: G.TableState,
             hero_seat, probs, world_of, wweights, key):
        t = local.epoch
        t_bp = blueprint.epoch.astype(jnp.float32)
        walker = (t % 2).astype(jnp.int32)
        ekey = jax.random.fold_in(key, t)
        B, CAP, LC = C.batch, C.cap, C.level_cap
        rows_b = jnp.arange(B)[:, None]

        # --- roots: head replicated; villain hole ~ posterior|world -------
        world = jax.random.categorical(
            jax.random.fold_in(ekey, 1), jnp.log(jnp.maximum(wweights, 1e-30)),
            shape=(B,),
        ).astype(jnp.int32)
        hole_logits = jnp.where(
            world_of[None, :] == world[:, None],
            jnp.log(jnp.maximum(probs, 1e-30))[None, :], -jnp.inf,
        )
        hkeys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.fold_in(ekey, 2), jnp.arange(B)
        )
        hole_idx = jax.vmap(jax.random.categorical)(hkeys, hole_logits)
        vh = pockets[hole_idx].astype(jnp.int8)

        roots = jax.tree.map(
            lambda a: jnp.broadcast_to(a[0][None], (B,) + a.shape[1:]), head
        )
        villain = (1 - hero_seat).astype(jnp.int32)
        newhole = roots.hole.at[jnp.arange(B), villain].set(vh)
        roots = roots._replace(hole=newhole)

        # slot metadata (mirrors the blueprint trainer)
        parent = jnp.zeros((B, CAP), jnp.int32)
        pcol = jnp.zeros((B, CAP), jnp.int32)
        ratio_in = jnp.zeros((B, CAP), jnp.float32)
        reach = jnp.zeros((B, CAP), jnp.float32)
        is_term = jnp.zeros((B, CAP), bool)
        term_value = jnp.zeros((B, CAP), jnp.float32)
        lrow_of = jnp.zeros((B, CAP), jnp.int32)
        klo_of = jnp.zeros((B, CAP), jnp.int32)   # local key words per slot
        khi_of = jnp.zeros((B, CAP), jnp.int32)   # (claimed on write)
        legal_of = jnp.zeros((B, CAP, N_COLS), bool)
        branch_of = jnp.zeros((B, CAP, N_COLS), bool)
        regret_of = jnp.zeros((B, CAP, N_COLS), jnp.float32)
        level_of = jnp.full((B, CAP), -1, jnp.int32)
        valid = jnp.zeros((B, CAP), bool)
        n_slots = jnp.zeros(B, jnp.int32)

        # pick-infoset delta accumulators (L×L frontier game; row T = spill);
        # the last two collect the pick rows' key words for claiming
        # (INT32_MIN = no writer, resolved by max-scatter)
        T_local = 1 << C.table_log2
        imin = jnp.iinfo(jnp.int32).min
        acc = (
            jnp.zeros((T_local + 1, N_COLS), jnp.float32),
            jnp.zeros((T_local + 1, N_COLS), bool),
            jnp.zeros(T_local + 1, bool),
            jnp.zeros(T_local + 1, jnp.int32),
            jnp.full(T_local + 1, imin, jnp.int32),
            jnp.full(T_local + 1, imin, jnp.int32),
        )

        def terminalize(states, ratio, frontier, fval, walker, reach_here,
                        world_lanes, fkey, acc):
            tt = G.turn_of(states)
            is_t = (tt == G.TURN_TERMINAL) | frontier
            pnl = G.settle(states)
            if C.frontier_picks:
                pv, acc = frontier_picks_value(
                    states, frontier, world_lanes, reach_here, walker,
                    local, blueprint, hero_seat, fkey, acc,
                )
                v = jnp.where(frontier, pv, pnl[:, walker])
            else:
                v = jnp.where(frontier, fval, pnl[:, walker])
            return is_t, v, acc

        # head may itself be the walker's node or a villain node: roll first
        roots, r0, f0, fv0, *_ = roll(
            roots, local, blueprint, world_broadcast(world, 1), walker, t_bp,
            jax.random.fold_in(ekey, 3),
        )
        is_t0, v0, acc = terminalize(
            roots, r0, f0, fv0, walker, r0, world,
            jax.random.fold_in(ekey, 4), acc,
        )
        parent = parent.at[:, 0].set(-1)
        ratio_in = ratio_in.at[:, 0].set(r0)
        reach = reach.at[:, 0].set(r0)
        is_term = is_term.at[:, 0].set(is_t0)
        term_value = term_value.at[:, 0].set(v0)
        level_of = level_of.at[:, 0].set(0)
        valid = valid.at[:, 0].set(True)
        n_slots = n_slots + 1

        def widen(states1):
            return jax.tree.map(
                lambda a: jnp.broadcast_to(
                    a[:, None, ...], (B, LC) + a.shape[1:]
                ).reshape((N,) + a.shape[1:]),
                states1,
            )

        level_states = widen(roots)
        level_valid = jnp.zeros((B, LC), bool).at[:, 0].set(~is_t0)
        level_slot = jnp.zeros((B, LC), jnp.int32)
        level_world = jnp.broadcast_to(world[:, None], (B, LC))

        def level_body(lvl, lcarry):
            (parent, pcol, ratio_in, reach, is_term, term_value, level_of,
             valid, lrow_of, klo_of, khi_of, legal_of, branch_of, regret_of,
             n_slots, level_states, level_valid, level_slot, acc) = lcarry
            lkey = jax.random.fold_in(ekey, 100 + lvl)
            wflat = level_world.reshape(N)
            regret, weight, legal, lc_row, bp_row, wlo, khi_w = read_rows(
                local, blueprint, level_states, wflat, t_bp
            )
            legal2 = legal.reshape(B, LC, N_COLS)
            branch = legal2 & level_valid[:, :, None]

            bmask = branch.reshape(B, LC * N_COLS)
            prefix = jnp.cumsum(bmask, axis=1) - 1
            child_slot = n_slots[:, None] + prefix
            child_lpos = prefix
            ok = bmask & (child_slot < CAP) & (child_lpos < LC)
            n_slots = jnp.minimum(n_slots + bmask.sum(axis=1), CAP)

            sl = jnp.where(level_valid, level_slot, CAP)
            ok3 = ok.reshape(B, LC, N_COLS)
            lrow_of = _scat(lrow_of, sl, lc_row.reshape(B, LC))
            klo_of = _scat(klo_of, sl, wlo.reshape(B, LC))
            khi_of = _scat(khi_of, sl, khi_w.reshape(B, LC))
            legal_of = _scat(legal_of, sl, legal2)
            branch_of = _scat(branch_of, sl, ok3)
            regret_of = _scat(regret_of, sl, regret.reshape(B, LC, N_COLS))

            parent_reach = reach[rows_b, jnp.minimum(sl, CAP - 1)]
            cs3 = child_slot.reshape(B, LC, N_COLS)
            cl3 = child_lpos.reshape(B, LC, N_COLS)

            # Phase 1 — cheap: apply each column and scatter pre-roll
            # children into the next level buffer (single consolidated
            # roll below instead of one roll per column)
            bp_row2 = bp_row.reshape(B, LC)
            legal3 = legal.reshape(B, LC, N_COLS)

            def expand_col(col, carry):
                (parent, pcol, level_of, valid, next_states, next_valid,
                 next_slot, next_pr, next_bprow, next_plegal) = carry
                m = jnp.take(ok3, col, axis=2)
                cs = jnp.take(cs3, col, axis=2)
                cl = jnp.take(cl3, col, axis=2)
                st = G.apply_cols(
                    level_states, jnp.full(N, col, jnp.int32), MENU, m.reshape(N)
                )
                csc = jnp.where(m, cs, CAP)
                parent = _scat(parent, csc, sl)
                pcol = _scat(pcol, csc, jnp.zeros((B, LC), jnp.int32) + col)
                level_of = _scat(level_of, csc, jnp.full((B, LC), lvl + 1, jnp.int32))
                valid = _scat(valid, csc, jnp.ones((B, LC), bool))

                clc = jnp.where(m, cl, LC)
                next_states = _scat_state(next_states, clc, st, B, LC)
                next_valid = _scat(next_valid, clc, jnp.ones((B, LC), bool))
                next_slot = _scat(next_slot, clc, cs)
                next_pr = _scat(next_pr, clc, parent_reach)
                # frontier backstop: each child carries its parent's infoset
                next_bprow = _scat(next_bprow, clc, bp_row2)
                next_plegal = _scat(next_plegal, clc, legal3)
                return (parent, pcol, level_of, valid, next_states,
                        next_valid, next_slot, next_pr, next_bprow,
                        next_plegal)

            carry = (parent, pcol, level_of, valid, level_states,
                     jnp.zeros((B, LC), bool), jnp.zeros((B, LC), jnp.int32),
                     jnp.zeros((B, LC), jnp.float32),
                     jnp.zeros((B, LC), jnp.int32),
                     jnp.zeros((B, LC, N_COLS), bool))
            (parent, pcol, level_of, valid, next_states, next_valid,
             next_slot, next_pr, next_bprow, next_plegal) = jax.lax.fori_loop(
                0, N_COLS, expand_col, carry
            )

            # Phase 2 — one roll + terminalize for all the level's children
            st, rr, fr, fv, *_ = roll(
                next_states, local, blueprint, wflat, walker, t_bp,
                jax.random.fold_in(lkey, 77),
                init_last=(next_bprow.reshape(N),
                           jnp.full(N, 0, jnp.int32) + walker,
                           next_plegal.reshape(N, N_COLS)),
            )
            is_t, vv, acc = terminalize(
                st, rr, fr, fv, walker,
                next_pr.reshape(N) * rr, wflat,
                jax.random.fold_in(lkey, 200), acc,
            )
            rr2 = rr.reshape(B, LC)
            term = is_t.reshape(B, LC)
            vv2 = vv.reshape(B, LC)
            csc2 = jnp.where(next_valid, next_slot, CAP)
            ratio_in = _scat(ratio_in, csc2, rr2)
            reach = _scat(reach, csc2, next_pr * rr2)
            is_term = _scat(is_term, csc2, term)
            term_value = _scat(term_value, csc2, vv2)

            level_states = st
            level_valid = next_valid & ~term
            level_slot = next_slot
            return (parent, pcol, ratio_in, reach, is_term, term_value,
                    level_of, valid, lrow_of, klo_of, khi_of, legal_of,
                    branch_of, regret_of, n_slots, level_states, level_valid,
                    level_slot, acc)

        def level_cond(carry):
            lvl, lcarry = carry
            return (lvl < C.max_levels) & lcarry[16].any()

        def level_wbody(carry):
            lvl, lcarry = carry
            return lvl + 1, level_body(lvl, lcarry)

        _, (parent, pcol, ratio_in, reach, is_term, term_value, level_of,
            valid, lrow_of, klo_of, khi_of, legal_of, branch_of, regret_of,
            n_slots, level_states, level_valid, level_slot,
            acc) = jax.lax.while_loop(
            level_cond, level_wbody,
            (jnp.int32(0),
             (parent, pcol, ratio_in, reach, is_term, term_value, level_of,
              valid, lrow_of, klo_of, khi_of, legal_of, branch_of, regret_of,
              n_slots, level_states, level_valid, level_slot, acc)),
        )

        # surviving deep lines: treat as frontier via their stored regrets
        sl = jnp.where(level_valid, level_slot, CAP)
        is_term = _scat(is_term, sl, jnp.ones((B, LC), bool))
        term_value = _scat(term_value, sl, jnp.zeros((B, LC), jnp.float32))

        # upward pass (policies from the read-through cumulative regrets)
        v = jnp.where(is_term, term_value, 0.0)
        edge_val = jnp.zeros((B, CAP, N_COLS), jnp.float32)
        pi_all = regret_matching_rows(regret_of, legal_of)

        def up_body(i, ucarry):
            v, edge_val = ucarry
            lvl = C.max_levels - i
            at = valid & (level_of == lvl)
            vv = (branch_of * pi_all * edge_val).sum(-1)
            v = jnp.where(at & ~is_term, vv, v)
            p = jnp.where(at, parent, CAP)
            contrib = jnp.where(at, ratio_in * v, 0.0)
            edge_val = edge_val.at[rows_b, p, pcol].add(contrib, mode="drop")
            return v, edge_val

        v, edge_val = jax.lax.fori_loop(0, C.max_levels, up_body, (v, edge_val))
        v0v = (branch_of * pi_all * edge_val).sum(-1)
        v = jnp.where(valid & (level_of == 0) & ~is_term, v0v, v)

        # deltas → local table (SummedRegret + LinearWeight, the
        # reference's fixed subgame scheme)
        upd = valid & ~is_term
        rdelta_slot = jnp.where(
            upd[:, :, None] & branch_of,
            reach[:, :, None] * (edge_val - v[:, :, None]), 0.0,
        )
        pdelta_slot = jnp.where(upd, reach * v, 0.0)

        T = local.capacity
        rows_flat = jnp.where(upd, lrow_of, T).reshape(-1)
        rdelta = jnp.zeros((T + 1, N_COLS), jnp.float32).at[rows_flat].add(
            rdelta_slot.reshape(-1, N_COLS))[:T]
        touched = jnp.zeros((T + 1, N_COLS), bool).at[rows_flat].max(
            (upd[:, :, None] & branch_of).reshape(-1, N_COLS))[:T]
        occ = jnp.zeros(T + 1, bool).at[rows_flat].max(upd.reshape(-1))[:T]
        legal_tab = jnp.zeros((T + 1, N_COLS), bool).at[rows_flat].max(
            (upd[:, :, None] & legal_of).reshape(-1, N_COLS))[:T]
        pdelta = jnp.zeros(T + 1, jnp.float32).at[rows_flat].add(
            pdelta_slot.reshape(-1))[:T]
        counts = jnp.zeros(T + 1, jnp.int32).at[rows_flat].add(
            upd.reshape(-1).astype(jnp.int32))[:T]

        # key words of this epoch's writers. The winner is picked by
        # max writer-id, then BOTH words gather from that one writer —
        # independent per-word max-scatters could pair lo and hi from
        # different keys into a phantom claim that matches neither
        imin32 = jnp.iinfo(jnp.int32).min
        flat_ids = jnp.arange(B * CAP, dtype=jnp.int32)
        wid = jnp.full(T + 1, -1, jnp.int32).at[rows_flat].max(
            jnp.where(upd.reshape(-1), flat_ids, -1))[:T]
        safe = jnp.maximum(wid, 0)
        klo_tab = jnp.where(wid >= 0, klo_of.reshape(-1)[safe], imin32)
        khi_tab = jnp.where(wid >= 0, khi_of.reshape(-1)[safe], imin32)

        # merge the L×L pick-infoset deltas (no blueprint warmstart there)
        if C.frontier_picks:
            rd_p, tc_p, oc_p, ct_p, kl_p, kh_p = acc
            rdelta = rdelta + rd_p[:T]
            touched = touched | tc_p[:T]
            occ = occ | oc_p[:T]
            legal_tab = legal_tab | (oc_p[:T][:, None] & PICK_LEGAL[None, :])
            counts = counts + ct_p[:T]
            # lexicographic PAIR max — keeps (lo, hi) atomic when a row
            # was written by both the main pass and the pick game
            take_p = (kl_p[:T] > klo_tab) | (
                (kl_p[:T] == klo_tab) & (kh_p[:T] > khi_tab))
            klo_tab = jnp.where(take_p, kl_p[:T], klo_tab)
            khi_tab = jnp.where(take_p, kh_p[:T], khi_tab)
        # cumulative base for unseeded rows = warmstart values
        warm_r = jnp.zeros((T + 1, N_COLS), jnp.float32).at[rows_flat].max(
            jnp.where(upd[:, :, None], regret_of, -jnp.inf).reshape(-1, N_COLS)
        )[:T]
        seeded = local.visits > 0
        base_r = jnp.where(seeded[:, None], local.regret,
                           jnp.where(occ[:, None], warm_r, 0.0))
        pi_tab = regret_matching_rows(base_r, legal_tab)

        regret = jnp.where(touched, base_r + rdelta, local.regret)
        tw = t.astype(jnp.float32)
        occ_edge = occ[:, None] & legal_tab
        weight = jnp.where(
            occ_edge,
            jnp.maximum(local.weight + pi_tab * counts[:, None] * tw, EPSILON),
            local.weight,
        )
        payoff = jnp.where(
            occ_edge,
            local.payoff
            + (pdelta[:, None] / jnp.maximum(counts, 1)[:, None] - local.payoff)
            / (local.visits + 1)[:, None].astype(jnp.float32),
            local.payoff,
        )
        visits = local.visits + jnp.where(occ, counts, 0)

        # claim key words: empty slots or matching residents only — a
        # fallback writer sharing the ladder tail must never evict the
        # resident's key (mirrors the blueprint trainer's claim guard)
        cur_lo, cur_hi = local.key_lo, local.key_hi
        claimable = ((cur_lo == 0) & (cur_hi == 0)) | (
            (cur_lo == klo_tab) & (cur_hi == khi_tab)
        )
        wr = occ & claimable & (klo_tab != imin32)
        key_lo = jnp.where(wr, klo_tab, cur_lo)
        key_hi = jnp.where(wr, khi_tab, cur_hi)
        return InfoTable(
            regret=regret, weight=weight, payoff=payoff, visits=visits,
            key_lo=key_lo, key_hi=key_hi,
            bucket=local.bucket, choices=local.choices, epoch=t + 1,
        )

    def world_broadcast(world, reps):
        return jnp.repeat(world, reps, total_repeat_length=world.shape[0] * reps)

    if multi:
        # chunked re-solve: run `n` epochs in ONE dispatch (dynamic trip
        # count → while_loop lowering, one compile for every chunk
        # size). Round-4 measured ~240 ms/epoch at ~80 ms device time —
        # per-dispatch tunnel RTT dominates, so chunking multiplies
        # iterations-in-budget (VERDICT r4 #2). Randomness folds the
        # epoch counter inside `step`, so re-passing the same key per
        # iteration matches the unchunked loop exactly.
        single = step

        def step(local, blueprint, head, hero_seat, probs,
                 world_of, wweights, key, n):
            return jax.lax.fori_loop(
                0, n,
                lambda i, loc: single(loc, blueprint, head, hero_seat,
                                      probs, world_of, wweights, key),
                local)

    btree = bucket_fn.tree() if hasattr(bucket_fn, "tree") else None
    if btree is None:
        return jax.jit(step)

    def step_with_tables(local, blueprint, head, hero_seat, probs,
                         world_of, wweights, key, *rest):
        *rest, btree_arg = rest
        _bound[0] = bucket_fn.bind(btree_arg)
        try:
            return step(local, blueprint, head, hero_seat, probs,
                        world_of, wweights, key, *rest)
        finally:
            _bound[0] = bucket_fn

    jitted = jax.jit(step_with_tables)
    fn = lambda *a: jitted(*a, btree)
    fn.jitted = jitted
    fn.extra_args = (btree,)
    return fn


def harvest_blend(local: InfoTable, blueprint: InfoTable, head: G.TableState,
                  bucket_fn, hero_seat: int,
                  menu: np.ndarray | None = None,
                  n_worlds: int = N_WORLDS,
                  hp: SubgameHyperParams = SubgameHyperParams()) -> np.ndarray:
    """Refined policy at the head infoset, blended with the blueprint.

    Sums refined weights and visits over the world-partitioned infosets
    (ref: harvest.rs:18-39), then per-edge ``w = v/(v+threshold)`` convex
    mix (ref: solved.rs:133-150). Returns [9] probabilities.
    """
    from ..kicker.edges import MENU_PLURIBUS
    import jax.numpy as jnp

    MENU = jnp.asarray(MENU_PLURIBUS if menu is None else menu)
    idx = G.actor_idx(head)
    hole = jnp.take_along_axis(
        head.hole, idx[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    bucket = bucket_fn(hole.astype(jnp.int32), head.board.astype(jnp.int32),
                       head.street)
    legal = G.legal_cols(head, MENU)
    cmask = (legal * (1 << jnp.arange(N_COLS))).sum(axis=1).astype(jnp.int32)
    sub = G.packed_subgame(head)
    klo, khi = make_key(bucket, sub, cmask)

    bp_row = int(np.asarray(
        probe_rows(blueprint.key_lo, blueprint.key_hi, klo, khi)[0])[0])
    bp_sigma = np.asarray(averaged(
        blueprint.weight[bp_row][None], legal[0][None]))[0]

    w_sum = np.zeros(N_COLS, np.float32)
    v_sum = np.zeros(N_COLS, np.float32)
    for w in range(n_worlds):
        wlo = klo ^ (jnp.int32(w) * jnp.int32(0x9E3779B))
        row = int(np.asarray(
            probe_rows(local.key_lo, local.key_hi, wlo, khi)[0])[0])
        w_sum += np.asarray(local.weight[row])
        v_sum += float(np.asarray(local.visits[row])) * np.ones(N_COLS)

    legal0 = np.asarray(legal[0])
    refined = np.where(legal0, np.maximum(w_sum, 0.0), 0.0)
    z = refined.sum()
    refined = refined / z if z > 0 else bp_sigma

    blend_w = v_sum / (v_sum + hp.visit_threshold)
    mixed = blend_w * refined + (1.0 - blend_w) * bp_sigma
    mixed = np.where(legal0, mixed, 0.0)
    return mixed / max(mixed.sum(), 1e-30)


def make_resolve_pool(bucket_fn, config: ResolveConfig = ResolveConfig(),
                      **kw):
    """Pooled re-solver: ONE dispatch advances S independent subgames
    (vmap over the chunked multi-epoch step — bit-identical to stepping
    each subgame alone, tests/test_subgame.py).

    The TPU-native form of the reference's concurrent-session trick
    (ref: crates/spar/src/runtime.rs:20-24 — ``depth*4`` runs 4 CFR
    solves to fill idle cores during each solve's wait): instead of
    thread interleaving, the session axis becomes a batch dimension, so
    S decisions' rollouts share every dispatch. Returns
    ``pool(locals, blueprint, heads, hero_seats, probs, world_of,
    wweights, keys, n)`` where every per-subgame argument carries a
    leading [S] axis and ``keys`` is [S, 2] (independent randomness per
    session).
    """
    step = make_resolve_step(bucket_fn, config, multi=True, **kw)
    inner = getattr(step, "jitted", step)
    extra = getattr(step, "extra_args", ())
    # vmap axes: local 0, blueprint shared, head 0, hero_seat 0,
    # probs/world/ww 0, key 0, n shared, btree shared
    axes = (0, None, 0, 0, 0, 0, 0, 0, None) + ((None,) * len(extra))
    v = jax.jit(jax.vmap(inner, in_axes=axes))
    fn = lambda locals_, bp, heads, seats, probs, world, ww, keys, n: v(
        locals_, bp, heads, seats, probs, world, ww, keys, n, *extra)
    fn.extra_args = extra
    return fn


def make_harvest_pool(bucket_fn, menu: np.ndarray | None = None,
                      n_worlds: int = N_WORLDS,
                      hp: SubgameHyperParams = SubgameHyperParams()):
    """[S]-batched fused harvest: one dispatch / one fetch for a whole
    pool of decisions (see ``make_harvest_fn``)."""
    from ..kicker.edges import MENU_PLURIBUS

    base = make_harvest_fn(bucket_fn, menu, n_worlds, hp)
    if base.btree is None:
        v = jax.jit(jax.vmap(base.inner, in_axes=(0, None, 0)))
        return lambda locals_, bp, heads: np.asarray(v(locals_, bp, heads))
    btree = base.btree
    v = jax.jit(jax.vmap(base.inner, in_axes=(0, None, 0, None)))
    return lambda locals_, bp, heads: np.asarray(v(locals_, bp, heads, btree))


def make_harvest_fn(bucket_fn, menu: np.ndarray | None = None,
                    n_worlds: int = N_WORLDS,
                    hp: SubgameHyperParams = SubgameHyperParams()):
    """Fused device-side harvest+blend (same math as ``harvest_blend``)
    returning the final [9] mixed policy in ONE dispatch / ONE fetch.

    The eager ``harvest_blend`` issues ~10 scalar fetches through the
    tunnel (~100-150 ms each on the remote runtime) — it alone ate most
    of the round-4 budget overshoot (elapsed 5.6-6.0 s vs the 5.0 s
    budget, docs/resolve_latency.md). Lookup tables thread as jit
    arguments via the usual ``_bound`` rebind (HLO-constant trap)."""
    from ..kicker.edges import MENU_PLURIBUS

    MENU = jnp.asarray(MENU_PLURIBUS if menu is None else menu)
    _bound = [bucket_fn]

    def harvest(local: InfoTable, blueprint: InfoTable, head):
        idx = G.actor_idx(head)
        hole = jnp.take_along_axis(
            head.hole, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        bucket = _bound[0](hole.astype(jnp.int32),
                           head.board.astype(jnp.int32), head.street)
        legal = G.legal_cols(head, MENU)
        cmask = (legal * (1 << jnp.arange(N_COLS))).sum(1).astype(jnp.int32)
        sub = G.packed_subgame(head)
        klo, khi = make_key(bucket, sub, cmask)
        bp_row, _ = probe_rows(blueprint.key_lo, blueprint.key_hi, klo, khi)
        bp_sigma = averaged(blueprint.weight[bp_row], legal)[0]

        wlo = klo[0] ^ (jnp.arange(n_worlds, dtype=jnp.int32)
                        * jnp.int32(0x9E3779B))
        rows, _ = probe_rows(local.key_lo, local.key_hi, wlo,
                             jnp.broadcast_to(khi[0], (n_worlds,)))
        w_sum = local.weight[rows].sum(0)
        v_sum = local.visits[rows].sum().astype(jnp.float32)

        legal0 = legal[0]
        refined = jnp.where(legal0, jnp.maximum(w_sum, 0.0), 0.0)
        z = refined.sum()
        refined = jnp.where(z > 0, refined / jnp.maximum(z, 1e-30), bp_sigma)
        blend_w = v_sum / (v_sum + hp.visit_threshold)
        mixed = blend_w * refined + (1.0 - blend_w) * bp_sigma
        mixed = jnp.where(legal0, mixed, 0.0)
        return mixed / jnp.maximum(mixed.sum(), 1e-30)

    btree = bucket_fn.tree() if hasattr(bucket_fn, "tree") else None
    if btree is None:
        j = jax.jit(harvest)
        fn = lambda local, blueprint, head: np.asarray(
            j(local, blueprint, head))
        fn.inner, fn.btree = harvest, None
        return fn

    def harvest_with_tables(local, blueprint, head, btree_arg):
        _bound[0] = bucket_fn.bind(btree_arg)
        try:
            return harvest(local, blueprint, head)
        finally:
            _bound[0] = bucket_fn

    jitted = jax.jit(harvest_with_tables)
    fn = lambda local, blueprint, head: np.asarray(
        jitted(local, blueprint, head, btree))
    fn.inner, fn.btree = harvest_with_tables, btree
    return fn
