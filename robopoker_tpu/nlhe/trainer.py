"""Batched external-sampling MCCFR for NLHE — the flagship training step.

TPU-native counterpart of the reference's ``Flagship =
Nlhe<LinearRegret, LinearWeight, PluribusSampling>`` solver loop
(ref: crates/nlhe/src/solver.rs:11, crates/mccfr/src/solver/solver.rs:96-
300, forge/src/fast.rs). The reference grows 128 pointer trees per epoch
on rayon threads; here the whole batch is **one jit-compiled program**:

1. **Walker-node tree, not game tree.** Chance deals and opponent
   decisions never materialize as nodes — they are applied *in place*
   during a bounded "roll" between walker decisions, accumulating the
   external-sampling importance ratio π/q (the reference's fused
   ancestor_reach/recursed_value weighting, flow.rs:128-220). Only
   walker decision points occupy slots, so a tree of thousands of game
   states compresses to tens of slots.
2. **Compacted cross-tree worklists.** Each BFS level's live walker
   nodes from *all* trees share one dense [work_cap] buffer (tree ids
   carried per entry), so lane work tracks the actual frontier width
   instead of batch × per-tree capacity — the dense-lane formulation
   wasted ~99% of lanes on masked no-ops. Children are allocated by a
   global prefix-sum with per-tree slot ranks recovered via segment
   offsets. Over-capacity branches are dropped and counted.
3. **Tail sampling**: lines still alive at the last level switch to
   on-policy sampling of the walker's own action (unbiased value
   estimate, no regret updates below) instead of truncating to 0.
4. **Fused scatter updates**: per-slot regret/weight/payoff/visit deltas
   segment-sum into the HBM InfoTable; schedules apply once per epoch
   over touched rows.

Documented batch-semantics deviations from the reference (convergence-
equivalent, SURVEY §2.5 P1): update vectors aggregate across the batch
before one schedule application instead of 128 sequential applications;
weight/visits count per-slot occurrences rather than per-tree-deduped
infoset occupancy.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kicker import edges as E
from ..kicker import game as G
from ..mccfr.sampling import PLURIBUS, TARGETED, SamplingConfig
from ..mccfr.schedules import RegretSchedule, WeightSchedule
from ..pokerkit.constants import EPSILON
from ..pokerkit.hyperparams import SamplingHyperParams, TrainingHyperParams
from .table import InfoTable, N_COLS, make_key, probe_rows


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    batch: int = 128           # trees per epoch (ref: nlhe batch=128)
    work_cap: int = 8192       # cross-tree worklist width per level
    cap: int = 1536            # walker-node slots per tree
    max_levels: int = 8        # walker decisions along a line before tail
    roll_steps: int = 5        # opp/chance steps between walker decisions
    tail_steps: int = 16       # on-policy sampled steps for deep lines
    table_log2: int = 20
    n_probes: int = 8          # open-addressing ladder depth (table.probe_rows)
    # segmented worklists: per-level widths (len == max_levels); the level
    # loop unrolls with static shapes so narrow early/late levels stop
    # paying the peak level's lane count. None = constant work_cap under a
    # while_loop (smaller program, more wasted lanes).
    level_caps: tuple[int, ...] | None = None
    # legacy alias (pre-compaction configs passed per-tree level width)
    level_cap: int | None = None
    # warmstart bias: initial regret seeded into legal columns when a row
    # is first claimed (ref: crates/kicker/src/bias.rs via Edge::regret;
    # the reference's production default is BiasHyperParams()). None = no
    # seeding — the historical behavior, and the setting every program
    # compiled before this field existed is equivalent to.
    warmstart_bias: object = None  # BiasHyperParams | None
    # terminal-settlement kernel: "jnp" (XLA-fused cascade) or "pallas"
    # (ops.evaluator_pallas.settle_pallas — fused suit-mask build +
    # both strength cascades + compare + pnl in one Mosaic kernel).
    # Bit-identical (tested); pick by measurement (scripts/bench_settle).
    settle: str = "jnp"

    def __post_init__(self):
        if self.level_cap is not None:
            object.__setattr__(
                self, "work_cap", max(self.batch * self.level_cap // 4, 256)
            )
        if self.level_caps is not None:
            assert len(self.level_caps) == self.max_levels, (
                "level_caps must give one width per level"
            )


# per-tree children emitted at each level, measured UNCLIPPED (generous
# caps) during the pluribus warmup phase (full branching — the widest
# case) via the level_emit metric; margin covers epoch-to-epoch variance.
# Values are the element-wise max over every measurement epoch so far:
# round-2 re-measured under the EXHAUSTIVE artifacts; round-3 re-measured
# FROM THE ep3199 CHECKPOINT (scripts/profile_emit.py --workdir — trees
# reshape as the strategy sharpens: the r3 measurement found the EVEN
# parity had outgrown its launch profile at levels 4-6 (59/31/5 vs
# 36/12/3 provisioned) — exactly the round-2 drop-rate creep — while the
# odd parity NARROWED). Launch-time profiles are a floor; in-run
# widening is handled by FastSession's adaptive caps.
EMIT_PROFILE = (7.0, 17.0, 33.0, 69.0, 118.0, 115.0, 56.0, 8.0)
# walker parity changes the tree shape drastically: epochs where the
# walker is seat 0 (the SB/dealer, even t) terminate much earlier —
# their frontier peaks narrower. A parity-specialized pair of
# compiled steps exploits this (see make_parity_steps).
EMIT_PROFILE_EVEN = (7.0, 17.0, 29.0, 51.0, 59.0, 31.0, 5.0, 1.0)


def segmented_caps(batch: int, max_levels: int = 8,
                   margin: float = 1.4, align: int = 256,
                   profile: tuple = EMIT_PROFILE) -> tuple[int, ...]:
    """Per-level worklist widths from the measured emit profile."""
    prof = list(profile[:max_levels])
    prof += [prof[-1]] * (max_levels - len(prof))
    caps = tuple(
        max(align, int(-(-batch * p * margin // align)) * align)
        for p in prof
    )
    return caps


def regret_matching_rows(regret, legal):
    r = jnp.where(legal, jnp.maximum(regret, EPSILON), 0.0)
    return jnp.where(legal, r / r.sum(axis=-1, keepdims=True), 0.0)


def exploration_rows(weight, legal, hp: SamplingHyperParams):
    w = jnp.where(legal, jnp.maximum(weight, EPSILON), 0.0)
    denom = w.sum(axis=-1, keepdims=True) + hp.smoothing
    sw = jnp.maximum((w / hp.temperature + hp.smoothing) / denom, hp.curiosity)
    sw = jnp.where(legal, sw, 0.0)
    return sw / sw.sum(axis=-1, keepdims=True)


def flat_scat(arr, flat_idx, val, spill):
    """Scatter into a flattened [(B*CAP)+1 spill] view of arr [B, CAP, ...].

    flat_idx entries equal to ``spill`` are dropped.
    """
    shape = arr.shape
    flat = arr.reshape((shape[0] * shape[1],) + shape[2:])
    widened = jnp.concatenate(
        [flat, jnp.zeros((1,) + flat.shape[1:], arr.dtype)], axis=0
    )
    out = widened.at[flat_idx].set(val)
    return out[:-1].reshape(shape)


def work_scat(arr, idx, val, cap):
    """Scatter into a worklist array [cap(, ...)]; idx == cap drops."""
    widened = jnp.concatenate(
        [arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)], axis=0
    )
    return widened.at[idx].set(val)[:-1]


def work_scat_state(states, idx, new_states, cap):
    return jax.tree.map(
        lambda a, b: work_scat(a, idx, b, cap), states, new_states
    )


def make_nlhe_step(
    bucket_fn: Callable,
    regret_schedule: RegretSchedule,
    weight_schedule: WeightSchedule,
    sampling: SamplingConfig,
    config: TrainerConfig = TrainerConfig(),
    sampling_hp: SamplingHyperParams = SamplingHyperParams(),
    training_hp: TrainingHyperParams = TrainingHyperParams(),
    menu: np.ndarray | None = None,
    axis_name: str | None = None,
    shard_rows: bool = False,
):
    """Build the jitted NLHE MCCFR epoch step.

    Returns ``step(table, key) -> (table, metrics)``. With ``axis_name``
    set, the step is meant to run inside ``shard_map`` over that mesh
    axis: ``config.batch`` trees per device, delta tables psum'd over ICI
    before the (replicated) schedule application — every device applies
    the identical update, so the table stays consistent without a
    parameter server (SURVEY §2.5 P3, §5.8).

    ``shard_rows`` (requires ``axis_name``): the InfoTable persists
    ROW-SHARDED across the mesh — device d owns rows [d·T/D, (d+1)·T/D).
    Rollouts read from a per-step all_gather of the four read-path arrays
    (regret/weight/key words — the ZeRO-style gather-for-compute flow);
    deltas ``psum_scatter`` so each owner applies schedules to its block
    only; payoff/visits/bucket/choices never leave their shard. This is
    the SURVEY §5.8 sharded learner table for configurations whose state
    exceeds replication headroom (the reference's 3 GB river lookup +
    200M-row blueprint scenario).
    """
    from ..kicker.edges import MENU_PLURIBUS

    MENU = jnp.asarray(MENU_PLURIBUS if menu is None else menu)
    C = config
    W = C.work_cap

    # trace-time indirection: when the bucket provider carries lookup
    # tables (LookupBucket.tree()), they are threaded through jit as
    # ARGUMENTS via the wrapper below — a closure capture would embed
    # them as HLO constants (exhaustive turn table = ~400 MB → remote
    # compile rejects the program with HTTP 413)
    _bound = [bucket_fn]

    if config.settle == "pallas":
        from ..ops import settle_pallas as settle_fn
    else:
        settle_fn = G.settle

    def lookup(states):
        """Infoset identity for the ACTING player of each state."""
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
        return klo, khi, legal, bucket.astype(jnp.int32)

    def roll(states, table, walker, key, include_walker=False, steps=None):
        """Advance through opponent/chance (and optionally sampled walker)
        moves in place; returns (states, ratio) with the ∏ π/q correction
        for opponent steps (walker/chance contribute 1)."""

        def body(i, carry):
            states, ratio = carry
            k_i = jax.random.fold_in(key, i)
            states = G.deal_board(states, k_i)
            t = G.turn_of(states)
            is_opp = (t <= 1) & (t != walker)
            is_act = is_opp | (include_walker & (t == walker))
            klo, khi, legal, _ = lookup(states)
            row, _ = probe_rows(table.key_lo, table.key_hi, klo, khi,
                                C.n_probes)
            q = exploration_rows(table.weight[row], legal, sampling_hp)
            pi = regret_matching_rows(table.regret[row], legal)
            if sampling.scheme == TARGETED:  # opponents follow current policy
                q = jnp.where(legal, jnp.maximum(pi, sampling_hp.curiosity), 0.0)
            dist = jnp.where(is_opp[:, None], q, pi)
            logits = jnp.where(legal, jnp.log(jnp.maximum(dist, EPSILON)), -jnp.inf)
            kk = jax.random.fold_in(k_i, 7)
            keys = jax.vmap(jax.random.fold_in, (None, 0))(
                kk, jnp.arange(states.pot.shape[0])
            )
            col = jax.vmap(jax.random.categorical)(keys, logits)
            picked_pi = jnp.take_along_axis(pi, col[:, None], axis=1)[:, 0]
            picked_q = jnp.take_along_axis(q, col[:, None], axis=1)[:, 0]
            ratio = ratio * jnp.where(
                is_opp, picked_pi / jnp.maximum(picked_q, EPSILON), 1.0
            )
            states = G.apply_cols(states, col, MENU, is_act)
            return states, ratio

        ratio0 = jnp.ones(states.pot.shape[0], jnp.float32)
        n = C.roll_steps if steps is None else steps

        def cond(carry):
            i, (states, _) = carry
            t = G.turn_of(states)
            rolling = (t == G.TURN_CHANCE) | ((t <= 1) & (t != walker)) \
                if not include_walker else (t != G.TURN_TERMINAL)
            return (i < n) & rolling.any()

        def wbody(carry):
            i, inner = carry
            return i + 1, body(i, inner)

        _, (states, ratio) = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), (states, ratio0))
        )
        # a trailing deal in case the last action closed a street
        states = G.deal_board(states, jax.random.fold_in(key, 99))
        return states, ratio

    def child_terminal_cols(states):
        """Analytic immediate-terminality of each action column (HU):
        fold always ends the hand; river call ends; river check ends when
        it is not the street's first action."""
        river = states.street == G.RIVER
        closes_check = river & (states.ticker >= 2)
        cols = jnp.zeros((states.pot.shape[0], N_COLS), bool)
        cols = cols.at[:, E.COL_FOLD].set(True)
        cols = cols.at[:, E.COL_CALL].set(river)
        cols = cols.at[:, E.COL_CHECK].set(closes_check)
        return cols

    def step(table: InfoTable, key: jnp.ndarray):
        if shard_rows:
            assert axis_name is not None, "shard_rows requires axis_name"
            read = table._replace(
                regret=jax.lax.all_gather(
                    table.regret, axis_name, axis=0, tiled=True),
                weight=jax.lax.all_gather(
                    table.weight, axis_name, axis=0, tiled=True),
                key_lo=jax.lax.all_gather(
                    table.key_lo, axis_name, axis=0, tiled=True),
                key_hi=jax.lax.all_gather(
                    table.key_hi, axis_name, axis=0, tiled=True),
            )
        else:
            read = table
        t = table.epoch
        walker = (t % 2).astype(jnp.int32)
        ekey = jax.random.fold_in(key, t)
        B, CAP = C.batch, C.cap
        SPILL = B * CAP  # flat spill index for dropped slot writes

        # --- global slot metadata [B, CAP] --------------------------------
        parent = jnp.zeros((B, CAP), jnp.int32)
        pcol = jnp.zeros((B, CAP), jnp.int32)
        ratio_in = jnp.zeros((B, CAP), jnp.float32)
        reach = jnp.zeros((B, CAP), jnp.float32)
        is_term = jnp.zeros((B, CAP), bool)
        term_value = jnp.zeros((B, CAP), jnp.float32)
        row_of = jnp.zeros((B, CAP), jnp.int32)
        klo_of = jnp.zeros((B, CAP), jnp.int32)
        khi_of = jnp.zeros((B, CAP), jnp.int32)
        legal_of = jnp.zeros((B, CAP, N_COLS), bool)
        branch_of = jnp.zeros((B, CAP, N_COLS), bool)
        level_of = jnp.full((B, CAP), -1, jnp.int32)
        valid = jnp.zeros((B, CAP), bool)
        n_slots = jnp.zeros(B, jnp.int32)
        dropped = jnp.zeros((), jnp.int32)

        # --- roots --------------------------------------------------------
        roots = G.root(jax.random.fold_in(ekey, 900001), B)
        roots, r0 = roll(roots, read, walker, jax.random.fold_in(ekey, 900002))
        t0 = G.turn_of(roots)
        term0 = t0 == G.TURN_TERMINAL
        pnl0 = settle_fn(roots)
        v0 = pnl0[:, walker]
        parent = parent.at[:, 0].set(-1)
        ratio_in = ratio_in.at[:, 0].set(r0)
        reach = reach.at[:, 0].set(r0)
        is_term = is_term.at[:, 0].set(term0)
        term_value = term_value.at[:, 0].set(v0)
        level_of = level_of.at[:, 0].set(0)
        valid = valid.at[:, 0].set(True)
        n_slots = n_slots + 1

        # --- worklists: live level nodes across all trees ------------------
        def dead_work(n):
            """Fresh [n] worklist of dead lanes: a terminal state (one seat
            folded) so unwritten lanes exit rolls immediately and settle
            NaN-free; tree/slot 0 is harmless because their valid flag is
            False everywhere downstream."""
            st = jax.tree.map(
                lambda a: jnp.zeros((n,) + a.shape[1:], a.dtype), roots
            )
            st = st._replace(
                board=jnp.full((n, G.N_BOARD), -1, jnp.int8),
                status=jnp.broadcast_to(
                    jnp.array([G.FOLDING, G.BETTING], jnp.int32), (n, 2)
                ),
            )
            return (st, jnp.zeros(n, jnp.int32), jnp.zeros(n, bool),
                    jnp.zeros(n, jnp.int32))

        def level_pass(lvl, lkey, meta, work, w_out):
            """Expand one BFS level: a [w_in] frontier worklist becomes a
            [w_out] children worklist. Widths are static per call site —
            the while_loop driver uses w_in == w_out == work_cap; the
            segmented driver unrolls levels with per-level widths sized to
            the measured frontier profile (``level_emit`` metric), so
            narrow early/late levels stop paying the peak level's lanes."""
            (parent, pcol, ratio_in, reach, is_term, term_value, level_of,
             valid, row_of, klo_of, khi_of, buck_of, legal_of, branch_of,
             n_slots, dropped, fallbacks, pruned, level_live, level_emit) = meta
            work_states, work_tree, work_valid, work_slot = work
            w_in = work_tree.shape[0]
            level_live = level_live.at[lvl].set(work_valid.sum())

            klo, khi, legal, buck = lookup(work_states)
            row, fb = probe_rows(read.key_lo, read.key_hi, klo, khi,
                                 C.n_probes)
            fallbacks = fallbacks + (fb & work_valid).sum()
            regret_rows = read.regret[row]

            legal = legal & work_valid[:, None]
            if sampling.prunes:
                above = regret_rows > sampling.threshold
                if sampling.scheme == PLURIBUS:
                    # pluribus never prunes pre-terminal actions
                    above = above | child_terminal_cols(work_states)
                keep = legal & above
                keep = jnp.where(keep.any(-1, keepdims=True), keep, legal)
                if sampling.scheme == PLURIBUS:
                    eu = jax.random.uniform(jax.random.fold_in(lkey, 5),
                                            (w_in,))
                    # warmup compares TREES sampled, not raw epochs: our
                    # epochs are B trees wide vs the reference's 128
                    # (pruning.rs:45-51), so the threshold is rescaled
                    # per-batch by warmup_epochs()
                    no_prune = (t < sampling.warmup_epochs(B)) | (
                        eu < sampling.explore)
                    branch = jnp.where(no_prune[:, None], legal, keep)
                else:
                    branch = keep
                # pruning-activation telemetry (VERDICT r4 #8): legal
                # branches masked off by regret-based pruning this epoch
                pruned = pruned + (legal & ~branch).sum()
            else:
                branch = legal

            # --- allocation: global compact rank + per-tree slot rank -----
            bflat = branch.reshape(w_in * N_COLS)
            grank = jnp.cumsum(bflat) - 1                       # global order
            tree_of_child = jnp.repeat(work_tree, N_COLS)
            per_tree = jnp.zeros(B + 1, jnp.int32).at[tree_of_child].add(
                bflat.astype(jnp.int32), mode="drop"
            )[:B]
            tree_offset = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(per_tree)[:-1]]
            )
            tree_rank = grank - tree_offset[tree_of_child]
            child_slot = n_slots[tree_of_child] + tree_rank      # per-tree
            child_pos = grank                                    # next worklist
            ok = bflat & (child_slot < CAP) & (child_pos < w_out)
            dropped = dropped + (bflat & ~ok).sum()
            level_emit = level_emit.at[lvl].set(bflat.sum())
            n_slots = jnp.minimum(n_slots + per_tree, CAP)

            # --- this level's slot meta (flat scatter, spill drops) -------
            sl_flat = jnp.where(
                work_valid, work_tree * CAP + work_slot, SPILL
            )
            ok3 = ok.reshape(w_in, N_COLS)
            row_of = flat_scat(row_of, sl_flat, row, SPILL)
            klo_of = flat_scat(klo_of, sl_flat, klo, SPILL)
            khi_of = flat_scat(khi_of, sl_flat, khi, SPILL)
            buck_of = flat_scat(buck_of, sl_flat, buck, SPILL)
            legal_of = flat_scat(legal_of, sl_flat, legal, SPILL)
            branch_of = flat_scat(branch_of, sl_flat, ok3, SPILL)

            parent_reach = reach.reshape(-1)[
                jnp.minimum(sl_flat, SPILL - 1)
            ]

            # Phase 1 — cheap: apply ALL columns in one [w_in*9] lane-major
            # pass (lane*9+col, matching `bflat`'s layout) and scatter the
            # *pre-roll* children into the compacted next worklist
            # (rolling happens once for the whole level below). One wide
            # vector pass instead of a 9-iteration fori keeps the program
            # short and the VPU busy.
            rep = lambda a: jnp.repeat(a, N_COLS, axis=0)
            col_f = jnp.tile(jnp.arange(N_COLS, dtype=jnp.int32), w_in)
            states_rep = jax.tree.map(rep, work_states)
            st_all = G.apply_cols(states_rep, col_f, MENU, ok)
            tree_rep = rep(work_tree)
            csf = jnp.where(ok, tree_rep * CAP + child_slot, SPILL)
            parent = flat_scat(parent, csf, rep(work_slot), SPILL)
            pcol = flat_scat(pcol, csf, col_f, SPILL)
            level_of = flat_scat(
                level_of, csf, jnp.full(w_in * N_COLS, lvl + 1, jnp.int32),
                SPILL
            )
            valid = flat_scat(valid, csf, jnp.ones(w_in * N_COLS, bool),
                              SPILL)

            cpw = jnp.where(ok, child_pos, w_out)
            ones_c = jnp.ones(w_in * N_COLS, bool)
            dstates, dtree, dvalid, dslot = dead_work(w_out)
            next_states = work_scat_state(dstates, cpw, st_all, w_out)
            next_tree = work_scat(dtree, cpw, tree_rep, w_out)
            next_valid = work_scat(dvalid, cpw, ones_c, w_out)
            next_slot = work_scat(dslot, cpw, child_slot, w_out)
            next_pr = work_scat(
                jnp.zeros(w_out, jnp.float32), cpw, rep(parent_reach), w_out
            )

            # Phase 2 — one roll + settle for the whole level's children
            st, rr = roll(next_states, read, walker,
                          jax.random.fold_in(lkey, 77))
            term = (G.turn_of(st) == G.TURN_TERMINAL) & next_valid
            vv = settle_fn(st)[:, walker]
            csf = jnp.where(next_valid, next_tree * CAP + next_slot, SPILL)
            ratio_in = flat_scat(ratio_in, csf, rr, SPILL)
            reach = flat_scat(reach, csf, next_pr * rr, SPILL)
            is_term = flat_scat(is_term, csf, term, SPILL)
            term_value = flat_scat(term_value, csf, vv, SPILL)

            meta = (parent, pcol, ratio_in, reach, is_term, term_value,
                    level_of, valid, row_of, klo_of, khi_of, buck_of,
                    legal_of, branch_of, n_slots, dropped, fallbacks, pruned,
                    level_live, level_emit)
            return meta, (st, next_tree, next_valid & ~term, next_slot)

        fallbacks = jnp.zeros((), jnp.int32)
        pruned = jnp.zeros((), jnp.int32)
        level_live = jnp.zeros(C.max_levels, jnp.int32)
        level_emit = jnp.zeros(C.max_levels, jnp.int32)
        buck_of = jnp.zeros((B, CAP), jnp.int32)
        meta = (parent, pcol, ratio_in, reach, is_term, term_value, level_of,
                valid, row_of, klo_of, khi_of, buck_of, legal_of, branch_of,
                n_slots, dropped, fallbacks, pruned, level_live, level_emit)
        root_work = (roots, jnp.arange(B, dtype=jnp.int32), ~term0,
                     jnp.zeros(B, jnp.int32))

        if C.level_caps is not None:
            # segmented: unrolled level passes, static per-level widths
            work = root_work
            for lvl in range(C.max_levels):
                meta, work = level_pass(
                    lvl, jax.random.fold_in(ekey, 100 + lvl), meta, work,
                    C.level_caps[lvl],
                )
        else:
            def pad_root(rw):
                """Place the B roots at worklist positions 0..B-1 by
                concatenating dead lanes (no scatter: XLA's TPU emitter
                chokes on fused multi-operand iota-index scatters)."""
                assert B <= W, "work_cap must cover the root level"
                dead = dead_work(W - B)
                cat = lambda a, b: jnp.concatenate([a, b], axis=0)
                return (jax.tree.map(cat, rw[0], dead[0]),
                        cat(rw[1], dead[1]), cat(rw[2], dead[2]),
                        cat(rw[3], dead[3]))

            def level_cond(carry):
                lvl, _, work = carry
                return (lvl < C.max_levels) & work[2].any()

            def level_wbody(carry):
                lvl, meta, work = carry
                meta, work = level_pass(
                    lvl, jax.random.fold_in(ekey, 100 + lvl), meta, work, W
                )
                return lvl + 1, meta, work

            _, meta, work = jax.lax.while_loop(
                level_cond, level_wbody,
                (jnp.int32(0), meta, pad_root(root_work)),
            )

        (parent, pcol, ratio_in, reach, is_term, term_value, level_of,
         valid, row_of, klo_of, khi_of, buck_of, legal_of, branch_of,
         n_slots, dropped, fallbacks, pruned, level_live, level_emit) = meta
        work_states, work_tree, work_valid, work_slot = work
        w_tail = work_tree.shape[0]
        SPILLW = B * CAP

        # --- tail: deep lines become on-policy sampled values -------------
        st, _ = roll(
            work_states, read, walker, jax.random.fold_in(ekey, 999),
            include_walker=True, steps=C.tail_steps,
        )
        ttail = G.turn_of(st)
        vtail = settle_fn(st)[:, walker]
        unfinished = work_valid & (ttail != G.TURN_TERMINAL)
        vtail = jnp.where(unfinished, 0.0, vtail)
        slf = jnp.where(work_valid, work_tree * CAP + work_slot, SPILLW)
        is_term = flat_scat(is_term, slf, jnp.ones(w_tail, bool), SPILLW)
        term_value = flat_scat(term_value, slf, vtail, SPILLW)

        # --- upward value pass --------------------------------------------
        rows_b = jnp.arange(B)[:, None]
        v = jnp.where(is_term, term_value, 0.0)  # [B, CAP]
        edge_val = jnp.zeros((B, CAP, N_COLS), jnp.float32)
        pi_all = regret_matching_rows(read.regret[row_of], legal_of)

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

        # --- per-slot deltas → table scatter ------------------------------
        upd = valid & ~is_term
        rdelta_slot = jnp.where(
            upd[:, :, None] & branch_of,
            reach[:, :, None] * (edge_val - v[:, :, None]), 0.0,
        )
        # per-EDGE payoff samples: the sampled child value v(a) of every
        # branched action, UNWEIGHTED by the path reach. Documented
        # deviation from the reference, which Welford-averages the
        # reach-weighted INFOSET EV V(I) replicated across edges
        # (solver.rs:170-181 + nash.rs:46-49 "all of which have the same
        # EV!") — with identical per-edge values its own AIVAT action
        # correction is identically zero (correction.rs test
        # `uniform_ev_yields_zero_correction_for_any_action`), and we
        # measured reduction 0.94 on 10k self-play hands with those
        # semantics. Control variates need CORRELATION, not
        # unbiasedness, so the reach factor (heavy-tailed π/q products)
        # is deliberately dropped from the baseline samples.
        pdelta_cols = jnp.where(
            upd[:, :, None] & branch_of, edge_val, 0.0,
        )

        T = read.capacity
        rows_flat = jnp.where(upd, row_of, T).reshape(-1)
        # one fused multi-column scatter-add builds every per-row
        # aggregate (regret deltas, touched/legal occurrence counts,
        # per-edge payoff deltas, visit count) — separate [T]-sized
        # scatters cost ~100ms/epoch each at 2^21 rows
        payload = jnp.concatenate(
            [
                rdelta_slot.reshape(-1, N_COLS),
                (upd[:, :, None] & branch_of).reshape(-1, N_COLS).astype(
                    jnp.float32),
                (upd[:, :, None] & legal_of).reshape(-1, N_COLS).astype(
                    jnp.float32),
                pdelta_cols.reshape(-1, N_COLS),
                upd.reshape(-1).astype(jnp.float32)[:, None],
            ],
            axis=1,
        )                                            # [S, 4*9+1]
        agg = jnp.zeros((T + 1, 4 * N_COLS + 1), jnp.float32).at[
            rows_flat
        ].add(payload)[:T]

        # --- multi-chip: all-reduce the per-shard deltas over ICI ----------
        if axis_name is not None:
            # occurrence columns are counts, so a single psum covers the
            # boolean ORs too (count > 0)
            if shard_rows:
                # sharded learner: each device receives only ITS row
                # block's delta sum (reduce_scatter rides ICI at 1/D the
                # all-reduce volume) and applies schedules locally below
                agg = jax.lax.psum_scatter(
                    agg, axis_name, scatter_dimension=0, tiled=True)
            else:
                agg = jax.lax.psum(agg, axis_name)
            # every replica must apply every shard's touched rows or the
            # replicated table diverges
            rows_flat = jax.lax.all_gather(rows_flat, axis_name).reshape(-1)
            upd_bc = jax.lax.all_gather(upd.reshape(-1), axis_name).reshape(-1)
            klo_bc = jax.lax.all_gather(klo_of.reshape(-1), axis_name).reshape(-1)
            khi_bc = jax.lax.all_gather(khi_of.reshape(-1), axis_name).reshape(-1)
            buck_bc = jax.lax.all_gather(
                buck_of.reshape(-1), axis_name).reshape(-1)
            cm_of = (legal_of.astype(jnp.int32)
                     * (1 << jnp.arange(N_COLS))).sum(-1)
            cm_bc = jax.lax.all_gather(
                cm_of.reshape(-1), axis_name).reshape(-1)
            if shard_rows:
                # localize the global touched-row list to this owner's
                # block; foreign rows map to the spill index (= block)
                block = table.capacity
                lo = jax.lax.axis_index(axis_name) * block
                inblk = (rows_flat >= lo) & (rows_flat < lo + block)
                rows_flat = jnp.where(inblk, rows_flat - lo, block)
                T = block
        else:
            upd_bc = upd.reshape(-1)
            klo_bc = klo_of.reshape(-1)
            khi_bc = khi_of.reshape(-1)
            buck_bc = buck_of.reshape(-1)
            cm_bc = (legal_of.astype(jnp.int32)
                     * (1 << jnp.arange(N_COLS))).sum(-1).reshape(-1)

        # --- apply schedules on the touched-row SUBSET --------------------
        # the epoch touches ≤ B*CAP rows; gather-modify-scatter over that
        # subset keeps table-update traffic independent of table size
        # (whole-table where() applies cost ~400MB/step at 2^21 rows).
        # Duplicate subset indices write identical values, so .set is safe.
        rows = jnp.minimum(rows_flat, T - 1)
        live = rows_flat < T
        sub = agg[rows]                              # one subset gather
        sub_rd = sub[:, :N_COLS]
        sub_tc = (sub[:, N_COLS:2 * N_COLS] > 0) & live[:, None]
        sub_legal = sub[:, 2 * N_COLS:3 * N_COLS] > 0
        sub_pd = sub[:, 3 * N_COLS:4 * N_COLS]       # per-edge value sums
        sub_tc_n = sub[:, N_COLS:2 * N_COLS]         # per-edge sample counts
        sub_counts = sub[:, 4 * N_COLS]              # f32 occurrence count
        sub_oc = (sub_counts > 0) & live
        sub_regret = table.regret[rows]
        sub_pi = regret_matching_rows(sub_regret, sub_legal)

        new_regret = jnp.where(
            sub_tc,
            regret_schedule.gain(sub_regret, sub_rd, t,
                                 training_hp.regret_min),
            sub_regret,
        )
        if C.warmstart_bias is not None:
            # seed fresh rows' legal columns with the warmstart bias
            # (ref: bias.rs — the reference seeds at infoset creation; here
            # the seed lands with the row's first update, so it shapes the
            # policy from the row's second visit onward). Duplicate subset
            # indices write identical values, preserving the .set contract.
            BIAS = jnp.asarray(
                C.warmstart_bias.column_vector(N_COLS), jnp.float32)
            fresh = (table.key_lo[rows] == 0) & (table.key_hi[rows] == 0) \
                & live & sub_oc & upd_bc
            new_regret = new_regret + jnp.where(
                fresh[:, None] & sub_legal, BIAS[None, :], 0.0)
        regret = table.regret.at[rows].set(
            jnp.where(live[:, None], new_regret, sub_regret)
        )
        occ_edge = sub_oc[:, None] & sub_legal
        sub_weight = table.weight[rows]
        new_weight = jnp.where(
            occ_edge,
            weight_schedule.learn(
                sub_weight, sub_pi * sub_counts[:, None].astype(jnp.float32), t
            ),
            sub_weight,
        )
        weight = table.weight.at[rows].set(
            jnp.where(live[:, None], new_weight, sub_weight)
        )
        sub_payoff = table.payoff[rows]
        sub_visits = table.visits[rows]
        # Welford running mean of PER-EDGE value v̂(a) — each branched
        # column averages its own reach-weighted child values (the
        # reference's eval_policy (edge, weight, value) semantics);
        # untouched columns keep their mean
        new_payoff = jnp.where(
            sub_tc,
            sub_payoff
            + (sub_pd / jnp.maximum(sub_tc_n, 1.0) - sub_payoff)
            / (sub_visits + 1)[:, None].astype(jnp.float32),
            sub_payoff,
        )
        payoff = table.payoff.at[rows].set(
            jnp.where(live[:, None], new_payoff, sub_payoff)
        )
        visits = table.visits.at[rows].set(
            jnp.where(live & sub_oc,
                      sub_visits + sub_counts.astype(jnp.int32), sub_visits)
        )

        # persist key words: claim empty slots / refresh matching ones, but
        # never evict a resident key (a ladder-exhausted fallback writer
        # would otherwise orphan the resident's accumulated regret)
        cur_lo = table.key_lo[rows]
        cur_hi = table.key_hi[rows]
        claimable = ((cur_lo == 0) & (cur_hi == 0)) | (
            (cur_lo == klo_bc) & (cur_hi == khi_bc)
        )
        wr = live & sub_oc & upd_bc & claimable
        key_lo = table.key_lo.at[rows].set(jnp.where(wr, klo_bc, cur_lo))
        key_hi = table.key_hi.at[rows].set(jnp.where(wr, khi_bc, cur_hi))
        # sidecar words travel with the key claim (bucket stored +1 so 0
        # stays "unknown" for legacy checkpoints) — these give the
        # analysis endpoints exact street/grid attribution, the piece the
        # reference keeps in its Postgres row key
        bucket = table.bucket.at[rows].set(
            jnp.where(wr, buck_bc + 1, table.bucket[rows]))
        choices = table.choices.at[rows].set(
            jnp.where(wr, cm_bc, table.choices[rows]))

        new_table = InfoTable(
            regret=regret, weight=weight, payoff=payoff, visits=visits,
            key_lo=key_lo, key_hi=key_hi, bucket=bucket, choices=choices,
            epoch=t + 1,
        )
        metrics = {
            "nodes": valid.sum(),
            "terminal_frac": (valid & is_term).sum() / jnp.maximum(valid.sum(), 1),
            "dropped": dropped,
            "fallbacks": fallbacks,
            # regret-based pruning telemetry (ref: pruning.rs:37-60)
            "pruned_branches": pruned,
            "floor_rows": (new_table.regret
                           <= training_hp.regret_min * 0.999).sum(),
            "unfinished_tail": unfinished.sum(),
            "touched_rows": (agg[:, 4 * N_COLS] > 0).sum(),
            # frontier width entering each level: the data that sizes
            # segmented work_cap (narrow early/late levels need not pay
            # the peak level's lane count)
            "level_live": level_live,
            "level_emit": level_emit,
            "tail_live": work_valid.sum(),
        }
        if axis_name is not None:
            # replicated mode: every device computes identical touched_rows
            # (don't double-count); sharded mode: each owner counts its own
            # block, so the total IS the psum
            metrics = {
                k: (jax.lax.psum(v, axis_name)
                    if (k != "touched_rows" or shard_rows) else v)
                for k, v in metrics.items()
            }
        return new_table, metrics

    btree = bucket_fn.tree() if hasattr(bucket_fn, "tree") else None

    # under shard_map the caller owns jit; single-chip gets jitted directly.
    # Either way lookup tables must thread through as ARGUMENTS: a step
    # that closes over them embeds them as HLO constants, and the
    # exhaustive turn table (~400 MB) made the remote compile service
    # reject the program with HTTP 413 (CLAUDE.md round-1). The shard_map
    # path used to skip the wrapper — the exact trap, VERDICT item 4.
    if axis_name is not None:
        if btree is None:
            return step

        def step_rebound(table, key, btree_arg):
            # rebind to the traced arrays for the duration of tracing; the
            # compiled program then reads the tables from its arguments
            _bound[0] = bucket_fn.bind(btree_arg)
            try:
                return step(table, key)
            finally:
                _bound[0] = bucket_fn

        step_rebound.btree = btree       # caller ships this as an operand
        step_rebound.takes_tables = True
        return step_rebound
    if btree is None:
        return jax.jit(step)

    def step_with_tables(table, key, btree):
        _bound[0] = bucket_fn.bind(btree)
        try:
            return step(table, key)
        finally:
            _bound[0] = bucket_fn

    jitted = jax.jit(step_with_tables)
    fn = lambda table, key: jitted(table, key, btree)
    # introspection hooks (scripts/utilization.py cost analysis):
    # fn.jitted.lower(table, key, *fn.extra_args).compile().cost_analysis()
    fn.jitted = jitted
    fn.extra_args = (btree,)
    return fn


def make_parity_steps(bucket_fn, regret_schedule, weight_schedule, sampling,
                      config: TrainerConfig = TrainerConfig(),
                      margin: float = 1.4, profiles=None, **kw):
    """(step_even, step_odd): walker-parity-specialized epoch steps.

    The caller dispatches on ``epoch % 2`` (the walker seat). Even-walker
    trees are ~3x narrower at peak, so their step compiles with the
    narrow cap schedule and runs proportionally faster; results are
    identical to a single step with each parity's caps.

    ``margin``: headroom over the measured emit profile. The profile is
    measured on a FRESH table; trees widen as the strategy sharpens
    (measured: marginal drop rate climbing 0.1% → 2% over the first 400
    epochs at margin 1.4), so production runs want 1.8-2.0 — or adaptive
    caps (forge.FastSession re-measures level_emit in-run and recompiles
    with widened caps when marginal drops exceed its threshold).

    ``profiles``: optional ``(even_profile, odd_profile)`` emit/tree
    tuples overriding the module constants — the hook the adaptive-cap
    recompile path uses to widen from OBSERVED in-run emission.
    """
    even_prof, odd_prof = profiles or (EMIT_PROFILE_EVEN, EMIT_PROFILE)
    even = dataclasses.replace(
        config,
        level_caps=segmented_caps(config.batch, config.max_levels,
                                  margin=margin, profile=even_prof),
    )
    odd = dataclasses.replace(
        config,
        level_caps=config.level_caps
        or segmented_caps(config.batch, config.max_levels, margin=margin,
                          profile=odd_prof),
    )
    return (
        make_nlhe_step(bucket_fn, regret_schedule, weight_schedule,
                       sampling, even, **kw),
        make_nlhe_step(bucket_fn, regret_schedule, weight_schedule,
                       sampling, odd, **kw),
    )


# legacy helpers kept for the subgame resolver (dense per-tree layout)
def _scat(arr, idx, val):
    """Per-tree scatter: arr [B, CAP(+1 spill)...], idx [B, LC] (CAP=drop)."""
    B, cap = arr.shape[0], arr.shape[1]
    widened = jnp.concatenate(
        [arr, jnp.zeros((B, 1) + arr.shape[2:], arr.dtype)], axis=1
    )
    out = widened.at[jnp.arange(B)[:, None], idx].set(val)
    return out[:, :cap]


def _scat_state(states, idx, new_states, B, LC):
    """Scatter full TableStates from level-flat [B*LC] into [B*LC] slots."""

    def one(a_old, a_new):
        a_old = a_old.reshape((B, LC) + a_old.shape[1:])
        a_new = a_new.reshape((B, LC) + a_new.shape[1:])
        widened = jnp.concatenate(
            [a_old, jnp.zeros((B, 1) + a_old.shape[2:], a_old.dtype)], axis=1
        )
        out = widened.at[jnp.arange(B)[:, None], idx].set(a_new)
        return out[:, :LC].reshape((B * LC,) + a_old.shape[2:])

    return jax.tree.map(one, states, new_states)
