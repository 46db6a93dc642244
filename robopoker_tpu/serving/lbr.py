"""Local Best Response (LBR): an exploitability lower bound for the
trained NLHE blueprint.

Beyond-reference evaluation: the reference measures its blueprint
empirically (slumbot bb/100, AIVAT, litmus — ref: crates/spar, arena,
litmus); LBR (Lisy & Bowling 2017, "Eqilibrium Approximation Quality of
Current No-Limit Poker Bots") gives an *offline* lower bound on
exploitability without an external opponent, so the convergence of the
blueprint can be tracked as a curve over training epochs.

The LBR agent knows the blueprint's strategy exactly. It tracks the
blueprint's range — a posterior over all 1,326 holes, updated by the
blueprint's own averaged policy at each of its actions and masked by
revealed cards — and at its own turns picks fold/call(/check) by a
call-down expected value:

    wp        = range-weighted showdown equity of LBR's hand (MC runouts)
    EV(fold)  = 0
    EV(call)  = wp * (pot + asked) - asked

Everything runs in lockstep on device: a batch of hands advances one
action per iteration of a bounded ``fori_loop``; the per-hole policy
table ([N, 1326, 9]) and the equity rollouts ([N, 1326, R]) are batched
tensor ops, mirroring how the posterior replay batches villain holes
(robopoker_tpu/subgame/posterior.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..deuce.cards import suit_masks
from ..deuce.evaluator import strength_from_masks
from ..deuce.observation import ALL_POCKETS
from ..kicker import MENU_PLURIBUS, edges as E, game as G
from ..mccfr.engine import averaged
from ..nlhe.table import InfoTable, N_COLS, make_key, probe_rows

MAX_STEPS = 24
_N_HOLES = 1326

# card-pair -> ALL_POCKETS row (host constant; -1 off-diagonal unused)
_HOLE_INDEX = np.full((52, 52), -1, np.int32)
for _i, (_a, _b) in enumerate(ALL_POCKETS):
    _HOLE_INDEX[_a, _b] = _i
    _HOLE_INDEX[_b, _a] = _i


def _collision_mask(board: jnp.ndarray, lbr_hole: jnp.ndarray) -> jnp.ndarray:
    """[N, 1326] True where the candidate hole avoids all revealed cards."""
    opp = jnp.asarray(ALL_POCKETS)                              # [1326, 2]
    seen = jnp.concatenate([board, lbr_hole], axis=1)           # [N, 7]
    hit = (opp[None, :, :, None] == seen[:, None, None, :]).any(axis=(2, 3))
    return ~hit


def _hole_scores(lbr_hole, board, key, n_rollouts: int):
    """Per-hole MC showdown scores of LBR's hand: ``[N, 1326]`` win
    probability vs each candidate villain hole, so any reweighted range
    (posterior, continue-vs-bet) reuses one set of runouts.

    Runouts complete the board from the deck minus (board ∪ LBR hole);
    (hole, runout) collisions are masked and the weights renormalized.
    """
    N = board.shape[0]
    n_dealt = (board >= 0).sum(axis=1)                          # [N]
    u = jax.random.uniform(key, (N, n_rollouts, 52))
    seen = jnp.concatenate([board, lbr_hole], axis=1)           # [N, 7]
    excl = (jnp.arange(52)[None, None, :] == seen[:, :, None]).any(1)
    u = jnp.where(excl[:, None, :], 2.0, u)
    draw = jnp.argsort(u, axis=-1)[:, :, :5].astype(jnp.int32)  # [N, R, 5]

    pos = jnp.arange(G.N_BOARD)
    need = jnp.clip(pos[None, :] - n_dealt[:, None], 0, 4)      # [N, 5]
    filled = jnp.take_along_axis(
        draw, need[:, None, :], axis=2
    )                                                           # [N, R, 5]
    full = jnp.where(
        (board >= 0)[:, None, :], board[:, None, :], filled
    )                                                           # [N, R, 5]

    hero = jnp.concatenate(
        [jnp.broadcast_to(lbr_hole[:, None, :], (N, n_rollouts, 2)), full],
        axis=2,
    )
    hero_code = strength_from_masks(suit_masks(hero))           # [N, R]

    opp = jnp.asarray(ALL_POCKETS)                              # [1326, 2]
    opp_cards = jnp.concatenate(
        [
            jnp.broadcast_to(opp[None, :, None, :],
                             (N, _N_HOLES, n_rollouts, 2)),
            jnp.broadcast_to(full[:, None, :, :],
                             (N, _N_HOLES, n_rollouts, 5)),
        ],
        axis=3,
    )
    opp_code = strength_from_masks(suit_masks(opp_cards))       # [N, 1326, R]

    # (hole, runout) disjointness: the hole must miss the drawn cards
    undealt = (board < 0)[:, None, :]                           # [N, 1, 5]
    drawn_used = jnp.where(undealt, full, -1)                   # [N, R, 5]
    clash = (
        opp[None, :, :, None, None] == drawn_used[:, None, None, :, :]
    ).any(axis=(2, 4))                                          # [N, 1326, R]
    ok = (~clash).astype(jnp.float32)
    score = jnp.where(
        hero_code[:, None, :] > opp_code, 1.0,
        jnp.where(hero_code[:, None, :] == opp_code, 0.5, 0.0),
    )
    n_ok = ok.sum(axis=2)                                       # [N, 1326]
    s = (ok * score).sum(axis=2) / jnp.maximum(n_ok, 1.0)
    return s, (n_ok > 0).astype(jnp.float32)


def _wp(weights, scores, svalid):
    w = weights * svalid
    return (w * scores).sum(1) / jnp.maximum(w.sum(1), 1e-12)


def _range_equity(lbr_hole, board, range_, key, n_rollouts: int):
    """Range-weighted MC equity (kept for tests/direct queries)."""
    s, sv = _hole_scores(lbr_hole, board, key, n_rollouts)
    return _wp(range_, s, sv)


def make_lbr_play(table: InfoTable, bucket_fn, batch: int = 64,
                  n_rollouts: int = 32, menu: np.ndarray | None = None,
                  max_steps: int = MAX_STEPS, mode: str = "fcpa",
                  aivat: bool = False):
    """Build the jitted per-batch LBR match: ``play(key, lbr_seat) ->
    (pnl [N] chips for the LBR seat, done [N])`` — or, with
    ``aivat=True``, ``(pnl, corrected_pnl, done)``.

    mode "fc" = fold/call only; "fcpa" also considers a pot-size raise
    and all-in, pricing each by the blueprint's fold response at the
    hypothetical child state (the paper's strongest standard config).

    ``aivat``: subtract AIVAT control variates from the LBR pnl
    (ref: crates/arena/src/aivat.rs — the reference applies these to
    external-opponent play exactly like this). Blueprint-action terms
    (E_σ[v̂] − v̂(taken), from the blueprint's actual infoset) and
    turn/river chance terms are zero-mean under the blueprint's own
    sampling / the uniform deal REGARDLESS of the hero policy, so the
    corrected estimator stays an unbiased exploitability bound; hero
    (LBR) action terms are NOT applied — LBR does not follow σ, so they
    would not be zero-mean (VERDICT r2 next-round #4)."""
    MENU = jnp.asarray(MENU_PLURIBUS if menu is None else menu)
    N = batch
    opp_holes = jnp.asarray(ALL_POCKETS)
    hole_index = jnp.asarray(_HOLE_INDEX)

    # trace-time indirection (same trap as the trainer): the blueprint
    # table and any LookupBucket artifacts must thread through jit as
    # ARGUMENTS — closing over them bakes them into the HLO (the
    # exhaustive river tables made the LBR program a 4.5 GB proto)
    _tbl = [table]
    _bound = [bucket_fn]

    def hole_policies(states):
        """Blueprint averaged policy for every candidate hole: [N,1326,9]."""
        board = states.board.astype(jnp.int32)
        legal = G.legal_cols(states, MENU)                      # [N, 9]
        sub = G.packed_subgame(states)                          # [N, 2]
        cmask = (legal * (1 << jnp.arange(N_COLS))).sum(1).astype(jnp.int32)
        hh = jnp.broadcast_to(
            opp_holes[None], (N, _N_HOLES, 2)
        ).reshape(N * _N_HOLES, 2)
        bb = jnp.repeat(board, _N_HOLES, axis=0)
        ss = jnp.repeat(states.street, _N_HOLES, axis=0)
        bucket = _bound[0](hh, bb, ss)
        klo, khi = make_key(
            bucket,
            jnp.repeat(sub, _N_HOLES, axis=0),
            jnp.repeat(cmask, _N_HOLES, axis=0),
        )
        row, _ = probe_rows(_tbl[0].key_lo, _tbl[0].key_hi, klo, khi)
        pol = averaged(
            _tbl[0].weight[row], jnp.repeat(legal, _N_HOLES, axis=0)
        )
        return pol.reshape(N, _N_HOLES, N_COLS), legal

    def actor_rows(states):
        """(σ, v̂, legal) at each lane's ACTUAL actor hole — the AIVAT
        baseline rows (same shape as serving/aivat.rows_of)."""
        idx = G.actor_idx(states)
        hole = jnp.take_along_axis(
            states.hole, idx[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        bucket = _bound[0](hole.astype(jnp.int32),
                           states.board.astype(jnp.int32), states.street)
        legal = G.legal_cols(states, MENU)
        cmask = (legal * (1 << jnp.arange(N_COLS))).sum(1).astype(jnp.int32)
        klo, khi = make_key(bucket, G.packed_subgame(states), cmask)
        row, _ = probe_rows(_tbl[0].key_lo, _tbl[0].key_hi, klo, khi)
        return (averaged(_tbl[0].weight[row], legal),
                _tbl[0].payoff[row], legal)

    def play_body(key: jnp.ndarray, lbr_seat: jnp.ndarray):
        states = G.root(jax.random.fold_in(key, 1), N)
        lbr_hole = jnp.take_along_axis(
            states.hole.astype(jnp.int32),
            jnp.broadcast_to(lbr_seat[None, None, None], (N, 1, 2)).astype(
                jnp.int32
            ),
            axis=1,
        )[:, 0]                                                 # [N, 2]
        bp_hole = jnp.take_along_axis(
            states.hole.astype(jnp.int32),
            jnp.broadcast_to(
                (1 - lbr_seat)[None, None, None], (N, 1, 2)
            ).astype(jnp.int32),
            axis=1,
        )[:, 0]
        bp_idx = hole_index[bp_hole[:, 0], bp_hole[:, 1]]       # [N]
        range_ = _collision_mask(
            states.board.astype(jnp.int32), lbr_hole
        ).astype(jnp.float32)

        def body(i, carry):
            states, range_, corr = carry
            k = jax.random.fold_in(key, 100 + i)
            if aivat:
                # turn/river chance correction, computed PRE-deal: the
                # baseline over all candidate next-cards vs the dealt one
                # (flop deals skipped like the reference, aivat.rs:151-153)
                from ..subgame.posterior import force_deal

                t0 = G.turn_of(states)
                nb = (states.board >= 0).sum(axis=1)
                is_single = (t0 == G.TURN_CHANCE) & ((nb == 3) | (nb == 4))
                cand = jnp.repeat(jnp.arange(52, dtype=jnp.int64), N)
                rep = lambda a: jnp.tile(a, (52,) + (1,) * (a.ndim - 1))
                wide = jax.tree.map(rep, states)
                dealv = jnp.full((52 * N, 3), -1, jnp.int64
                                 ).at[:, 0].set(cand)
                forced = force_deal(wide, dealv, jnp.tile(is_single, (52,)))
                sig_f, pay_f, leg_f = actor_rows(forced)
                base = (sig_f * pay_f * leg_f).sum(1).reshape(52, N)
                seen = jnp.concatenate(
                    [states.hole.reshape(N, 4), states.board], axis=1)
                unseen = ~(jnp.arange(52)[:, None, None]
                           == seen[None, :, :]).any(-1)        # [52, N]
                mean_base = (jnp.where(unseen, base, 0.0).sum(0)
                             / jnp.maximum(unseen.sum(0), 1))
                pre_board = states.board
            states = G.deal_board(states, k)
            if aivat:
                dealt = jnp.where(
                    (states.board >= 0) & (pre_board < 0), states.board, -1
                ).max(axis=1)
                dealt_base = base[jnp.clip(dealt, 0), jnp.arange(N)]
                sign = jnp.where(G.turn_of(states) == lbr_seat, 1.0, -1.0)
                corr = corr + jnp.where(
                    is_single, sign * (mean_base - dealt_base), 0.0)
            board = states.board.astype(jnp.int32)
            range_ = range_ * _collision_mask(board, lbr_hole)

            t = G.turn_of(states)
            acting = t <= G.TURN_P1
            is_lbr = acting & (t == lbr_seat)
            is_bp = acting & (t == (1 - lbr_seat))

            polh, legal = hole_policies(states)
            bp_dist = jnp.take_along_axis(
                polh, jnp.clip(bp_idx, 0)[:, None, None], axis=1
            )[:, 0]                                             # [N, 9]
            logits = jnp.where(
                legal & (bp_dist > 0), jnp.log(jnp.maximum(bp_dist, 1e-20)),
                -jnp.inf,
            )
            safe = jnp.where(
                jnp.isfinite(logits).any(1, keepdims=True), logits,
                jnp.where(legal, 0.0, -jnp.inf),
            )
            bp_col = jax.random.categorical(
                jax.random.fold_in(k, 7), safe, axis=-1
            )

            scores, svalid = _hole_scores(lbr_hole, board,
                                          jax.random.fold_in(k, 9),
                                          n_rollouts)
            wp = _wp(range_, scores, svalid)
            pot = states.pot.astype(jnp.float32)
            asked = G.to_call(states).astype(jnp.float32)
            # EV relative to folding now; states.pot already holds both
            # players' money including the villain's outstanding bet
            ev_call = wp * pot - (1.0 - wp) * asked
            want_call = jnp.where(
                legal[:, E.COL_CALL], E.COL_CALL, E.COL_SHOVE
            )  # calling an all-in is the shove column (tc >= ts)
            lbr_col = jnp.where(
                asked > 0,
                jnp.where(ev_call > 0, want_call, E.COL_FOLD),
                E.COL_CHECK,
            )
            ev_base = jnp.where(asked > 0, jnp.maximum(ev_call, 0.0),
                                wp * pot)

            if mode == "fcpa":
                # candidate bets: the menu raise slot nearest a pot-size
                # bet, and all-in. Both are abstraction actions, so the
                # blueprint's response needs no translation.
                rc = G.raise_chips(states, MENU).astype(jnp.float32)
                raise_legal = legal[:, E.COL_RAISE0:]
                gap = jnp.where(
                    raise_legal,
                    jnp.abs(rc - (pot + 2.0 * asked)[:, None]), jnp.inf,
                )
                pot_slot = jnp.argmin(gap, axis=1)
                pot_col = (E.COL_RAISE0 + pot_slot).astype(jnp.int32)
                pot_chips = jnp.take_along_axis(
                    rc, pot_slot[:, None], axis=1
                )[:, 0]
                shove_chips = G.to_shove(states).astype(jnp.float32)

                def bet_ev(col_vec, chips, col_legal):
                    child = G.apply_cols(states, col_vec, MENU, acting)
                    polh_c, _ = hole_policies(child)
                    pf = polh_c[:, :, E.COL_FOLD]           # [N, 1326]
                    den = jnp.maximum(range_.sum(1), 1e-12)
                    fp = (range_ * pf).sum(1) / den
                    wp_b = _wp(range_ * (1.0 - pf), scores, svalid)
                    b = jnp.maximum(chips - asked, 0.0)
                    ev = fp * pot + (1.0 - fp) * (
                        wp_b * (pot + b) - (1.0 - wp_b) * (asked + b)
                    )
                    return jnp.where(col_legal, ev, -jnp.inf)

                ev_pot = bet_ev(pot_col, pot_chips, raise_legal.any(1))
                ev_shove = bet_ev(
                    jnp.full(N, E.COL_SHOVE, jnp.int32), shove_chips,
                    legal[:, E.COL_SHOVE],
                )
                evs = jnp.stack([ev_base, ev_pot, ev_shove], axis=1)
                pick = jnp.argmax(evs, axis=1)
                lbr_col = jnp.where(
                    pick == 1, pot_col,
                    jnp.where(pick == 2, E.COL_SHOVE, lbr_col),
                )

            col = jnp.where(is_lbr, lbr_col, bp_col).astype(jnp.int32)
            if aivat:
                # blueprint-action control variate from ITS actual
                # infoset: E_σ[v̂] − v̂(taken), negated for the hero
                sig_a, pay_a, leg_a = actor_rows(states)
                ev_a = (sig_a * pay_a * leg_a).sum(1)
                taken = jnp.take_along_axis(
                    pay_a, col[:, None], axis=1)[:, 0]
                corr = corr - jnp.where(is_bp, ev_a - taken, 0.0)
            # blueprint action updates its range by its own policy mass
            picked = jnp.take_along_axis(polh, col[:, None, None], axis=2)[
                :, :, 0
            ]                                                   # [N, 1326]
            range_ = jnp.where(is_bp[:, None], range_ * picked, range_)
            states = G.apply_cols(states, col, MENU, acting)
            return states, range_, corr

        states, range_, corr = jax.lax.fori_loop(
            0, max_steps, body, (states, range_, jnp.zeros(N, jnp.float32))
        )
        states = G.deal_board(states, jax.random.fold_in(key, 999))
        done = G.turn_of(states) == G.TURN_TERMINAL
        pnl = G.settle(states)
        lbr_pnl = jnp.take_along_axis(
            pnl, lbr_seat[None, None].astype(jnp.int32).repeat(N, 0), axis=1
        )[:, 0]
        lbr_pnl = jnp.where(done, lbr_pnl, 0.0)
        if aivat:
            return lbr_pnl, lbr_pnl + corr, done
        return lbr_pnl, done

    btree = bucket_fn.tree() if hasattr(bucket_fn, "tree") else None

    def play_with_args(key, lbr_seat, tbl, bt):
        _tbl[0] = tbl
        if bt is not None:
            _bound[0] = bucket_fn.bind(bt)
        try:
            return play_body(key, lbr_seat)
        finally:
            _tbl[0] = table
            _bound[0] = bucket_fn

    jitted = jax.jit(play_with_args)
    fn = lambda key, lbr_seat: jitted(key, lbr_seat, table, btree)
    # introspection hook: call ``fn.jitted(key, seat, other_table,
    # *fn.extra_args)`` to evaluate a DIFFERENT checkpoint through the
    # same compiled program (the table threads through as an argument,
    # so curve runners pay one compile for the whole snapshot history)
    fn.jitted = jitted
    fn.extra_args = (btree,)
    return fn


def lbr_eval(table: InfoTable, bucket_fn, n_hands: int = 2048,
             batch: int = 64, n_rollouts: int = 32, seed: int = 0,
             menu: np.ndarray | None = None, mode: str = "fcpa",
             aivat: bool = False) -> dict:
    """Play `n_hands` (half from each seat) and report the LBR winrate —
    a lower bound on blueprint exploitability — in mbb/hand.

    ``aivat=True`` additionally reports the AIVAT-corrected estimate
    (same mean in expectation, far lower variance): use
    ``lbr_mbb_per_hand_aivat`` ± ``stderr_mbb_aivat`` for checkpoint
    ordering; ``aivat_reduction`` is the measured variance ratio."""
    play = make_lbr_play(table, bucket_fn, batch=batch,
                         n_rollouts=n_rollouts, menu=menu, mode=mode,
                         aivat=aivat)
    key = jax.random.PRNGKey(seed)
    chips, cchips, finished = [], [], 0
    n_batches = max(1, n_hands // batch)
    for b in range(n_batches):
        out = play(jax.random.fold_in(key, b), jnp.int32(b % 2))
        pnl, done = out[0], out[-1]
        pnl = np.asarray(pnl)
        done = np.asarray(done)
        chips.append(pnl[done])
        if aivat:
            cchips.append(np.asarray(out[1])[done])
        finished += int(done.sum())
    chips = np.concatenate(chips) if chips else np.zeros(0)
    # B_BLIND = 2 chips = 1 big blind
    mbb = chips / 2.0 * 1000.0
    n = max(len(mbb), 1)
    res = {
        "mode": mode,
        "hands": int(len(mbb)),
        "unfinished": int(n_batches * batch - finished),
        "lbr_mbb_per_hand": float(mbb.mean()) if len(mbb) else 0.0,
        "stderr_mbb": float(mbb.std(ddof=1) / np.sqrt(n)) if len(mbb) > 1
        else 0.0,
    }
    if aivat:
        cm = np.concatenate(cchips) / 2.0 * 1000.0 if cchips else np.zeros(0)
        # fitted control-variate coefficient, split-sample (see
        # aivat.selfplay_delta) — α=1 only helps with strong baselines
        C = cm - mbb
        n2 = len(cm)
        if n2 > 3 and C.var(ddof=1) > 0:
            h = n2 // 2
            out = np.empty_like(mbb)
            for (fit, app) in ((slice(0, h), slice(h, None)),
                               (slice(h, None), slice(0, h))):
                a = -np.cov(mbb[fit], C[fit])[0, 1] / C[fit].var(ddof=1)
                out[app] = mbb[app] + a * C[app]
            cm = out
        # unconditional publication guard: never emit an inflating
        # column (VERDICT r4 #5)
        from .aivat import guard_corrected

        cm, reduction, fell_back = guard_corrected(mbb, cm)
        res["lbr_mbb_per_hand_aivat"] = float(cm.mean()) if len(cm) else 0.0
        res["stderr_mbb_aivat"] = (
            float(cm.std(ddof=1) / np.sqrt(n)) if len(cm) > 1 else 0.0)
        res["aivat_reduction"] = reduction
        if fell_back:
            res["aivat_fallback"] = True
    return res
