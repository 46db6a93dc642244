"""Dense game-tree flattening for small (validation) games.

TPU-native counterpart of the reference's petgraph ``Tree``/``InfoSet``/
``TreeBuilder`` machinery (ref: crates/mccfr/src/state/tree.rs:28-127,
solver/builder.rs:42-160). The reference grows a pointer tree per sampled
rollout; on TPU we flatten the **entire** game tree once on the host into
static arrays (nodes sorted by depth, children padded to a fixed branch
width) and express each MCCFR iteration as masked level-synchronous array
passes under ``jit``. External sampling then becomes a per-node branch
mask instead of a grown subtree — same math, no pointers, no per-epoch
allocation.

The chance root replaces the reference's "random deal inside
``CfrGame::root()``" (ref: crates/kuhn/src/game.rs:115-123): sampling
uniformly at chance nodes is distribution-identical to dealing at root,
and the same dense tree doubles as the VanillaSampling exploitability
tree (ref: crates/mccfr/src/solver/solver.rs:327-346).

Scale note: this module targets games whose full tree fits in memory
(RPS/Kuhn/Leduc — the reference's validation crates, and subgame
re-solves). The NLHE blueprint path uses the batched trajectory engine
instead (robopoker_tpu/nlhe).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Hashable, Protocol

import numpy as np

CHANCE = -1
TERMINAL = -2


class SmallGame(Protocol):
    """Host-side game description, mirror of the reference's CfrGame traits
    (ref: crates/mccfr/src/state/game.rs:21-52, info.rs:21-43)."""

    n_players: int

    def root(self) -> Any: ...

    def turn(self, state) -> int:
        """0..P-1 to act, CHANCE, or TERMINAL."""
        ...

    def branches(self, state) -> list[tuple[Hashable, Any]]:
        """(edge label, child state) in canonical choice order.

        For decision states the order must equal the infoset's choice
        order (every state of one infoset yields the same edge labels).
        """
        ...

    def payoff(self, state, player: int) -> float: ...

    def info(self, state) -> Hashable:
        """Infoset key for decision states."""
        ...


@dataclasses.dataclass
class DenseTree:
    """Flattened full game tree + infoset registry (host numpy arrays)."""

    n_players: int
    n_nodes: int
    n_infosets: int
    max_branch: int          # tree fan-out width (includes chance deals)
    max_actions: int         # decision fan-out width (regret table columns)
    kind: np.ndarray         # [n] player 0..P-1, CHANCE, TERMINAL
    info: np.ndarray         # [n] infoset id (decision nodes), else -1
    child: np.ndarray        # [n, max_branch] child node id, -1 pad
    child_terminal: np.ndarray  # [n, max_branch] bool: child is terminal
    n_branch: np.ndarray     # [n]
    payoff: np.ndarray       # [n, P] terminal payoffs per player, 0 else
    parent: np.ndarray       # [n] parent node id, -1 for root
    parent_arm: np.ndarray   # [n] branch index within parent
    depth: np.ndarray        # [n]
    levels: list[np.ndarray]  # node ids per depth (BFS order ⇒ contiguous)
    info_keys: list[Hashable]          # id -> key
    info_index: dict[Hashable, int]    # key -> id
    info_n_actions: np.ndarray  # [I]
    info_player: np.ndarray     # [I]
    info_edges: list[tuple]     # id -> edge labels
    edge_labels: list[list]     # [n] node's branch edge labels (debug/host)
    chance_weight: np.ndarray | None = None  # [n, max_branch] non-uniform
    # chance distributions (subgame posteriors); None ⇒ uniform

    def legal_mask(self) -> np.ndarray:
        """[I, max_actions] bool."""
        m = np.zeros((self.n_infosets, self.max_actions), dtype=bool)
        for i, k in enumerate(self.info_n_actions):
            m[i, :k] = True
        return m


def build_tree(game: SmallGame) -> DenseTree:
    """Breadth-first flatten of the full game tree.

    Infoset ids are assigned by sorted key order so the id space (and the
    per-infoset RNG streams keyed on it) is independent of traversal
    order.
    """
    states: list[Any] = [game.root()]
    parents: list[int] = [-1]
    arms: list[int] = [0]
    depths: list[int] = [0]
    kids: list[list[int]] = [[]]
    labels: list[list] = [[]]
    head = 0
    while head < len(states):
        s = states[head]
        t = game.turn(s)
        if t != TERMINAL:
            for a, (edge, ns) in enumerate(game.branches(s)):
                states.append(ns)
                parents.append(head)
                arms.append(a)
                depths.append(depths[head] + 1)
                kids.append([])
                labels.append([])
                kids[head].append(len(states) - 1)
                labels[head].append(edge)
        head += 1

    n = len(states)
    kind = np.empty(n, dtype=np.int32)
    for i, s in enumerate(states):
        kind[i] = game.turn(s)

    # BFS order is already depth-sorted; record level slices
    depth = np.array(depths, dtype=np.int32)
    levels = [np.nonzero(depth == d)[0].astype(np.int32) for d in range(depth.max() + 1)]

    # infoset registry (sorted keys for stable ids)
    info_of_node: dict[int, Hashable] = {
        i: game.info(states[i]) for i in range(n) if kind[i] >= 0
    }
    keys = sorted(set(info_of_node.values()), key=repr)
    index = {k: i for i, k in enumerate(keys)}
    info = np.full(n, -1, dtype=np.int32)
    for i, k in info_of_node.items():
        info[i] = index[k]

    info_n_actions = np.zeros(len(keys), dtype=np.int32)
    info_player = np.full(len(keys), -1, dtype=np.int32)
    info_edges: list[tuple] = [()] * len(keys)
    for i in range(n):
        ii = info[i]
        if ii < 0:
            continue
        edges = tuple(labels[i])
        if info_n_actions[ii] == 0:
            info_n_actions[ii] = len(edges)
            info_player[ii] = kind[i]
            info_edges[ii] = edges
        else:
            assert info_edges[ii] == edges, (
                f"infoset {keys[ii]!r} has inconsistent choices {edges} vs {info_edges[ii]}"
            )
            assert info_player[ii] == kind[i]

    max_branch = max((len(k) for k in kids), default=1) or 1
    max_actions = int(info_n_actions.max()) if len(keys) else 1
    child = np.full((n, max_branch), -1, dtype=np.int32)
    child_terminal = np.zeros((n, max_branch), dtype=bool)
    n_branch = np.zeros(n, dtype=np.int32)
    for i, ks in enumerate(kids):
        n_branch[i] = len(ks)
        for a, c in enumerate(ks):
            child[i, a] = c
            child_terminal[i, a] = kind[c] == TERMINAL

    payoff = np.zeros((n, game.n_players), dtype=np.float32)
    for i, s in enumerate(states):
        if kind[i] == TERMINAL:
            for p in range(game.n_players):
                payoff[i, p] = game.payoff(s, p)

    return DenseTree(
        n_players=game.n_players,
        n_nodes=n,
        n_infosets=len(keys),
        max_branch=max_branch,
        max_actions=max_actions,
        kind=kind,
        info=info,
        child=child,
        child_terminal=child_terminal,
        n_branch=n_branch,
        payoff=payoff,
        parent=np.array(parents, dtype=np.int32),
        parent_arm=np.array(arms, dtype=np.int32),
        depth=depth,
        levels=levels,
        info_keys=keys,
        info_index=index,
        info_n_actions=info_n_actions,
        info_player=info_player,
        info_edges=info_edges,
        edge_labels=labels,
    )
