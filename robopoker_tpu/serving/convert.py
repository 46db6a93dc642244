"""Interactive poker-analysis commands (the reference's ``convert`` CLI).

TPU-native counterpart of ``bin/convert`` + ``portal::CLI``
(ref: bin/convert/src/main.rs:1-13, crates/portal/src/topology/cli.rs):
type conversions (path/edge/observation/isomorphism) and topology
queries (abstraction, equity, distance, nearby, population) against the
in-repo artifacts instead of Postgres tables.

``handle(line, ctx)`` is a pure dispatcher so every command is testable
without a terminal; ``repl(ctx)`` wraps it in a prompt loop.

Observation syntax: pocket cards, ``/``, board cards —
``Ac Kd / 7h 8h 9h``. Two observations separated by ``;``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..deuce.cards import parse_cards
from ..deuce.isomorphism import canonical_key
from ..deuce.observation import river_equity
from ..kicker import edges as E

HELP = """commands (ref: portal topology CLI):
  abstraction <obs>      bucket id of an observation
  equity <obs>           showdown equity (exact on the river)
  distance <obs> ; <obs> EMD between two same-street observations
  isomorphism <obs>      canonical key words (hex)
  path <int>             unpack a packed edge path
  edge <int>             edge code name
  nearby <street> <k>    nearest centroids of bucket k (street 1=flop 2=turn)
  population <street> <k> points assigned to bucket k in the artifact
  help | quit
observation = pocket / board, e.g.  Ac Kd / 7h 8h 9h"""


def _parse_obs(text: str) -> tuple[np.ndarray, np.ndarray]:
    parts = text.split("/")
    pocket = parse_cards(parts[0].split()).astype(np.int32)
    board_cards = parts[1].split() if len(parts) > 1 else []
    board = np.full(5, -1, np.int32)
    if board_cards:
        b = parse_cards(board_cards).astype(np.int32)
        board[: len(b)] = b
    if pocket.shape != (2,):
        raise ValueError("pocket must be exactly two cards")
    return pocket, board


def _street_of(board: np.ndarray) -> int:
    n = int((board >= 0).sum())
    return {0: 0, 3: 1, 4: 2, 5: 3}[n]


def _turn_hist(pocket, board) -> np.ndarray:
    from ..lloyd.histogram import turn_histograms

    h = turn_histograms(jnp.asarray(pocket[None]), jnp.asarray(board[None, :4]))
    return np.asarray(h[0])


def handle(line: str, ctx: dict) -> str:
    """Execute one command; returns the rendered reply."""
    words = line.strip().split(None, 1)
    if not words:
        return ""
    cmd, rest = words[0].lower(), (words[1] if len(words) > 1 else "")

    if cmd in ("help", "?"):
        return HELP

    if cmd == "edge":
        return E.edge_name(int(rest))

    if cmd == "path":
        codes = E.unpack_path(int(rest))
        return " -> ".join(E.edge_name(c) for c in codes) or "(empty)"

    if cmd == "isomorphism":
        pocket, board = _parse_obs(rest)
        words2 = np.asarray(
            canonical_key(jnp.asarray(pocket[None]), jnp.asarray(board[None]))
        )[0]
        return " ".join(f"{int(w) & 0xFFFFFFFF:08x}" for w in words2)

    if cmd == "abstraction":
        pocket, board = _parse_obs(rest)
        street = _street_of(board)
        bucket = ctx["bucket_fn"](
            jnp.asarray(pocket[None]), jnp.asarray(board[None]),
            jnp.asarray([street], jnp.int32),
        )
        return f"street {street} bucket {int(np.asarray(bucket)[0])}"

    if cmd == "equity":
        pocket, board = _parse_obs(rest)
        if _street_of(board) == 3:
            eq = float(np.asarray(
                river_equity(jnp.asarray(pocket[None]), jnp.asarray(board[None]))
            )[0])
            return f"equity {eq:.4f} (exact, 990 opponents)"
        import jax

        from ..deuce.observation import equity_mc

        n = int((board >= 0).sum())
        eq = float(np.asarray(equity_mc(
            jnp.asarray(pocket[None]), jnp.asarray(board[None]),
            jnp.asarray([n], jnp.int32), jax.random.PRNGKey(0),
        ))[0])
        return f"equity {eq:.4f} (MC runouts)"

    if cmd == "distance":
        a, b = rest.split(";")
        pa, ba = _parse_obs(a)
        pb, bb = _parse_obs(b)
        sa, sb = _street_of(ba), _street_of(bb)
        if sa != sb:
            return "error: observations on different streets"
        if sa == 3:
            ea = float(np.asarray(river_equity(
                jnp.asarray(pa[None]), jnp.asarray(ba[None])))[0])
            eb = float(np.asarray(river_equity(
                jnp.asarray(pb[None]), jnp.asarray(bb[None])))[0])
            return f"distance {abs(ea - eb):.4f} (river equity delta)"
        if sa == 2:
            from ..lloyd.sinkhorn import variation_distance

            ha, hb = _turn_hist(pa, ba), _turn_hist(pb, bb)
            d = float(np.asarray(variation_distance(
                jnp.asarray(ha[None]), jnp.asarray(hb[None]))[0]))
            return f"distance {d:.4f} (equity-histogram variation)"
        return "error: distance supports turn/river observations"

    if cmd == "nearby":
        street, k = (int(x) for x in rest.split())
        art = ctx.get("artifacts", {}).get(street)
        if art is None:
            return f"error: no street-{street} artifact loaded"
        row = np.asarray(art.metric)[k]
        order = np.argsort(row)
        out = [f"{int(j)}: {row[j]:.4f}" for j in order[1:6]]
        return f"nearest to bucket {k}: " + ", ".join(out)

    if cmd == "population":
        street, k = (int(x) for x in rest.split())
        art = ctx.get("artifacts", {}).get(street)
        if art is None:
            return f"error: no street-{street} artifact loaded"
        n = int((np.asarray(art.assignment) == k).sum())
        return f"bucket {k}: {n} of {len(art.assignment)} artifact points"

    return f"unknown command {cmd!r} — try 'help'"


def repl(ctx: dict) -> None:
    """Prompt loop (ref: portal::CLI::run)."""
    print(HELP)
    while True:
        try:
            line = input("> ")
        except EOFError:
            break
        if line.strip() in ("quit", "exit"):
            break
        try:
            out = handle(line, ctx)
        except Exception as e:  # conversion errors stay in the loop
            out = f"error: {e}"
        if out:
            print(out)
