"""Strategic litmus harness: data-driven assertions on a trained policy.

TPU-native counterpart of the reference's ``litmus`` crate
(ref: crates/litmus/src/{schema,evaluate,render}.rs and
bin/litmus/scenarios.json): a JSON scenario file with shared hands /
histories / categories, case kinds

- ``single``     one state, one edge, probability threshold
- ``pair_diff``  two states' edge probabilities within max_abs_diff
- ``monotonic``  ordered states with monotone probabilities
- ``exists``     acceptable_min floor (grid-slot integrity)

and ``families`` that expand a template across a matrix. The runner
renders a markdown report and returns nonzero-failure status — "how you
test a poker AI's judgment" (SURVEY §4.5).
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import pathlib

import numpy as np

from ..deuce.cards import parse_cards
from ..kicker import edges as E
from .policy import Blueprint, Witness

# edge label → fixed column, or a matcher over menu codes
_FIXED = {"F": E.COL_FOLD, "X": E.COL_CHECK, "C": E.COL_CALL, "S": E.COL_SHOVE}


def edge_columns(label: str) -> list[int]:
    """Resolve an edge label to action columns.

    'F','X','C','S' → fixed columns; '2bb'.. → the open slot; 'n:d' → the
    matching pot-fraction raise slot; '*' → all raise slots + shove
    (aggregate aggression).
    """
    if label in _FIXED:
        return [_FIXED[label]]
    if label == "*":
        return [E.COL_SHOVE] + list(range(E.COL_RAISE0, E.N_COLS))
    if label.endswith("bb"):
        n = int(label[:-2])
        code = E.OPEN_BASE + list(E.OPENS).index(n) if hasattr(E, "OPENS") else None
        from ..pokerkit.constants import OPENS

        code = E.OPEN_BASE + list(OPENS).index(n)
        return [("code", code)]
    if ":" in label:
        from ..pokerkit.constants import RAISES

        a, b = label.split(":")
        code = E.RAISE_BASE + list(RAISES).index((int(a), int(b)))
        return [("code", code)]
    raise ValueError(f"unknown edge label {label!r}")


def edge_probability(dist: np.ndarray, menu_codes: np.ndarray, label: str) -> float:
    """Probability mass on the labeled edge(s) given the node's menu."""
    total = 0.0
    for col in edge_columns(label):
        if isinstance(col, tuple):  # menu-code matcher over raise slots
            _, code = col
            for slot in range(E.N_RAISE_SLOTS):
                if int(menu_codes[slot]) == code:
                    total += float(dist[E.COL_RAISE0 + slot])
        else:
            total += float(dist[col])
    return total


@dataclasses.dataclass
class CaseResult:
    name: str
    category: str
    kind: str
    passed: bool
    observed: dict
    desired: str
    diagnosis: str


def _witness(hand_cards: str, history: list, hero_seat: int) -> Witness:
    events = []
    for e in history:
        kind, payload = e[0], e[1]
        if kind == "deal" and isinstance(payload, str):
            # scenario files spell boards as card strings ("Kh 7d 2c")
            payload = [int(c) for c in parse_cards(payload)]
        events.append((kind, payload))
    return Witness(
        hero_seat=hero_seat,
        hero_hole=parse_cards(hand_cards).astype(np.int64),
        events=events,
    )


def _case_prob(policy: Blueprint, hand: str, history: list, hero_seat: int,
               edge: str) -> float:
    w = _witness(hand, history, hero_seat)
    dist = policy.distribution(w)
    head, _, _ = policy.head_state(w)
    import jax.numpy as jnp

    from ..kicker import aggression
    from ..kicker import game as G

    depth = int(np.asarray(aggression(head))[0])
    street = int(np.asarray(head.street)[0])
    codes = policy.menu[street, min(depth, 4)]
    return edge_probability(dist, codes, edge)


def load(path: str | pathlib.Path) -> dict:
    return json.loads(pathlib.Path(path).read_text())


def expand(doc: dict) -> list[dict]:
    """Families × matrix → flat case list (ref: schema.rs matrix expansion)."""
    cases = list(doc.get("cases", []))
    for fam in doc.get("families", []):
        keys = list(fam.get("matrix", {}).keys())
        for combo in itertools.product(*(fam["matrix"][k] for k in keys)):
            inst = {k: v for k, v in fam.items() if k not in ("matrix", "name_template")}
            inst.update(dict(zip(keys, combo)))
            inst["name"] = fam["name_template"].format(**dict(zip(keys, combo)))
            # matrix axes the template doesn't mention still distinguish
            # cases — append them so duplicate-named rows in generated
            # reports stay identifiable (ADVICE r2 #1: two '3-bet sizes
            # exist …' rows differing only in the raise-size edge)
            extra = [f"{k}={v}" for k, v in zip(keys, combo)
                     if "{" + k + "}" not in fam["name_template"]]
            if extra:
                inst["name"] += " [" + ", ".join(extra) + "]"
            cases.append(inst)
    return cases


def evaluate(policy: Blueprint, doc: dict) -> list[CaseResult]:
    hands = doc.get("hands", {})
    histories = doc.get("histories", {})
    categories = doc.get("categories", {})
    results = []

    def resolve_history(ref):
        node = histories
        for part in ref.split("."):
            node = node[part]
        return node["events"], node.get("hero_seat", 0)

    for case in expand(doc):
        kind = case.get("kind", "single")
        cat = case.get("category", "default")
        expect = {**categories.get(cat, {}).get("expect", {}),
                  **case.get("expect", {})}
        events, hero_seat = resolve_history(case["history"])
        try:
            if kind in ("single", "exists"):
                p = _case_prob(policy, hands[case["hand"]]["cards"], events,
                               hero_seat, case["edge"])
                if kind == "single":
                    lo = expect.get("acceptable_min", -np.inf)
                    hi = expect.get("acceptable_max", np.inf)
                    ok = lo <= p <= hi
                else:
                    ok = p >= expect.get("acceptable_min", 0.0)
                obs = {"p": round(p, 4)}
            elif kind == "pair_diff":
                ps = [
                    _case_prob(policy, hands[h]["cards"], events, hero_seat,
                               case["edge"])
                    for h in case["hands"]
                ]
                ok = abs(ps[0] - ps[1]) <= expect.get("max_abs_diff", 0.05)
                obs = {"p": [round(p, 4) for p in ps]}
            elif kind == "monotonic":
                ps = [
                    _case_prob(policy, hands[h]["cards"], events, hero_seat,
                               case["edge"])
                    for h in case["hands"]
                ]
                diffs = np.diff(ps)
                tol = expect.get("tolerance", 0.0)
                ok = (
                    (diffs >= -tol).all()
                    if expect.get("direction", "increasing") == "increasing"
                    else (diffs <= tol).all()
                )
                obs = {"p": [round(p, 4) for p in ps]}
            else:
                raise ValueError(f"unknown kind {kind}")
        except Exception as exc:  # report, don't crash the whole run
            ok, obs = False, {"error": str(exc)}
        results.append(CaseResult(
            name=case["name"], category=cat, kind=kind, passed=ok,
            observed=obs, desired=case.get("desired", ""),
            diagnosis=case.get("diagnosis_if_violated", ""),
        ))
    return results


def render(results: list[CaseResult]) -> str:
    """Markdown report (ref: render.rs)."""
    lines = ["# Litmus report", ""]
    n_pass = sum(r.passed for r in results)
    lines.append(f"**{n_pass}/{len(results)} passed**")
    lines.append("")
    lines.append("| status | case | kind | observed | diagnosis |")
    lines.append("|---|---|---|---|---|")
    for r in results:
        mark = "✅" if r.passed else "❌"
        diag = "" if r.passed else r.diagnosis
        lines.append(f"| {mark} | {r.name} | {r.kind} | {r.observed} | {diag} |")
    return "\n".join(lines)


def probe_case(policy: Blueprint, hand: str, history: list,
               hero_seat: int) -> dict:
    """The trained-table row behind one litmus decision: visits,
    per-edge regret, averaged policy, and whether the probe ladder
    actually resolved the key (VERDICT r4 #9 — the per-case 'why')."""
    import jax.numpy as jnp

    from ..kicker import game as G
    from ..mccfr.engine import averaged
    from ..nlhe.table import N_COLS, make_key, probe_rows

    w = _witness(hand, history, hero_seat)
    head, _, _ = policy.head_state(w)
    menu = jnp.asarray(policy.menu)
    idx = G.actor_idx(head)
    hole = jnp.take_along_axis(
        head.hole, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    bucket = policy.bucket_fn(
        hole.astype(jnp.int32), head.board.astype(jnp.int32), head.street)
    legal = G.legal_cols(head, menu)
    cmask = (legal * (1 << jnp.arange(N_COLS))).sum(1).astype(jnp.int32)
    klo, khi = make_key(bucket, G.packed_subgame(head), cmask)
    table = policy.table
    # probe_rows' second output is the FALLBACK flag (True = the probe
    # ladder exhausted without resolving the key — the trainer counts it
    # as `fallbacks`), not a hit flag
    row, fb = probe_rows(table.key_lo, table.key_hi, klo, khi)
    r = int(np.asarray(row)[0])
    return {
        "row": r,
        "hit": not bool(np.asarray(fb)[0]) if hasattr(fb, "shape") else True,
        "visits": int(np.asarray(table.visits[r])),
        "bucket": int(np.asarray(bucket)[0]),
        "regret": np.asarray(table.regret[r]).round(1).tolist(),
        "policy": np.asarray(
            averaged(table.weight[r][None], legal[0][None]))[0]
        .round(4).tolist(),
        "legal": np.asarray(legal[0]).astype(int).tolist(),
    }


def why_report(policy: Blueprint, doc: dict,
               results: list[CaseResult],
               visit_floor: int = 64) -> str:
    """Markdown appendix annotating each FAILING case with the table
    rows it read and an epoch-bound-vs-structural verdict
    (ref: crates/litmus/src/evaluate.rs:43-60 — the reference prints
    policy context on failure; this adds the learner-state view)."""
    hands = doc.get("hands", {})
    histories = doc.get("histories", {})

    def resolve_history(ref):
        node = histories
        for part in ref.split("."):
            node = node[part]
        return node["events"], node.get("hero_seat", 0)

    by_name = {}
    for case in expand(doc):
        by_name[case["name"]] = case
    lines = ["", "## Why (failing cases)", "",
             "| case | hand | visits | verdict | regret (legal) | policy |",
             "|---|---|---|---|---|---|"]
    for r in results:
        if r.passed or r.name not in by_name:
            continue
        case = by_name[r.name]
        events, hero_seat = resolve_history(case["history"])
        case_hands = case.get("hands") or [case.get("hand")]
        for h in case_hands:
            if h is None or h not in hands:
                continue
            try:
                p = probe_case(policy, hands[h]["cards"], events, hero_seat)
            except Exception as exc:  # noqa: BLE001
                lines.append(f"| {r.name} | {h} | — | probe error: {exc} "
                             f"| — | — |")
                continue
            if not p["hit"]:
                verdict = "UNRESOLVED KEY (probe miss — never trained)"
            elif p["visits"] == 0:
                verdict = "epoch-bound (row never visited)"
            elif p["visits"] < visit_floor:
                verdict = f"epoch-bound (under-visited: {p['visits']})"
            else:
                verdict = "structural (well-visited, mis-valued)"
            reg = [v for v, l in zip(p["regret"], p["legal"]) if l]
            pol = [v for v, l in zip(p["policy"], p["legal"]) if l]
            lines.append(
                f"| {r.name} | {h} | {p['visits']} | {verdict} | "
                f"{reg} | {pol} |")
    return "\n".join(lines)


def run(policy: Blueprint, scenario_path: str,
        why: bool = False) -> tuple[str, bool]:
    """CLI entry: (markdown, all_passed) — nonzero exit on failure
    (ref: bin/litmus)."""
    doc = load(scenario_path)
    results = evaluate(policy, doc)
    md = render(results)
    if why and not all(r.passed for r in results):
        md += "\n" + why_report(policy, doc, results)
    return md, all(r.passed for r in results)
