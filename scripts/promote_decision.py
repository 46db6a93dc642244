"""Collect the promote-bar inputs for a candidate lineage and decide.

Bars (VERDICT r3 #1, r4 #1): litmus ≥ 41/48 AND fc-LBR ≤ the r1
flagship's number (within joint stderr) AND head-to-head arena vs r1
≥ 0. --apply copies the candidate blueprint to
artifacts/blueprint_compact.npz (the flagship slot).

Estimator-condition honesty (VERDICT r4 weak #4): the bar and the
candidate must be measured under IDENTICAL conditions (same hands, same
backend). The decision record carries each point's hands/source and
emits a WARNING when they differ.

    python3 scripts/promote_decision.py --lineage artifacts/r2 \
        --litmus-log logs/litmus_r5.log \
        --lbr-curves artifacts/r2/lbr_curve_chip.jsonl,docs/lbr_curve_r5.jsonl \
        --r1-log logs/lbr_r1_r5.log --arena-log logs/arena_r5_vs_r1.log
"""

import argparse
import json
import pathlib
import re
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def jsonl_rows(path):
    p = pathlib.Path(path)
    if not p.exists():
        return []
    rows = []
    for l in p.read_text().splitlines():
        l = l.strip()
        if not l:
            continue
        try:
            rows.append(json.loads(l))
        except json.JSONDecodeError:
            print(f"WARNING: unparsable line in {path}", file=sys.stderr)
    return rows


def json_lines_from_log(path):
    """Per-line JSON objects from a mixed log (ADVICE r4 #4: a greedy
    brace regex spans first-to-last brace across multiple objects and
    silently fails; parse line-by-line and warn on misses)."""
    p = pathlib.Path(path)
    if not p.exists():
        return []
    out = []
    text = p.read_text()
    for l in text.splitlines():
        l = l.strip()
        if l.startswith("{") and l.endswith("}"):
            try:
                out.append(json.loads(l))
            except json.JSONDecodeError:
                print(f"WARNING: JSON-looking line in {path} failed to "
                      f"parse", file=sys.stderr)
    if not out:
        # pretty-printed (multi-line) objects: balanced raw_decode scan
        dec = json.JSONDecoder()
        i = 0
        while (i := text.find("{", i)) != -1:
            try:
                obj, end = dec.raw_decode(text, i)
                if isinstance(obj, dict):
                    out.append(obj)
                i = end
            except json.JSONDecodeError:
                i += 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--apply", action="store_true")
    ap.add_argument("--lineage", default="artifacts/r2")
    ap.add_argument("--litmus-log", default="logs/litmus_r5.log")
    ap.add_argument("--lbr-curves",
                    default="artifacts/r2/lbr_curve_chip.jsonl,"
                            "docs/lbr_curve_r5.jsonl,docs/lbr_curve_r3.jsonl")
    ap.add_argument("--r1-log", default="logs/lbr_r1_r5.log",
                    help="log holding the r1 bar point measured under the "
                         "SAME estimator conditions as the candidate")
    ap.add_argument("--arena-log", default="logs/arena_r5_vs_r1.log")
    ap.add_argument("--out", default="docs/promote_decision_r5.json")
    args = ap.parse_args()

    out = {"lineage": args.lineage}
    # litmus
    lit = pathlib.Path(args.litmus_log)
    if lit.exists():
        m = None
        for m in re.finditer(r"\*\*(\d+)/(\d+) passed\*\*", lit.read_text()):
            pass
        if m:
            out["litmus"] = f"{m.group(1)}/{m.group(2)}"
            out["litmus_pass"] = int(m.group(1)) >= 41
    # LBR: merge ALL curve files and take the global highest-epoch point
    # (ADVICE r4 #3: a stale chip file must not shadow a newer CPU point)
    best = None
    for name in args.lbr_curves.split(","):
        for r in jsonl_rows(name.strip()):
            if "lbr_mbb" not in r:
                continue
            if best is None or r["epoch"] > best["epoch"]:
                best = dict(r, source=r.get("source", name.strip()))
    if best:
        out["lbr_candidate"] = {
            k: best.get(k) for k in
            ("epoch", "lbr_mbb", "stderr", "hands", "source")}
    # r1 bar point (same-conditions measurement preferred)
    r1 = None
    for j in reversed(json_lines_from_log(args.r1_log)):
        if "lbr_mbb_per_hand" in j or "lbr_mbb" in j:
            r1 = {"lbr_mbb": j.get("lbr_mbb_per_hand", j.get("lbr_mbb")),
                  "stderr": j.get("stderr_mbb", j.get("stderr")),
                  "hands": j.get("hands"), "source": args.r1_log}
            break
    if r1 is None:
        r1 = {"lbr_mbb": 5009.0, "stderr": 166.0, "hands": 32768,
              "source": "round-3 recorded (32,768 hands, chip)"}
    out["lbr_r1"] = r1
    if best:
        joint = (best["stderr"] ** 2 + r1["stderr"] ** 2) ** 0.5
        out["lbr_pass"] = best["lbr_mbb"] <= r1["lbr_mbb"] + joint
        if best.get("hands") != r1.get("hands"):
            out["estimator_warning"] = (
                f"candidate measured at {best.get('hands')} hands "
                f"({best.get('source')}) but the r1 bar at "
                f"{r1.get('hands')} hands ({r1.get('source')}) — "
                f"re-measure under identical conditions before trusting "
                f"a marginal pass (VERDICT r4 weak #4)")
            print("WARNING: " + out["estimator_warning"], file=sys.stderr)
    # arena head-to-head vs r1
    arena = None
    for j in reversed(json_lines_from_log(args.arena_log)):
        if "a_minus_b_mbb_per_hand" in j:
            arena = j
            break
    if arena:
        out["arena_vs_r1_mbb"] = arena.get("a_minus_b_mbb_per_hand")
        out["arena_stderr_mbb"] = arena.get("stderr_mbb")
        out["arena_pass"] = out["arena_vs_r1_mbb"] >= 0
    promote = (bool(out.get("litmus_pass")) and bool(out.get("lbr_pass"))
               and out.get("arena_pass", True))
    out["promote"] = promote
    print(json.dumps(out, indent=2))
    pathlib.Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    if args.apply and promote:
        shutil.copy(pathlib.Path(args.lineage) / "blueprint_compact.npz",
                    "artifacts/blueprint_compact.npz")
        pathlib.Path("artifacts/FLAGSHIP.md").write_text(
            f"Flagship blueprint = {args.lineage} lineage. Serve/evaluate "
            f"it with --abstraction artifacts/abstraction_full — the "
            f"compact fingerprint enforces this.\n")
        print(f"PROMOTED {args.lineage} -> artifacts/blueprint_compact.npz")
    elif args.apply:
        print("bars not met — NOT promoted")


if __name__ == "__main__":
    main()
