"""Collect the round-4 promote-bar inputs and decide.

Bars (VERDICT r3 #1): litmus ≥ 41/48 AND fair chip LBR ≤ r1's number
(within joint stderr), with the head-to-head arena as a tiebreaker.
Run after scripts/round_end_r4.sh; --apply copies the r4 blueprint to
artifacts/blueprint_compact.npz (the flagship slot) and records the
abstraction it must be served with.
"""

import argparse
import json
import pathlib
import re
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def last_jsonl(path):
    p = pathlib.Path(path)
    if not p.exists():
        return None
    rows = [json.loads(l) for l in p.read_text().splitlines() if l.strip()]
    return rows[-1] if rows else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--apply", action="store_true")
    args = ap.parse_args()

    out = {}
    # litmus
    lit = pathlib.Path("logs/litmus_r4.log")
    if lit.exists():
        m = re.search(r"\*\*(\d+)/(\d+) passed\*\*", lit.read_text())
        if m:
            out["litmus_r4"] = f"{m.group(1)}/{m.group(2)}"
            out["litmus_pass"] = int(m.group(1)) >= 41
    # LBR sweep (use the highest-epoch point; the chip sweep is
    # preferred, the CPU watch curve is the same-estimator fallback —
    # round-4 session 2: the chip sweep again failed to fit its window,
    # the CPU point decided)
    best = None
    for name in ("docs/lbr_curve_r4_chip.jsonl", "docs/lbr_curve_r4.jsonl"):
        p = pathlib.Path(name)
        if not p.exists():
            continue
        for l in p.read_text().splitlines():
            r = json.loads(l)
            if best is None or r["epoch"] > best["epoch"]:
                best = dict(r, source=name)
        if best:
            break
    if best:
        out["lbr_r4"] = {"epoch": best["epoch"],
                         "lbr_mbb": best["lbr_mbb"],
                         "stderr": best["stderr"],
                         "source": best["source"]}
    # r1 fair point from this session (fallback: r3's recorded number)
    r1 = None
    lg = pathlib.Path("logs/lbr_r1_r4chip.log")
    if lg.exists():
        m = re.search(r"\{[^{}]*\"lbr_mbb_per_hand\"[^{}]*\}",
                      lg.read_text(), re.S)
        if m:
            r1 = json.loads(m.group(0))
    out["lbr_r1"] = (
        {k: r1.get(k) for k in ("lbr_mbb_per_hand", "stderr_mbb")}
        if r1 else {"lbr_mbb_per_hand": 5009.0, "stderr_mbb": 166.0,
                    "source": "round-3 recorded"})
    if best:
        joint = (best["stderr"] ** 2
                 + out["lbr_r1"]["stderr_mbb"] ** 2) ** 0.5
        out["lbr_pass"] = (best["lbr_mbb"]
                           <= out["lbr_r1"]["lbr_mbb_per_hand"] + joint)
    # arena
    ar = pathlib.Path("logs/arena_r4_vs_r1.log")
    if ar.exists():
        m = re.findall(r"\{.*\}", ar.read_text(), re.S)
        if m:
            try:
                j = json.loads(m[-1])
                out["arena_r4_vs_r1_mbb"] = j.get("a_minus_b_mbb_per_hand")
                out["arena_stderr_mbb"] = j.get("stderr_mbb")
            except Exception:
                pass
    promote = bool(out.get("litmus_pass")) and bool(out.get("lbr_pass"))
    out["promote"] = promote
    print(json.dumps(out, indent=2))
    if args.apply and promote:
        shutil.copy("artifacts/r4/blueprint_compact.npz",
                    "artifacts/blueprint_compact.npz")
        pathlib.Path("artifacts/FLAGSHIP.md").write_text(
            "Flagship blueprint = round-4 fresh bias-on train "
            "(artifacts/r4 lineage). Serve/evaluate it with "
            "--abstraction artifacts/abstraction_full — the compact "
            "fingerprint enforces this.\n")
        print("PROMOTED artifacts/r4 -> artifacts/blueprint_compact.npz")
    elif args.apply:
        print("bars not met — NOT promoted")


if __name__ == "__main__":
    main()
