"""RPS policy-simplex trajectory capture + standalone HTML viewer.

TPU-native counterpart of the reference's roshambo simplex module
(ref: crates/roshambo/src/simplex.rs:1-114 — barycentric coordinates,
per-epoch Snapshot of iterated/averaged policies, regrets, weights —
and assets.rs, the embedded SVG viewer). The viewer here is re-authored
from scratch: one self-contained HTML file, data inlined as JSON, an
SVG 2-simplex with both players' iterated and averaged trajectories and
an epoch slider. Vertices match the reference: R=(0,0), P=(1,0),
S=(0.5, √3/2).
"""

from __future__ import annotations

import dataclasses
import json
import math


@dataclasses.dataclass
class Snapshot:
    """Per-player CFR state at one epoch (ref: simplex.rs Snapshot)."""

    epoch: int
    iterated: tuple      # (R, P, S) instant regret-matched policy
    averaged: tuple      # (R, P, S) weight-averaged policy
    regrets: tuple
    weights: tuple


def cartesian(coords) -> tuple:
    """Barycentric (R,P,S) → 2D (ref: simplex.rs cartesian)."""
    _, p, s = coords
    return (p + 0.5 * s, s * math.sqrt(3.0) / 2.0)


def snapshot(solver, player: int) -> Snapshot:
    """Capture one player's state from a games.rps Solver profile."""
    from ..games.rps import EDGES

    key = f"P{player + 1}"
    return Snapshot(
        epoch=int(solver.epoch) if hasattr(solver, "epoch") else 0,
        iterated=tuple(solver.instant_policy(key, e) for e in EDGES),
        averaged=tuple(
            solver.averaged_distribution(key).get(e, 0.0) for e in EDGES),
        regrets=tuple(solver.cum_regret(key, e) for e in EDGES),
        weights=tuple(solver.cum_weight(key, e) for e in EDGES),
    )


def trajectory(n_epochs: int = 4096, stride: int = 64, seed: int = 0,
               batch_size: int = 8):
    """Solve asymmetric RPS, capturing snapshots every ``stride`` epochs.

    Returns (snapshots_p1, snapshots_p2)."""
    from ..games.rps import Rps
    from ..mccfr.solver import Solver

    s = Solver(Rps(), batch_size=batch_size, seed=seed)
    outs = ([], [])
    for ep in range(0, n_epochs, stride):
        s.solve(stride * batch_size)
        for player in (0, 1):
            snap = snapshot(s, player)
            snap.epoch = ep + stride
            outs[player].append(snap)
    return outs


_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>RPS policy simplex</title>
<style>
 body {{ font: 14px system-ui; margin: 24px; color: #222; }}
 svg {{ border: 1px solid #ddd; }}
 .lbl {{ font: 12px system-ui; fill: #555; }}
 .tr-it {{ fill: none; stroke-width: 1; opacity: .65; }}
 .tr-av {{ fill: none; stroke-width: 2; }}
 #readout {{ margin-top: 8px; white-space: pre; font-family: monospace; }}
</style></head><body>
<h3>Asymmetric RPS — CFR trajectories on the policy 2-simplex</h3>
<p>thin = iterated (regret-matched) policy, thick = averaged policy;
blue = P1, orange = P2; ★ = analytic Nash (0.4, 0.4, 0.2)</p>
<svg id="sx" width="640" height="600" viewBox="-0.1 -0.08 1.2 1.08"></svg>
<div><input id="ep" type="range" min="0" max="0" value="0" style="width:640px">
<div id="readout"></div></div>
<script>
const P1 = {p1};
const P2 = {p2};
const NASH = {nash};
const sq32 = Math.sqrt(3)/2;
function xy(c) {{ return [c[1] + 0.5*c[2], (1 - c[2]*sq32) - (1-sq32)]; }}
// y flipped so S is at the top of the viewport
function pt(c) {{ const [x,y] = xy(c); return x.toFixed(4)+','+y.toFixed(4); }}
const svg = document.getElementById('sx');
function el(tag, attrs, text) {{
  const e = document.createElementNS('http://www.w3.org/2000/svg', tag);
  for (const k in attrs) e.setAttribute(k, attrs[k]);
  if (text) e.textContent = text;
  svg.appendChild(e); return e;
}}
el('polygon', {{points: pt([1,0,0])+' '+pt([0,1,0])+' '+pt([0,0,1]),
               fill:'#fafafa', stroke:'#999', 'stroke-width':0.004}});
el('text', {{x:-0.03, y:1.0, class:'lbl', 'font-size':0.05}}, 'R');
el('text', {{x:1.01, y:1.0, class:'lbl', 'font-size':0.05}}, 'P');
el('text', {{x:0.48, y:0.10, class:'lbl', 'font-size':0.05}}, 'S');
const [nx,ny] = xy(NASH);
el('text', {{x:nx-0.02, y:ny+0.015, 'font-size':0.06, fill:'#111'}}, '★');
function poly(snaps, key, cls, color, upto) {{
  const pts = snaps.slice(0, upto+1).map(s => pt(s[key])).join(' ');
  return el('polyline', {{points: pts, class: cls, stroke: color}});
}}
let layers = [];
function draw(upto) {{
  layers.forEach(l => l.remove()); layers = [];
  layers.push(poly(P1, 'iterated', 'tr-it', '#4477cc', upto));
  layers.push(poly(P2, 'iterated', 'tr-it', '#ee8844', upto));
  layers.push(poly(P1, 'averaged', 'tr-av', '#4477cc', upto));
  layers.push(poly(P2, 'averaged', 'tr-av', '#ee8844', upto));
  const s1 = P1[upto], s2 = P2[upto];
  document.getElementById('readout').textContent =
    'epoch ' + s1.epoch +
    '\\nP1 avg (R,P,S) = ' + s1.averaged.map(v=>v.toFixed(3)).join(', ') +
    '   regrets = ' + s1.regrets.map(v=>v.toFixed(1)).join(', ') +
    '\\nP2 avg (R,P,S) = ' + s2.averaged.map(v=>v.toFixed(3)).join(', ') +
    '   regrets = ' + s2.regrets.map(v=>v.toFixed(1)).join(', ');
}}
const slider = document.getElementById('ep');
slider.max = P1.length - 1; slider.value = P1.length - 1;
slider.addEventListener('input', () => draw(+slider.value));
draw(P1.length - 1);
</script></body></html>
"""


def render_html(p1_snaps, p2_snaps) -> str:
    from ..games.rps import nash

    def ser(snaps):
        return json.dumps([
            {"epoch": s.epoch, "iterated": list(s.iterated),
             "averaged": list(s.averaged), "regrets": list(s.regrets),
             "weights": list(s.weights)} for s in snaps])

    n = nash()
    return _TEMPLATE.format(
        p1=ser(p1_snaps), p2=ser(p2_snaps),
        nash=json.dumps([n["R"], n["P"], n["S"]]))
