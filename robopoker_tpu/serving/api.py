"""HTTP serving API.

TPU-native counterpart of the reference's ``portal`` actix server
(ref: crates/portal/src/lib.rs:96-184): the same REST scope layout over
aiohttp —

- GET  /health                    liveness
- POST /auth/{register,login,logout} + GET /auth/me   (serving/auth.py)
- POST /room/start                open an interactive table vs bots
- GET  /room/enter/{room_id}      WebSocket: snapshots out, actions in
- POST /room/leave/{room_id}      close the room
- POST /strategy/policy           blueprint policy for a witness
- POST /strategy/depth            depth-limited re-solve (adapt_leaf)
- POST /strategy/world            safe world-partitioned re-solve (adapt_safe)
- POST /strategy/full             combined subgame re-solve (adapt_full)
- POST /strategy/range            villain-hole posterior from hero's POV
- POST /strategy/signalled        hero's own signalled range
- GET  /strategy/grid-usage       per-edge blueprint frequency aggregate
- POST /gameplay/summary          PnL summary over the hand log
- POST /gameplay/aivat            AIVAT variance-reduced winrate
- GET  /gameplay/hand/{id}        one recorded hand
- GET  /training/status           snapshot log summary
- POST /training/snapshots        paged snapshot history {limit, offset}
- GET  /training/stats            aggregate blueprint-table statistics
- GET  /training/street-stats     per-street aggregates (see note below)
- POST /training/cold             least-visited infoset rows {limit}
- POST /training/hot              largest-|regret| infoset rows {limit}
- POST /training/convergence      sum-regret series with deltas {limit}
- GET  /training/saturation       accumulator headroom vs f32 range
- GET  /topology/metric/{street}  centroid distance rows
- GET  /topology/nearby/{street}/{k}      nearest centroids of bucket k
- GET  /topology/population/{street}/{k}  artifact points in bucket k
- POST /litmus/run                run the scenario harness

Auth: the reference's bouncer (JWT/Argon2) maps to `serving/auth.py`
(PBKDF2+HMAC tokens); pass ``members`` to build_app to mount the /auth
scope. Data endpoints are served open, matching the reference where
bouncer is a separate reverse-proxy tier in front of portal rather
than per-route middleware.

Street-attribution note: the reference's `street-stats` joins blueprint
rows on the stored `present` bucket (ref: portal/src/training/api.rs
street CASE with an ELSE '?' arm). Our HBM table keys rows by an
avalanche hash of (bucket, path, choices); the bucket and choices words
are persisted in sidecar columns with each key claim (nlhe/table.py),
so street-stats and grid-usage attribute exactly. Rows from legacy
(pre-sidecar) checkpoints land in the reference's own '?' arm.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import numpy as np


def build_app(blueprint, resolver=None, workdir="artifacts", artifacts=None,
              members=None, resolve_config=None, hands_path=None):
    """Construct the aiohttp Application (caller runs it).

    ``resolver`` (optional) is used for /strategy/full; /strategy/depth
    and /strategy/world build sibling resolvers from ``resolve_config``
    on first use. ``members`` (serving.auth.Members) enables the /auth
    scope. ``hands_path`` points the /gameplay scope at a HandLog
    (default <workdir>/hands.jsonl).
    """
    from aiohttp import web

    from ..nlhe.forge import status as forge_status
    from . import litmus as litmus_mod
    from .policy import Witness

    routes = web.RouteTableDef()

    def witness_of(payload: dict) -> Witness:
        return Witness(
            hero_seat=int(payload["hero_seat"]),
            hero_hole=np.asarray(payload["hero_hole"], np.int64),
            events=[tuple(e) for e in payload.get("events", [])],
        )

    @routes.get("/health")
    async def health(request):
        return web.json_response({"ok": True})

    @routes.post("/strategy/policy")
    async def policy(request):
        payload = await request.json()
        dist = blueprint.distribution(witness_of(payload))
        return web.json_response({"policy": [float(x) for x in dist]})

    # --- subgame re-solve kinds (ref: portal strategy Kind::{Depth,
    # World,Full} → adapt_leaf / adapt_safe / adapt_full) -------------
    _resolvers = {"full": resolver} if resolver is not None else {}

    def resolver_for(kind: str):
        if kind not in _resolvers:
            from ..subgame import ResolveConfig
            from .policy import Resolver

            base = resolve_config or ResolveConfig()
            cfg = {
                # depth-limited only: blueprint-EV frontier, one world
                "depth": dataclasses.replace(base, frontier_picks=False),
                # safe re-solve: worlds on, run deeper toward terminal
                "world": dataclasses.replace(
                    base, frontier_picks=False,
                    max_levels=max(base.max_levels, 8)),
                # combined: worlds + L×L frontier pick game
                "full": dataclasses.replace(base, frontier_picks=True),
            }[kind]
            # portal parity: the reference's /strategy/{depth,world,full}
            # handlers call adapt_* directly at any street — preflop
            # delegation lives in the parlor BRAINS, not the portal
            # (ref: portal strategy handlers vs players/brain.rs:58-71)
            _resolvers[kind] = Resolver(
                blueprint, cfg, use_worlds=(kind != "depth"),
                preflop_blueprint=False)
        return _resolvers[kind]

    async def solve_kind(request, kind: str):
        payload = await request.json()
        r = resolver_for(kind)
        if "budget_ms" in payload:
            r.budget_s = float(payload["budget_ms"]) / 1000.0
        out = r.solve(witness_of(payload))
        return web.json_response({
            "kind": kind,
            "policy": [float(x) for x in out["policy"]],
            "iterations": out["iterations"],
            "elapsed_ms": out["elapsed_ms"],
        })

    @routes.post("/strategy/depth")
    async def solve_depth(request):
        return await solve_kind(request, "depth")

    @routes.post("/strategy/world")
    async def solve_world(request):
        return await solve_kind(request, "world")

    @routes.post("/strategy/full")
    async def full(request):
        return await solve_kind(request, "full")

    def range_payload(probs, live):
        from ..deuce.observation import ALL_POCKETS

        idx = np.flatnonzero(np.asarray(live) & (np.asarray(probs) > 0))
        return {"entries": [
            {"obs": [int(c) for c in ALL_POCKETS[i]], "weight": float(probs[i])}
            for i in idx
        ]}

    @routes.post("/strategy/range")
    async def strat_range(request):
        payload = await request.json()
        probs, live = blueprint.range_posterior(witness_of(payload))
        return web.json_response(range_payload(probs, live))

    @routes.post("/strategy/signalled")
    async def strat_signalled(request):
        payload = await request.json()
        probs, live = blueprint.signalled_posterior(witness_of(payload))
        return web.json_response(range_payload(probs, live))

    @routes.get("/strategy/grid-usage")
    async def grid_usage(request):
        # per-(street, edge) strategy frequency across the blueprint
        # (ref: portal grid_usage — avg_freq per decision, weighted_freq
        # by visits); street attribution from the bucket sidecar, with
        # the choices sidecar as the per-row availability mask where the
        # accumulators have not yet touched an edge
        h = host_table()
        usage = []
        for name, idx in street_groups(h):
            w = np.maximum(h["weight"][idx], 0.0)
            tot = w.sum(axis=1, keepdims=True)
            cm = h["choices"][idx]
            legal = ((cm[:, None] >> np.arange(w.shape[1])) & 1).astype(bool)
            avail = h["edge_mask"][idx] | legal
            per_dec = np.where(tot > 0, w / np.maximum(tot, 1e-30), 0.0)
            n_avail = np.maximum(avail.sum(axis=0), 1)
            usage += [{
                "street": name,
                "edge": int(c),
                "avg_freq": float(
                    (per_dec[:, c] * avail[:, c]).sum() / n_avail[c]),
                "weighted_freq": float(
                    w[avail[:, c], c].sum()
                    / max(tot[avail[:, c], 0].sum(), 1e-30)),
            } for c in range(w.shape[1])]
        return web.json_response({"usage": usage})

    # --- gameplay: hand-log summaries + AIVAT (ref: portal gameplay
    # scope over the Postgres hand records; ours reads the HandLog) ---
    def hand_results():
        from .records import HandLog

        path = pathlib.Path(hands_path or (pathlib.Path(workdir) / "hands.jsonl"))
        if not path.exists():
            return []
        return HandLog(path).load()

    @routes.post("/gameplay/summary")
    async def gameplay_summary(request):
        from ..pokerkit.constants import B_BLIND

        body = await request.json()
        seat = int(body.get("hero_seat", 0))
        limit = int(body.get("limit", 1000))
        offset = int(body.get("offset", 0))
        res = hand_results()[offset:offset + limit]
        if not res:
            return web.json_response({"hands": 0})
        pnl = np.array([r.pnl[seat] for r in res], np.float64) / B_BLIND
        stderr = float(pnl.std(ddof=1) / np.sqrt(len(pnl))) if len(pnl) > 1 else 0.0
        return web.json_response({
            "hands": len(res),
            "population": len(hand_results()),
            "total_bb": float(pnl.sum()),
            "bb_per_100": float(pnl.mean() * 100),
            "stderr_bb_per_100": stderr * 100,
        })

    @routes.post("/gameplay/aivat")
    async def gameplay_aivat(request):
        from .aivat import Aivat
        from .records import to_aivat

        body = await request.json()
        seat = int(body.get("hero_seat", 0))
        limit = int(body.get("limit", 1000))
        offset = int(body.get("offset", 0))
        res = hand_results()[offset:offset + limit]
        if not res:
            return web.json_response({"hands": 0})
        recs = [to_aivat(r, hero_seat=seat) for r in res]
        delta = Aivat(blueprint.table, blueprint.bucket_fn).evaluate(recs)
        return web.json_response({
            "hands": delta.n_hands,
            "raw_mean": float(delta.raw_mean),
            "aivat_mean": float(delta.aivat_mean),
            "raw_stderr": float(delta.raw_stderr),
            "aivat_stderr": float(delta.aivat_stderr),
            "reduction": float(delta.reduction),
            "pvalue": float(delta.pvalue),
        })

    @routes.get("/gameplay/hand/{id}")
    async def gameplay_hand(request):
        from .records import to_wire

        i = int(request.match_info["id"])
        res = hand_results()
        if not 0 <= i < len(res):
            return web.json_response({"error": "no such hand"}, status=404)
        return web.json_response(to_wire(res[i], i))

    # --- interactive rooms (ref: portal hosting scope + parlor Engine
    # WS loop; snapshots out, actions in) -----------------------------
    rooms = {}
    room_seq = {"next": 0}

    @routes.post("/room/start")
    async def room_start(request):
        from .parlor import Room
        from .policy import Agent, Fish

        body = await request.json()
        seats = int(body.get("seats", 2))
        human = int(body.get("human_seat", 0))
        variant = body.get("variant", "dirac")
        seed = int(body.get("seed", 0))
        if not 0 <= human < seats:
            return web.json_response({"error": "bad human_seat"}, status=400)

        def bot(i):
            if seats > 2 or variant == "fish":
                return Fish(seed=seed + i)  # blueprint is heads-up-only
            return Agent(blueprint, use_dirac=(variant == "dirac"),
                         seed=seed + i)

        agents = [None if i == human else bot(i) for i in range(seats)]
        room = Room(agents, seed=seed)
        room.start_hand(0)
        rid = str(room_seq["next"])
        room_seq["next"] += 1
        rooms[rid] = (room, human)
        return web.json_response({"room_id": rid, "human_seat": human})

    @routes.get("/room/enter/{room_id}")
    async def room_enter(request):
        rid = request.match_info["room_id"]
        if rid not in rooms:
            return web.json_response({"error": "no such room"}, status=404)
        room, human = rooms[rid]
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        await ws.send_json(room.snapshot(human))
        async for msg in ws:
            if msg.type != web.WSMsgType.TEXT:
                break
            body = json.loads(msg.data)
            try:
                if "action" in body and not room.finished:
                    room.act(int(body["action"]))
                elif body.get("next") and room.finished:
                    room.start_hand()
            except ValueError as e:
                await ws.send_json({"error": str(e)})
                continue
            await ws.send_json(room.snapshot(human))
        return ws

    @routes.post("/room/leave/{room_id}")
    async def room_leave(request):
        rid = request.match_info["room_id"]
        rooms.pop(rid, None)
        return web.json_response({"ok": True})

    @routes.get("/training/status")
    async def training_status(request):
        return web.json_response(forge_status(workdir))

    # --- training observability over the in-memory table + snapshot log
    # (ref: crates/portal/src/training/api.rs — the reference computes
    # these as SQL aggregates over its Postgres blueprint table; ours are
    # numpy aggregates over the occupied rows of the HBM table).

    _host = {}

    def host_table():
        """One-shot host copy of the accumulators (cached; the table is
        immutable while serving)."""
        if not _host:
            t = blueprint.table
            _host["regret"] = np.asarray(t.regret)
            _host["weight"] = np.asarray(t.weight)
            _host["payoff"] = np.asarray(t.payoff)
            _host["visits"] = np.asarray(t.visits)
            _host["key_lo"] = np.asarray(t.key_lo)
            _host["key_hi"] = np.asarray(t.key_hi)
            _host["bucket"] = np.asarray(t.bucket)
            _host["choices"] = np.asarray(t.choices)
            occ = (_host["visits"] > 0) | (_host["key_lo"] != 0) \
                | (_host["key_hi"] != 0)
            _host["occupied"] = np.flatnonzero(occ)
            # an "edge" = a column some accumulator has touched
            touched = (_host["regret"] != 0) | (_host["weight"] != 0) \
                | (_host["payoff"] != 0)
            _host["edge_mask"] = touched
        return _host

    def snapshot_rows():
        log = pathlib.Path(workdir) / "snapshots.jsonl"
        if not log.exists():
            return []
        return [json.loads(l) for l in log.read_text().splitlines() if l]

    @routes.post("/training/snapshots")
    async def training_snapshots(request):
        body = await request.json()
        limit = int(body.get("limit", 20))
        offset = int(body.get("offset", 0))
        rows = snapshot_rows()[::-1]  # newest first, like ORDER BY id DESC
        return web.json_response({"snapshots": rows[offset:offset + limit]})

    @routes.get("/training/stats")
    async def training_stats(request):
        h = host_table()
        occ = h["occupied"]
        if occ.size == 0:
            return web.json_response({"infosets": 0, "edges": 0})
        em = h["edge_mask"][occ]
        reg = h["regret"][occ][em]
        wgt = h["weight"][occ][em]
        pay = h["payoff"][occ][em]
        vis = h["visits"][occ]
        f = float
        return web.json_response({
            "infosets": int(occ.size),
            "edges": int(em.sum()),
            "avg_regret": f(reg.mean()), "max_regret": f(reg.max()),
            "min_regret": f(reg.min()),
            "avg_weight": f(wgt.mean()), "max_weight": f(wgt.max()),
            "avg_payoff": f(pay.mean()), "max_payoff": f(pay.max()),
            "min_payoff": f(pay.min()),
            "avg_visits": f(vis.mean()), "max_visits": int(vis.max()),
            "min_visits": int(vis.min()),
        })

    STREET_NAMES = ["preflop", "flop", "turn", "river"]

    def street_groups(h):
        """Partition occupied rows by the bucket-sidecar street tag.

        The stored word is ``bucket+1`` (0 = legacy checkpoint without
        sidecars → the reference's own '?' arm); the bucket's high byte
        is the street, with proxy-fallback buckets tagged ``street+4``
        (nlhe/abstraction.py) folded back onto their street.
        """
        occ = h["occupied"]
        word = h["bucket"][occ]
        tag = (word - 1) >> 8
        street = np.where(tag < 4, tag, tag - 4)
        groups = [("?", occ[word == 0])]
        for s, name in enumerate(STREET_NAMES):
            groups.append((name, occ[(word > 0) & (street == s)]))
        return [(name, idx) for name, idx in groups if idx.size]

    @routes.get("/training/street-stats")
    async def training_street_stats(request):
        # per-street aggregates from the bucket sidecar (ref: portal
        # training street_stats — SQL GROUP BY on the blueprint's bucket
        # column; ours groups the HBM table's sidecar words)
        h = host_table()
        rows = []
        for name, idx in street_groups(h):
            em = h["edge_mask"][idx]
            reg = h["regret"][idx][em]
            rows.append({
                "street": name,
                "infosets": int(idx.size),
                "edges": int(em.sum()),
                "avg_regret": float(reg.mean()) if reg.size else 0.0,
                "avg_weight": float(h["weight"][idx][em].mean())
                if reg.size else 0.0,
                "avg_payoff": float(h["payoff"][idx][em].mean())
                if reg.size else 0.0,
                "avg_visits": float(h["visits"][idx].mean())
                if idx.size else 0.0,
            })
        return web.json_response({"streets": rows})

    def _rows_payload(h, idx):
        em = h["edge_mask"]
        return [{
            "row": int(i),
            "key_lo": int(h["key_lo"][i]), "key_hi": int(h["key_hi"][i]),
            "visits": int(h["visits"][i]),
            "max_regret": float(np.abs(h["regret"][i]).max()),
            "edges": int(em[i].sum()),
        } for i in idx]

    @routes.post("/training/cold")
    async def training_cold(request):
        body = await request.json()
        limit = int(body.get("limit", 10))
        h = host_table()
        occ = h["occupied"]
        order = occ[np.argsort(h["visits"][occ], kind="stable")[:limit]]
        return web.json_response({"infosets": _rows_payload(h, order)})

    @routes.post("/training/hot")
    async def training_hot(request):
        body = await request.json()
        limit = int(body.get("limit", 10))
        h = host_table()
        occ = h["occupied"]
        mag = np.abs(h["regret"][occ]).max(axis=1)
        order = occ[np.argsort(-mag, kind="stable")[:limit]]
        return web.json_response({"infosets": _rows_payload(h, order)})

    @routes.post("/training/convergence")
    async def training_convergence(request):
        body = await request.json()
        limit = int(body.get("limit", 20))
        rows = snapshot_rows()
        series = []
        prev = None
        for r in rows:
            exploit = r.get("sum_regret")
            if exploit is None:
                continue
            series.append({
                "epoch": r.get("epoch", 0),
                "exploit": exploit,
                "delta": 0.0 if prev is None else exploit - prev,
                "stamped": r.get("time"),
            })
            prev = exploit
        return web.json_response({"convergence": series[::-1][:limit]})

    @routes.get("/training/saturation")
    async def training_saturation(request):
        h = host_table()
        precision = float(np.finfo(np.float32).max)
        max_weight = float(h["weight"].max()) if h["weight"].size else 0.0
        max_regret = float(np.abs(h["regret"]).max()) if h["regret"].size else 0.0
        return web.json_response({
            "max_weight": max_weight,
            "max_regret": max_regret,
            "max_payoff": float(np.abs(h["payoff"]).max()),
            "max_visits": int(h["visits"].max()),
            "precision_f32": precision,
            "weight_pct": max_weight / precision * 100.0,
            "regret_pct": max_regret / precision * 100.0,
        })

    # --- topology query scope (ref: crates/portal/src/topology/api.rs;
    # observation strings use the convert REPL syntax "Ac Kd / 7h 8h 9h")
    from ..deuce.cards import cards_str
    from .convert import _parse_obs, _street_of
    from .topology import Topology

    topo = Topology(artifacts or {}, bucket_fn=getattr(
        blueprint, "bucket_fn", None))

    def obs_of(text: str):
        pocket, board = _parse_obs(text)
        street = _street_of(board)
        n = int((board >= 0).sum())
        return pocket, board[:n], street

    def sample_doc(pocket, board, street, bucket=None, distance=None):
        doc = {
            "obs": f"{cards_str(pocket)} / {cards_str(board)}".strip(" /"),
            "pocket": [int(c) for c in pocket],
            "board": [int(c) for c in board],
            "street": street,
        }
        if bucket is not None:
            doc["bucket"] = int(bucket)
        if distance is not None:
            doc["distance"] = float(distance)
        return doc

    def topo_route(path):
        """POST route whose handler maps LookupError/ValueError → 4xx."""
        def deco(fn):
            async def handler(request):
                body = await request.json()
                try:
                    return web.json_response(fn(body))
                except LookupError as e:
                    return web.json_response({"error": str(e)}, status=404)
                except (ValueError, KeyError, IndexError) as e:
                    return web.json_response({"error": str(e)}, status=400)
            routes.post(path)(handler)
            return handler
        return deco

    @topo_route("/topology/replace-obs")
    def t_replace(body):
        pocket, board, street = obs_of(body["obs"])
        p, b, k = topo.replace_obs(pocket, board, street)
        return sample_doc(p, b, street, bucket=k)

    @topo_route("/topology/exp-wrt-str")
    def t_exp_str(body):
        street = int(body["street"])
        p, b, k = topo.sample(street)
        return sample_doc(p, b, street, bucket=k)

    @topo_route("/topology/exp-wrt-abs")
    def t_exp_abs(body):
        street = int(body["street"])
        p, b, k = topo.sample(street, int(body["abs"]))
        return sample_doc(p, b, street, bucket=k)

    @topo_route("/topology/exp-wrt-obs")
    def t_exp_obs(body):
        pocket, board, street = obs_of(body["obs"])
        k = topo.bucket_of(pocket, board, street)
        return sample_doc(pocket, board, street, bucket=k)

    @topo_route("/topology/nbr-any-abs")
    def t_nbr_any(body):
        street = int(body["street"])
        wrt = int(body["wrt"])
        p, b, k = topo.sample(street, wrt)
        return sample_doc(p, b, street, bucket=k, distance=0.0)

    @topo_route("/topology/nbr-abs-abs")
    def t_nbr_abs(body):
        street = int(body["street"])
        wrt, k = int(body["wrt"]), int(body["abs"])
        p, b, _ = topo.sample(street, k)
        return sample_doc(p, b, street, bucket=k,
                          distance=topo.abs_distance(street, wrt, k))

    @topo_route("/topology/nbr-obs-abs")
    def t_nbr_obs(body):
        pocket, board, street = obs_of(body["obs"])
        wrt = int(body["wrt"])
        d = topo.obs_abs_distance(pocket, board, street, wrt)
        k = topo.bucket_of(pocket, board, street)
        return sample_doc(pocket, board, street, bucket=k, distance=d)

    def _k_neighbors(body, furthest):
        street = int(body["street"])
        wrt = int(body["wrt"])
        n = int(body.get("n", 5))
        rows = []
        for k, d in topo.knn(street, wrt, n=n, furthest=furthest):
            p, b, _ = topo.sample(street, k)
            rows.append(sample_doc(p, b, street, bucket=k, distance=d))
        return {"neighbors": rows}

    @topo_route("/topology/nbr-knn-abs")
    def t_knn(body):
        return _k_neighbors(body, furthest=False)

    @topo_route("/topology/nbr-kfn-abs")
    def t_kfn(body):
        return _k_neighbors(body, furthest=True)

    @topo_route("/topology/nbr-kgn-abs")
    def t_kgn(body):
        wrt = int(body["wrt"])
        rows = []
        for text in body["nbr"]:
            pocket, board, street = obs_of(text)
            d = topo.obs_abs_distance(pocket, board, street, wrt)
            rows.append(sample_doc(pocket, board, street, distance=d))
        return {"neighbors": rows}

    @topo_route("/topology/hst-wrt-abs")
    def t_hst_abs(body):
        street = int(body["street"])
        h = topo.abs_histogram(street, int(body["abs"]))
        return {"street": street, "bucket": int(body["abs"]),
                "histogram": np.round(h, 6).tolist()}

    @topo_route("/topology/hst-wrt-obs")
    def t_hst_obs(body):
        pocket, board, street = obs_of(body["obs"])
        h = topo.obs_histogram(pocket, board, street)
        return {"street": street, "histogram": np.round(h, 6).tolist()}

    @topo_route("/topology/distance")
    def t_distance(body):
        p1, b1, s1 = obs_of(body["obs1"])
        p2, b2, s2 = obs_of(body["obs2"])
        if s1 != s2:
            raise ValueError("observations on different streets")
        return {"street": s1, "distance": topo.obs_distance(p1, b1, p2, b2, s1)}

    @routes.get("/topology/metric/{street}")
    async def topology(request):
        if not artifacts:
            return web.json_response({"error": "no abstraction artifacts"},
                                     status=404)
        street = int(request.match_info["street"])
        art = artifacts.get(street)
        if art is None:
            return web.json_response({"error": f"street {street} missing"},
                                     status=404)
        return web.json_response({
            "street": street,
            "k": int(art.metric.shape[0]),
            "metric": np.round(art.metric, 6).tolist(),
        })

    def _artifact_or_404(request):
        street = int(request.match_info["street"])
        art = (artifacts or {}).get(street)
        return street, art

    @routes.get("/topology/nearby/{street}/{k}")
    async def nearby(request):
        street, art = _artifact_or_404(request)
        if art is None:
            return web.json_response({"error": "no artifact"}, status=404)
        k = int(request.match_info["k"])
        row = np.asarray(art.metric)[k]
        order = np.argsort(row)[1:6]
        return web.json_response({
            "bucket": k,
            "nearest": [{"bucket": int(j), "distance": float(row[j])}
                        for j in order],
        })

    @routes.get("/topology/population/{street}/{k}")
    async def population(request):
        street, art = _artifact_or_404(request)
        if art is None:
            return web.json_response({"error": "no artifact"}, status=404)
        k = int(request.match_info["k"])
        n = int((np.asarray(art.assignment) == k).sum())
        return web.json_response({
            "bucket": k, "points": n, "total": int(len(art.assignment)),
        })

    @routes.post("/litmus/run")
    async def litmus(request):
        payload = await request.json()
        path = payload.get(
            "scenarios",
            str(pathlib.Path(__file__).parent / "scenarios.json"),
        )
        md, ok = litmus_mod.run(blueprint, path)
        return web.json_response({"passed": ok, "report": md})

    @routes.post("/litmus/run/markdown")
    async def litmus_markdown(request):
        payload = await request.json()
        path = payload.get(
            "scenarios",
            str(pathlib.Path(__file__).parent / "scenarios.json"),
        )
        md, ok = litmus_mod.run(blueprint, path)
        return web.Response(text=md, content_type="text/markdown",
                            status=200 if ok else 500)

    app = web.Application()
    app.add_routes(routes)
    if members is not None:
        from .auth import add_auth_routes

        add_auth_routes(app, members)
    return app


def run(blueprint, resolver=None, workdir="artifacts", artifacts=None,
        members=None, host="127.0.0.1", port=8080):
    """Blocking server entry point (ref: portal::run)."""
    from aiohttp import web

    app = build_app(blueprint, resolver, workdir, artifacts, members=members)
    web.run_app(app, host=host, port=port)
