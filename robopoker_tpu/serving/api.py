"""HTTP serving API.

TPU-native counterpart of the reference's ``portal`` actix server
(ref: crates/portal/src/lib.rs:96-184): the same REST scope layout over
aiohttp —

- GET  /health                    liveness
- POST /strategy/policy           blueprint policy for a witness
- POST /strategy/full             subgame-resolved policy (adapt_full)
- GET  /training/status           snapshot log summary
- GET  /topology/metric/{street}  centroid distance rows
- GET  /topology/nearby/{street}/{k}      nearest centroids of bucket k
- GET  /topology/population/{street}/{k}  artifact points in bucket k
- POST /litmus/run                run the scenario harness

Auth (the reference's bouncer JWT/Argon2 stack) is serving-only infra
and intentionally out of scope for the solver framework; endpoints are
unauthenticated here.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np


def build_app(blueprint, resolver=None, workdir="artifacts", artifacts=None):
    """Construct the aiohttp Application (caller runs it)."""
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

    @routes.post("/strategy/full")
    async def full(request):
        payload = await request.json()
        if resolver is None:
            return web.json_response({"error": "no resolver configured"},
                                     status=400)
        dist = resolver.distribution(witness_of(payload))
        return web.json_response({"policy": [float(x) for x in dist]})

    @routes.get("/training/status")
    async def training_status(request):
        return web.json_response(forge_status(workdir))

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

    app = web.Application()
    app.add_routes(routes)
    return app


def run(blueprint, resolver=None, workdir="artifacts", artifacts=None,
        host="127.0.0.1", port=8080):
    """Blocking server entry point (ref: portal::run)."""
    from aiohttp import web

    app = build_app(blueprint, resolver, workdir, artifacts)
    web.run_app(app, host=host, port=port)
