"""Serving layer tests: policy stack, parlor engine, litmus, AIVAT,
slumbot translation, HTTP API."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robopoker_tpu.mccfr import LINEAR_REGRET, LINEAR_WEIGHT, PLURIBUS_SAMPLING
from robopoker_tpu.nlhe import TrainerConfig, init_table, make_nlhe_step, proxy_bucket
from robopoker_tpu.serving import (
    Agent,
    Benchmark,
    Blueprint,
    Engine,
    HandRecord,
    Session,
    Witness,
    litmus,
    slumbot,
)
from robopoker_tpu.serving.aivat import Aivat


@pytest.fixture(scope="module")
def blueprint():
    cfg = TrainerConfig(batch=8, level_cap=32, cap=128, max_levels=3,
                        roll_steps=4, tail_steps=8, table_log2=14)
    table = init_table(14)
    step = make_nlhe_step(proxy_bucket, LINEAR_REGRET, LINEAR_WEIGHT,
                          PLURIBUS_SAMPLING, cfg)
    for _ in range(4):
        table, _ = step(table, jax.random.PRNGKey(0))
    return Blueprint(table)


def test_blueprint_distribution_is_valid(blueprint):
    w = Witness(hero_seat=0, hero_hole=np.array([48, 49]), events=[])
    d = blueprint.distribution(w)
    assert d.shape == (9,)
    assert abs(d.sum() - 1.0) < 1e-5
    assert d[1] == 0.0  # check illegal facing the blind


def test_parlor_plays_full_hands(blueprint):
    agents = [Agent(blueprint, use_dirac=False, seed=s) for s in (0, 1)]
    engine = Engine(agents, seed=3)
    pnl = engine.play(4)
    assert pnl.shape == (4, 2)
    assert np.allclose(pnl.sum(axis=1), 0.0)       # zero-sum
    assert (np.abs(pnl) <= 200).all()              # bounded by stacks


def test_litmus_grid_integrity(blueprint):
    import pathlib

    doc = litmus.load(
        pathlib.Path("robopoker_tpu/serving/scenarios.json")
    )
    results = litmus.evaluate(blueprint, doc)
    assert len(results) == 48  # round-2 expanded matrix
    # grid-slot integrity must always hold, trained or not
    for r in results:
        if r.category == "integrity":
            assert r.passed, r
    md = litmus.render(results)
    assert "Litmus report" in md


def test_slumbot_translation():
    assert slumbot.to_local(20_000) == 400
    assert slumbot.to_slumbot(400) == 20_000
    acts = slumbot.parse_actions("b300c/kk/b100b300c/k")
    assert acts[0] == ("bet", 300, 0)
    assert acts[1] == ("call", 0, 0)
    assert acts[2] == ("check", 0, 1)
    assert acts[4] == ("bet", 100, 2)
    assert slumbot.render_action("bet", 4) == "b200"
    assert slumbot.render_action("fold") == "f"


def test_slumbot_session_with_fake_transport():
    script = iter([
        {"token": "t1", "action": "", "winnings_pending": True},
        {"token": "t1", "winnings": 150},
        {"token": "t1", "action": ""},
        {"token": "t1", "winnings": -100},
    ])

    class FoldBot:
        def decide_slumbot(self, state):
            return "f"

    session = Session(transport=lambda ep, payload: next(script), agent=FoldBot())
    session.play_hand()
    session.play_hand()
    s = session.benchmark.summary()
    assert s["hands"] == 2
    assert s["bb_per_100"] == pytest.approx((1.5 - 1.0) / 2 * 100)


def test_aivat_zero_sum_sanity(blueprint):
    # corrections leave the estimator mean near the raw mean for a
    # symmetric batch of hands, and never produce NaN
    hands = [
        HandRecord(hero_seat=0, hero_hole=np.array([48, 49]),
                   events=[("col", 2, 0), ("col", 1, 1)], chips_won=2.0),
        HandRecord(hero_seat=1, hero_hole=np.array([0, 5]),
                   events=[("col", 2, 0), ("col", 1, 1)], chips_won=-2.0),
    ]
    a = Aivat(blueprint.table, proxy_bucket)
    delta = a.evaluate(hands)
    assert delta.n_hands == 2
    assert np.isfinite(delta.aivat_mean)
    assert np.isfinite(delta.reduction)


def test_http_api(blueprint):
    from aiohttp.test_utils import TestClient, TestServer, loop_context

    from robopoker_tpu.serving.api import build_app

    with loop_context() as loop:
        app = build_app(blueprint)

        async def drive():
            server = TestServer(app)
            client = TestClient(server)
            await client.start_server()
            r = await client.get("/health")
            assert (await r.json())["ok"] is True
            r = await client.post("/strategy/policy", json={
                "hero_seat": 0, "hero_hole": [48, 49], "events": [],
            })
            body = await r.json()
            assert len(body["policy"]) == 9
            assert abs(sum(body["policy"]) - 1.0) < 1e-4
            r = await client.get("/training/status")
            assert r.status == 200
            r = await client.get("/topology/nearby/2/0")
            assert r.status == 404  # no artifacts wired in this app
            await client.close()

        loop.run_until_complete(drive())


def test_http_training_scope(blueprint, tmp_path):
    from aiohttp.test_utils import TestClient, TestServer, loop_context

    from robopoker_tpu.serving.api import build_app

    # a two-row snapshot log so snapshots/convergence have history
    log = tmp_path / "snapshots.jsonl"
    log.write_text(
        json.dumps({"time": 1.0, "epoch": 10, "sum_regret": 100.0}) + "\n"
        + json.dumps({"time": 2.0, "epoch": 20, "sum_regret": 60.0}) + "\n"
    )

    with loop_context() as loop:
        app = build_app(blueprint, workdir=str(tmp_path))

        async def drive():
            server = TestServer(app)
            client = TestClient(server)
            await client.start_server()

            r = await client.post("/training/snapshots",
                                  json={"limit": 1, "offset": 0})
            snaps = (await r.json())["snapshots"]
            assert len(snaps) == 1 and snaps[0]["epoch"] == 20  # newest first

            r = await client.get("/training/stats")
            stats = await r.json()
            assert stats["infosets"] > 0
            assert stats["edges"] >= stats["infosets"]  # ≥1 edge per infoset
            assert stats["max_visits"] >= stats["min_visits"] >= 1

            r = await client.get("/training/street-stats")
            streets = (await r.json())["streets"]
            names = [s["street"] for s in streets]
            # sidecar words give exact attribution: every trainer-claimed
            # row lands on a real street (the '?' arm is legacy-only) and
            # a 3-level tiny run always visits preflop
            assert "?" not in names and "preflop" in names
            assert sum(s["infosets"] for s in streets) == stats["infosets"]

            r = await client.get("/strategy/grid-usage")
            usage = (await r.json())["usage"]
            assert {u["street"] for u in usage} == set(names)
            assert all(0.0 <= u["avg_freq"] <= 1.0 for u in usage)

            r = await client.post("/training/cold", json={"limit": 3})
            cold = (await r.json())["infosets"]
            assert len(cold) == 3
            assert cold[0]["visits"] <= cold[-1]["visits"]

            r = await client.post("/training/hot", json={"limit": 3})
            hot = (await r.json())["infosets"]
            assert hot[0]["max_regret"] >= hot[-1]["max_regret"]

            r = await client.post("/training/convergence", json={"limit": 5})
            conv = (await r.json())["convergence"]
            assert conv[0]["epoch"] == 20
            assert conv[0]["delta"] == pytest.approx(-40.0)

            r = await client.get("/training/saturation")
            sat = await r.json()
            assert sat["max_regret"] > 0
            assert 0 <= sat["regret_pct"] < 1.0  # far from f32 saturation

            await client.close()

        loop.run_until_complete(drive())


def test_http_strategy_scope(blueprint):
    from aiohttp.test_utils import TestClient, TestServer, loop_context

    from robopoker_tpu.serving.api import build_app
    from robopoker_tpu.subgame import ResolveConfig

    tiny = ResolveConfig(batch=8, level_cap=16, cap=64, max_levels=3,
                         roll_steps=2, table_log2=10)
    with loop_context() as loop:
        app = build_app(blueprint, resolve_config=tiny)

        async def drive():
            client = TestClient(TestServer(app))
            await client.start_server()
            w = {"hero_seat": 0, "hero_hole": [48, 49], "events": []}

            r = await client.post("/strategy/range", json=w)
            entries = (await r.json())["entries"]
            assert len(entries) > 1000          # preflop: most holes live
            weights = [e["weight"] for e in entries]
            assert abs(sum(weights) - 1.0) < 1e-4
            assert all(48 not in e["obs"] and 49 not in e["obs"]
                       for e in entries)        # hero's cards removed

            r = await client.post("/strategy/signalled", json=w)
            sig = (await r.json())["entries"]
            assert len(sig) > 1000
            assert abs(sum(e["weight"] for e in sig) - 1.0) < 1e-4
            # signalled range is over HERO's holes: no observer-hole
            # removal, so hero's actual cards may appear
            assert any(48 in e["obs"] or 49 in e["obs"] for e in sig)

            r = await client.get("/strategy/grid-usage")
            usage = (await r.json())["usage"]
            assert len(usage) % 9 == 0 and len(usage) >= 9  # 9 per street
            for u in usage:
                assert u["street"] in ("preflop", "flop", "turn", "river")
                assert 0.0 <= u["avg_freq"] <= 1.0
                assert 0.0 <= u["weighted_freq"] <= 1.0

            r = await client.post("/strategy/depth",
                                  json={**w, "budget_ms": 200})
            body = await r.json()
            assert body["kind"] == "depth"
            assert body["iterations"] >= 1
            assert abs(sum(body["policy"]) - 1.0) < 1e-4

            await client.close()

        loop.run_until_complete(drive())


def test_http_gameplay_scope(blueprint, tmp_path):
    from aiohttp.test_utils import TestClient, TestServer, loop_context

    from robopoker_tpu.serving.api import build_app
    from robopoker_tpu.serving.records import HandLog

    agents = [Agent(blueprint, use_dirac=False, seed=s) for s in (4, 5)]
    engine = Engine(agents, seed=11)
    log = HandLog(tmp_path / "hands.jsonl")
    for i in range(3):
        log.append(engine.play_hand(i), i)

    with loop_context() as loop:
        app = build_app(blueprint, workdir=str(tmp_path))

        async def drive():
            client = TestClient(TestServer(app))
            await client.start_server()

            r = await client.post("/gameplay/summary", json={"hero_seat": 0})
            body = await r.json()
            assert body["hands"] == 3
            assert np.isfinite(body["bb_per_100"])

            r = await client.post("/gameplay/aivat", json={"hero_seat": 0})
            body = await r.json()
            assert body["hands"] == 3
            assert np.isfinite(body["aivat_mean"])

            r = await client.get("/gameplay/hand/1")
            assert (await r.json())["hand_id"] == 1
            r = await client.get("/gameplay/hand/9")
            assert r.status == 404

            await client.close()

        loop.run_until_complete(drive())


def test_http_room_websocket(blueprint):
    from aiohttp.test_utils import TestClient, TestServer, loop_context

    from robopoker_tpu.serving.api import build_app

    with loop_context() as loop:
        app = build_app(blueprint)

        async def drive():
            client = TestClient(TestServer(app))
            await client.start_server()

            r = await client.post("/room/start", json={
                "seats": 2, "human_seat": 0, "variant": "dirac", "seed": 7,
            })
            rid = (await r.json())["room_id"]

            ws = await client.ws_connect(f"/room/enter/{rid}")
            snap = await ws.receive_json()
            assert snap["seat"] == 0
            assert len(snap["hole"]) == 2
            # drive the hand to completion acting first-legal each turn
            for _ in range(40):
                if snap["finished"]:
                    break
                assert snap["to_act"] == 0 and "legal" in snap
                col = snap["legal"].index(True)
                await ws.send_json({"action": col})
                snap = await ws.receive_json()
            assert snap["finished"]
            assert "pnl" in snap and len(snap["pnl"]) == 2

            # next hand deals fresh
            await ws.send_json({"next": True})
            snap = await ws.receive_json()
            assert snap["hand_id"] == 1
            await ws.close()

            r = await client.post(f"/room/leave/{rid}")
            assert (await r.json())["ok"] is True
            await client.close()

        loop.run_until_complete(drive())


def test_http_topology_with_artifacts(blueprint):
    from aiohttp.test_utils import TestClient, TestServer, loop_context

    from robopoker_tpu.serving.api import build_app

    class Art:
        metric = np.abs(np.arange(8)[:, None] - np.arange(8)[None, :]
                        ).astype(np.float32)
        assignment = np.array([0, 0, 1, 2, 2, 2, 7, 7])

    with loop_context() as loop:
        app = build_app(blueprint, artifacts={2: Art()})

        async def drive():
            server = TestServer(app)
            client = TestClient(server)
            await client.start_server()
            r = await client.get("/topology/nearby/2/0")
            body = await r.json()
            assert body["nearest"][0] == {"bucket": 1, "distance": 1.0}
            r = await client.get("/topology/population/2/2")
            assert (await r.json())["points"] == 3
            r = await client.get("/topology/metric/2")
            assert (await r.json())["k"] == 8
            await client.close()

        loop.run_until_complete(drive())


def test_http_topology_query_scope(blueprint):
    """The reference-named topology POST routes against the real
    artifacts (skipped if the abstraction dir is absent)."""
    import pathlib

    art_dir = pathlib.Path(__file__).parent.parent / "artifacts" / "abstraction"
    if not art_dir.exists():
        pytest.skip("no abstraction artifacts in checkout")

    from aiohttp.test_utils import TestClient, TestServer, loop_context

    from robopoker_tpu.lloyd.pipeline import load_street_artifacts
    from robopoker_tpu.nlhe.abstraction import LookupBucket
    from robopoker_tpu.serving.api import build_app
    from robopoker_tpu.serving.policy import Blueprint
    from robopoker_tpu.nlhe import init_table

    arts = load_street_artifacts(art_dir)
    if arts.get(2) is None or arts[2].pocket is None:
        pytest.skip("artifacts lack backfilled points")
    bp = Blueprint(init_table(12), bucket_fn=LookupBucket.load(art_dir))

    # an observation guaranteed covered by the (partial) artifact: one of
    # its own training points
    from robopoker_tpu.deuce.cards import cards_str

    p0, b0 = arts[2].pocket[17], arts[2].board[17]
    obs = f"{cards_str(p0)} / {cards_str(b0)}"
    obs_bucket = int(arts[2].assignment[17])

    with loop_context() as loop:
        app = build_app(bp, artifacts=arts)

        async def drive():
            client = TestClient(TestServer(app))
            await client.start_server()

            r = await client.post("/topology/exp-wrt-abs",
                                  json={"street": 2, "abs": 7})
            body = await r.json()
            assert body["bucket"] == 7 and len(body["pocket"]) == 2
            assert len(body["board"]) == 4        # turn board

            r = await client.post("/topology/exp-wrt-str", json={"street": 1})
            assert len((await r.json())["board"]) == 3

            r = await client.post("/topology/exp-wrt-obs", json={"obs": obs})
            got = await r.json()
            assert got["street"] == 2 and got["bucket"] == obs_bucket

            r = await client.post("/topology/replace-obs", json={"obs": obs})
            rep = await r.json()
            assert rep["bucket"] >= 0 and rep["obs"] != ""

            r = await client.post("/topology/nbr-knn-abs",
                                  json={"street": 2, "wrt": 7, "n": 3})
            knn = (await r.json())["neighbors"]
            assert len(knn) == 3
            assert knn[0]["distance"] <= knn[-1]["distance"]
            r = await client.post("/topology/nbr-kfn-abs",
                                  json={"street": 2, "wrt": 7, "n": 3})
            kfn = (await r.json())["neighbors"]
            assert kfn[0]["distance"] >= knn[0]["distance"]

            r = await client.post("/topology/nbr-abs-abs",
                                  json={"street": 2, "wrt": 7,
                                        "abs": knn[0]["bucket"]})
            assert (await r.json())["distance"] == pytest.approx(
                knn[0]["distance"])

            r = await client.post("/topology/hst-wrt-abs",
                                  json={"street": 2, "abs": 7})
            h = (await r.json())["histogram"]
            assert len(h) == 101 and abs(sum(h) - 1.0) < 1e-3

            r = await client.post("/topology/hst-wrt-obs", json={"obs": obs})
            h = (await r.json())["histogram"]
            assert len(h) == 101 and abs(sum(h) - 1.0) < 1e-3

            r = await client.post("/topology/nbr-obs-abs",
                                  json={"obs": obs, "wrt": 7})
            assert (await r.json())["distance"] >= 0.0

            r = await client.post("/topology/nbr-kgn-abs",
                                  json={"street": 2, "wrt": 7, "nbr": [obs]})
            assert len((await r.json())["neighbors"]) == 1

            r = await client.post("/topology/distance", json={
                "obs1": "Ah Kh / 7h 8h 9h 2c",
                "obs2": "2c 7d / Jh 8s 3h 2d",
            })
            strong_vs_weak = (await r.json())["distance"]
            assert strong_vs_weak > 0.0
            r = await client.post("/topology/distance", json={
                "obs1": obs, "obs2": obs,
            })
            assert (await r.json())["distance"] == pytest.approx(0.0, abs=1e-5)

            # cross-street distance → 400
            r = await client.post("/topology/distance", json={
                "obs1": obs, "obs2": "2c 7d / Jh 8s 3h",
            })
            assert r.status == 400

            await client.close()

        loop.run_until_complete(drive())


def test_records_roundtrip_and_aivat_bridge(blueprint, tmp_path):
    from robopoker_tpu.serving.records import HandLog, from_wire, to_aivat, to_wire

    agents = [Agent(blueprint, use_dirac=False, seed=s) for s in (2, 3)]
    engine = Engine(agents, seed=9)
    log = HandLog(tmp_path / "hands.jsonl")
    for i in range(3):
        log.append(engine.play_hand(i), i)
    loaded = log.load()
    assert len(loaded) == 3
    assert np.allclose(loaded[0].pnl.sum(), 0.0)

    # replay-reconstruct for AIVAT: actors annotated, bb-scaled winnings
    recs = [to_aivat(r, hero_seat=0) for r in loaded]
    assert all(isinstance(r.chips_won, float) for r in recs)
    a = Aivat(blueprint.table, __import__(
        "robopoker_tpu.nlhe.abstraction", fromlist=["proxy_bucket"]
    ).proxy_bucket)
    delta = a.evaluate(recs)
    assert delta.n_hands == 3
    assert np.isfinite(delta.aivat_mean)


def test_slumbot_agent_full_hand(blueprint):
    from robopoker_tpu.serving.slumbot import SlumbotAgent

    agent = SlumbotAgent(blueprint, use_dirac=True)
    # preflop: hero BTN first to act, nothing yet
    tok = agent.decide_slumbot({
        "client_pos": 1, "hole_cards": ["Ac", "As"], "board": [],
        "action": "",
    })
    assert tok[0] in "fckb"
    # facing an opponent 3x raise after our call
    tok = agent.decide_slumbot({
        "client_pos": 1, "hole_cards": ["Ac", "As"], "board": [],
        "action": "cb300",
    })
    assert tok[0] in "fckb"
    # postflop spot with board cards and an off-grid bet to translate
    tok = agent.decide_slumbot({
        "client_pos": 1, "hole_cards": ["Ac", "As"],
        "board": ["Kd", "7h", "2c"],
        "action": "cc/b137",
    })
    assert tok[0] in "fckb"
    if tok.startswith("b"):
        assert int(tok[1:]) % 50 == 0  # slumbot chip scale


def test_aivat_variance_reduction_on_selfplay(blueprint):
    """AIVAT must actually reduce variance (>1x) on blueprint self-play —
    both players play the blueprint, so skill is exactly zero and every
    chip of spread is luck the control variates should absorb
    (ref: crates/arena/src/lib.rs:4-5 '10-44x')."""
    from robopoker_tpu.kicker import MENU_PLURIBUS, edges as E, game as G
    from robopoker_tpu.mccfr.engine import averaged
    from robopoker_tpu.nlhe.table import make_key, probe_rows
    from robopoker_tpu.serving.aivat import Aivat, HandRecord

    table = blueprint.table
    menu = jnp.asarray(MENU_PLURIBUS)
    rng = np.random.default_rng(11)

    def node_sigma(state):
        idx = G.actor_idx(state)
        hole = jnp.take_along_axis(
            state.hole, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        bucket = proxy_bucket(hole.astype(jnp.int32),
                              state.board.astype(jnp.int32), state.street)
        legal = G.legal_cols(state, menu)
        cmask = (legal * (1 << jnp.arange(9))).sum(axis=1).astype(jnp.int32)
        klo, khi = make_key(bucket, G.packed_subgame(state), cmask)
        row, _ = probe_rows(table.key_lo, table.key_hi, klo, khi)
        return np.asarray(averaged(table.weight[row], legal))[0]

    hands = []
    for h in range(48):
        state = G.root(jax.random.PRNGKey(1000 + h), 1)
        hero_hole = np.asarray(state.hole)[0, 0].copy()
        villain_hole = np.asarray(state.hole)[0, 1].copy()
        events = []
        for _ in range(40):
            t = int(np.asarray(G.turn_of(state))[0])
            if t == G.TURN_TERMINAL:
                break
            if t == G.TURN_CHANCE:
                before = set(int(c) for c in np.asarray(state.board)[0] if c >= 0)
                state = G.deal_board(state, jax.random.fold_in(
                    jax.random.PRNGKey(2000 + h), len(events)))
                after = [int(c) for c in np.asarray(state.board)[0] if c >= 0]
                events.append(("deal", [c for c in after if c not in before]))
                continue
            sigma = node_sigma(state)
            col = int(rng.choice(9, p=sigma / sigma.sum()))
            events.append(("col", col, t))
            state = G.apply_cols(state, jnp.asarray([col]), menu,
                                 jnp.asarray([True]))
        pnl = float(np.asarray(G.settle(state))[0, 0])
        hands.append(HandRecord(hero_seat=0, hero_hole=hero_hole,
                                events=events, chips_won=pnl,
                                villain_hole=villain_hole))

    a = Aivat(table, proxy_bucket)
    delta = a.evaluate(hands)
    assert np.isfinite(delta.aivat_mean)
    # the whole point: corrected variance strictly below raw variance
    assert delta.reduction > 1.0, f"no variance reduction: {delta.reduction}"
    assert delta.aivat_stderr < delta.raw_stderr


def test_aivat_batched_selfplay_reduction(blueprint):
    """Batched lockstep self-play AIVAT (aivat.selfplay_delta): zero
    true skill, corrections absorb luck — reduction > 1 and the
    corrected mean stays near zero relative to raw spread."""
    from robopoker_tpu.serving.aivat import selfplay_delta

    d = selfplay_delta(blueprint.table, proxy_bucket, n_hands=256,
                       batch=64, seed=3)
    assert d.n_hands > 200
    assert np.isfinite(d.aivat_mean) and np.isfinite(d.reduction)
    # the fitted control-variate coefficient floors the estimator at
    # raw (alpha* -> 0 when the learned baselines carry no signal), so
    # the invariant is never-worse rather than strictly-better — strict
    # gains need a converged blueprint (measured by scripts/aivat_bench)
    assert d.reduction >= 0.98, f"worse than raw: {d.reduction}"
    assert d.aivat_stderr <= d.raw_stderr * 1.01


def test_match_delta_selfmatch_is_fair_and_zero_sum(blueprint):
    """A-vs-A through the variant-arena path must measure ~0 skill (the
    seat swap cancels position) and agree with the zero-mean contract of
    every correction channel."""
    from robopoker_tpu.serving.aivat import match_delta

    d = match_delta(blueprint.table, blueprint.table, proxy_bucket,
                    n_hands=512, batch=128, seed=3)
    assert d.n_hands >= 500
    # true skill is exactly 0; allow 3 stderr
    assert abs(d.aivat_mean) <= 3.0 * max(d.aivat_stderr, 1e-9)
    assert d.reduction > 0.5  # the fit can't blow variance up


def test_match_delta_trained_beats_uniform(blueprint):
    """A briefly-trained table should beat an untrained (uniform) one,
    and dirac selection must run through the same program."""
    from robopoker_tpu.serving.aivat import match_delta

    fresh = init_table(14)
    d = match_delta(blueprint.table, fresh, proxy_bucket,
                    n_hands=768, batch=128, seed=5)
    assert d.aivat_mean > 0, (
        f"trained table should win: {d.aivat_mean} ± {d.aivat_stderr}")
    dd = match_delta(blueprint.table, fresh, proxy_bucket,
                     n_hands=256, batch=128, seed=6, dirac_a=True)
    assert dd.n_hands >= 250


def test_aivat_publication_guard_never_inflates():
    """VERDICT r4 #5: no publishing path may emit an AIVAT column with
    reduction < 1. guard_corrected must fall back to raw whenever the
    corrected column's variance is worse (the r4 jsonl shipped a 0.756
    point through the LBR path, which had no final guard)."""
    from robopoker_tpu.serving.aivat import _fit_delta, guard_corrected

    rng = np.random.default_rng(3)
    raw = rng.normal(size=512)
    # an "anti-correction" that doubles the variance
    inflating = raw + rng.normal(scale=2.0, size=512)
    col, red, fell_back = guard_corrected(raw, inflating)
    assert fell_back and red == 1.0
    assert np.array_equal(col, raw)
    # a genuinely good correction passes through untouched
    good = raw * 0.1 + rng.normal(scale=0.05, size=512)
    col, red, fell_back = guard_corrected(raw, good)
    assert not fell_back and red > 1.0
    assert np.array_equal(col, good)
    # end-to-end: _fit_delta with pure-noise channels must report
    # reduction >= 1.0 (the cross-fit can only break even, never inflate)
    X = rng.normal(scale=3.0, size=(512, 3))
    d = _fit_delta(raw, X)
    assert d.reduction >= 1.0
