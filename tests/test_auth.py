"""Auth tests: credential hashing, token lifecycle, protected routes."""

import numpy as np
import pytest

import jax

from robopoker_tpu.nlhe import init_table
from robopoker_tpu.serving.auth import Members, add_auth_routes
from robopoker_tpu.serving.policy import Blueprint


@pytest.fixture()
def members(tmp_path, monkeypatch):
    import robopoker_tpu.serving.auth as auth_mod

    monkeypatch.setattr(auth_mod, "PBKDF2_ROUNDS", 100)  # fast for tests
    return Members(tmp_path / "members.json")


def test_register_login_tokens(members):
    assert members.register("alice", "hunter2")
    assert not members.register("alice", "other")  # duplicate
    assert members.verify("alice", "hunter2")
    assert not members.verify("alice", "wrong")
    assert not members.verify("bob", "hunter2")
    tok = members.issue("alice")
    assert members.validate(tok) == "alice"
    assert members.validate(tok + "x") is None
    assert members.validate("garbage") is None
    expired = members.issue("alice", ttl_s=-1)
    assert members.validate(expired) is None


def test_protected_routes(members, tmp_path):
    from aiohttp.test_utils import TestClient, TestServer, loop_context

    from robopoker_tpu.serving.api import build_app

    bp = Blueprint(init_table(12))
    with loop_context() as loop:
        app = build_app(bp)
        add_auth_routes(app, members)

        async def drive():
            client = TestClient(TestServer(app))
            await client.start_server()
            # open endpoint: fine without a token
            r = await client.get("/health")
            assert r.status == 200
            # protected endpoint: 401 without a token
            r = await client.post("/strategy/policy", json={
                "hero_seat": 0, "hero_hole": [0, 5], "events": [],
            })
            assert r.status == 401
            # register → token → authorized
            r = await client.post("/auth/register", json={
                "username": "bob", "password": "pw",
            })
            tok = (await r.json())["token"]
            r = await client.post(
                "/strategy/policy",
                json={"hero_seat": 0, "hero_hole": [0, 5], "events": []},
                headers={"Authorization": f"Bearer {tok}"},
            )
            assert r.status == 200
            r = await client.get("/auth/me",
                                 headers={"Authorization": f"Bearer {tok}"})
            assert (await r.json())["user"] == "bob"
            await client.close()

        loop.run_until_complete(drive())
