"""convert REPL command tests (pure `handle` dispatcher)."""

import numpy as np
import pytest

from robopoker_tpu.nlhe.abstraction import proxy_bucket
from robopoker_tpu.serving.convert import handle

CTX = {"bucket_fn": proxy_bucket, "artifacts": {}}


def test_help_and_unknown():
    assert "abstraction" in handle("help", CTX)
    assert "unknown" in handle("frobnicate 12", CTX)
    assert handle("", CTX) == ""


def test_edge_and_path_roundtrip():
    from robopoker_tpu.kicker import edges as E

    packed = E.pack_path([E.COL_CHECK, E.COL_CALL])
    out = handle(f"path {packed}", CTX)
    assert "->" in out
    assert handle("edge 0", CTX) == E.edge_name(0)


def test_abstraction_and_equity_river():
    out = handle("abstraction Ac Kd / 7h 8h 9h 2c 2d", CTX)
    assert "street 3" in out and "bucket" in out
    eq = handle("equity Ah Ad / Ac As 2d 7h 9s", CTX)
    # quads: near-certain equity
    val = float(eq.split()[1])
    assert val > 0.99


def test_equity_mc_preflop():
    out = handle("equity Ah Ad /", CTX)
    val = float(out.split()[1])
    assert 0.7 < val < 0.95  # aces preflop ~0.85


def test_distance_same_street_and_mismatch():
    d = handle("distance Ah Ad / Ac As 2d 7h 9s ; 2h 3d / Ac As 2d 7h 9s",
               CTX)
    assert float(d.split()[1]) > 0.3
    err = handle("distance Ah Ad / ; 2h 3d / Ac As 2d", CTX)
    assert "error" in err


def test_isomorphism_stable_under_suit_permutation():
    a = handle("isomorphism Ac Kd / 7h 8h 9h", CTX)
    b = handle("isomorphism Ad Kc / 7s 8s 9s", CTX)
    assert a == b


def test_turn_distance_self_is_zero():
    d = handle("distance Ah Ad / Ac As 2d 7h ; Ah Ad / Ac As 2d 7h", CTX)
    assert float(d.split()[1]) == pytest.approx(0.0, abs=1e-6)
