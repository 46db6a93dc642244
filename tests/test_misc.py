"""Lehmer codes, SPR geometry, checkpoints, interrupts, metrics, CLI."""

import itertools
import pathlib

import numpy as np
import pytest

import jax

from robopoker_tpu.deuce.lehmer import decode_deal, encode_deal, lehmer_encode
from robopoker_tpu.kicker import root
from robopoker_tpu.kicker.geometry import spr, spr_bucket
from robopoker_tpu.nlhe import init_table
from robopoker_tpu.pokerkit.regime import FingerprintMismatch, RunConfig, Version
from robopoker_tpu.utils import interrupt, load_table, save_table
from robopoker_tpu.utils.metrics import Metrics


def test_lehmer_roundtrip():
    # every ≤5-permutation reconstructs exactly (ref: lehmer.rs tests)
    for n in (2, 3, 5):
        for perm in itertools.permutations(range(10, 10 + n)):
            code, sorted_cards = encode_deal(list(perm))
            assert 0 <= code < 120
            assert decode_deal(code, sorted_cards) == list(perm)


def test_spr_buckets():
    s = root(jax.random.PRNGKey(0), 4)
    # pot 3, effective 198 → deep
    assert np.asarray(spr(s))[0] == pytest.approx(198 / 3)
    assert np.asarray(spr_bucket(s)).tolist() == [3, 3, 3, 3]


def test_checkpoint_roundtrip(tmp_path):
    table = init_table(10)
    cfg = RunConfig()
    path = tmp_path / "bp.npz"
    save_table(path, table, cfg)
    loaded = load_table(path, cfg)
    assert np.array_equal(np.asarray(loaded.regret), np.asarray(table.regret))
    assert (tmp_path / "snapshots.jsonl").exists()
    # fingerprint guard refuses a different config
    with pytest.raises(FingerprintMismatch):
        load_table(path, RunConfig(version=Version.V1))


def test_interrupt_deadline():
    interrupt.reset()
    interrupt.install(train_duration_s=0.0)
    assert interrupt.interrupted()
    interrupt.reset()
    assert not interrupt.interrupted()


def test_metrics_registry():
    records = []
    m = Metrics(sink=records.append, log_interval_s=0.0)
    m.inc("mccfr_steps", 5)
    m.set("mccfr_sum_regret", 1.25)
    with pytest.raises(KeyError):
        m.inc("typo_metric")
    rec = m.maybe_log(force=True)
    assert rec["mccfr_steps"] == 5
    assert records


def test_cli_status_reset(tmp_path):
    from robopoker_tpu.cli import main

    assert main(["status", "--workdir", str(tmp_path)]) == 0
    assert main(["reset", "--workdir", str(tmp_path)]) == 0


def test_compact_checkpoint_roundtrip(tmp_path):
    import numpy as np
    import jax.numpy as jnp

    from robopoker_tpu.nlhe.table import init_table
    from robopoker_tpu.pokerkit.regime import RunConfig
    from robopoker_tpu.utils.checkpoint import load_compact, save_compact

    t = init_table(12)
    # scatter some occupied rows
    rows = jnp.asarray([3, 77, 4000])
    t = t._replace(
        regret=t.regret.at[rows, 2].set(5.0),
        weight=t.weight.at[rows, 1].set(0.25),
        visits=t.visits.at[rows].set(7),
        key_lo=t.key_lo.at[rows].set(jnp.asarray([11, 22, 33])),
        key_hi=t.key_hi.at[rows].set(jnp.asarray([44, 55, 66])),
        epoch=jnp.asarray(42, jnp.int32),
    )
    cfg = RunConfig()
    save_compact(tmp_path / "bp.npz", t, cfg)
    t2 = load_compact(tmp_path / "bp.npz", cfg)
    for a, b in zip(t, t2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
