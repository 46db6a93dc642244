"""NLHE blueprint trainer smoke + invariant tests (small configs)."""

import numpy as np
import pytest

import jax

from robopoker_tpu.mccfr import (
    EXTERNAL_SAMPLING,
    LINEAR_REGRET,
    LINEAR_WEIGHT,
    PLURIBUS_SAMPLING,
)
from robopoker_tpu.nlhe import (
    TrainerConfig,
    init_table,
    make_nlhe_step,
    proxy_bucket,
)

CFG = TrainerConfig(
    batch=8, level_cap=32, cap=128, max_levels=4,
    roll_steps=4, tail_steps=8, table_log2=14,
)


@pytest.fixture(scope="module")
def stepped():
    table = init_table(CFG.table_log2)
    step = make_nlhe_step(
        proxy_bucket, LINEAR_REGRET, LINEAR_WEIGHT, PLURIBUS_SAMPLING, CFG
    )
    metrics = None
    for i in range(6):
        table, metrics = step(table, jax.random.PRNGKey(0))
    return table, metrics


def test_trees_grow_and_update(stepped):
    table, metrics = stepped
    assert int(metrics["nodes"]) > 8          # more than just roots
    assert int(metrics["touched_rows"]) > 0
    assert int(table.epoch) == 6
    nz = (np.abs(np.asarray(table.regret)).sum(axis=1) > 0).sum()
    assert nz > 50  # many infoset rows learning


def test_weights_accumulate_on_legal_only(stepped):
    table, _ = stepped
    w = np.asarray(table.weight)
    r = np.asarray(table.regret)
    # weight rows touched imply regret rows touched (same occupancy source)
    touched_w = (w.sum(axis=1) > 0)
    assert touched_w.sum() > 0
    # visits counted where occupied
    v = np.asarray(table.visits)
    assert (v[touched_w] > 0).all()


def test_determinism():
    def run():
        table = init_table(CFG.table_log2)
        step = make_nlhe_step(
            proxy_bucket, LINEAR_REGRET, LINEAR_WEIGHT, EXTERNAL_SAMPLING, CFG
        )
        for i in range(3):
            table, _ = step(table, jax.random.PRNGKey(7))
        return np.asarray(table.regret)

    a, b = run(), run()
    assert np.array_equal(a, b)


def test_segmented_levels_train():
    """The unrolled per-level-width driver learns like the while_loop one:
    generous caps ⇒ zero drops; table rows accumulate regret."""
    from robopoker_tpu.nlhe.trainer import segmented_caps

    caps = segmented_caps(8, max_levels=4, align=64)
    cfg = TrainerConfig(
        batch=8, work_cap=2048, cap=256, max_levels=4,
        roll_steps=4, tail_steps=8, table_log2=14, level_caps=caps,
    )
    table = init_table(cfg.table_log2)
    step = make_nlhe_step(
        proxy_bucket, LINEAR_REGRET, LINEAR_WEIGHT, PLURIBUS_SAMPLING, cfg
    )
    for i in range(4):
        table, m = step(table, jax.random.PRNGKey(3))
    assert int(m["dropped"]) == 0
    assert int(m["nodes"]) > 8
    assert np.isfinite(np.asarray(table.regret)).all()
    nz = (np.abs(np.asarray(table.regret)).sum(axis=1) > 0).sum()
    assert nz > 30


def test_parity_steps_train(tmp_path):
    """Parity-specialized steps alternate by walker and keep learning."""
    from robopoker_tpu.nlhe.forge import FastSession
    from robopoker_tpu.nlhe.trainer import segmented_caps

    cfg = TrainerConfig(
        batch=8, work_cap=2048, cap=256, max_levels=4,
        roll_steps=4, tail_steps=8, table_log2=14,
        level_caps=segmented_caps(8, max_levels=4, align=64),
    )
    s = FastSession(workdir=str(tmp_path), trainer=cfg, parity_steps=True)
    s.train(epochs=4)
    assert int(s.table.epoch) == 4
    r = np.asarray(s.table.regret)
    assert np.isfinite(r).all()
    assert (np.abs(r).sum(axis=1) > 0).sum() > 30


def test_payoff_finite(stepped):
    table, _ = stepped
    # EVs are importance-weighted (π/q reach ratios exceed 1), so they can
    # exceed raw chip stakes; they must stay finite and sane
    p = np.asarray(table.payoff)
    assert np.isfinite(p).all()
    assert np.abs(p).max() < 1e5
    r = np.asarray(table.regret)
    assert np.isfinite(r).all()


def test_warmstart_bias_seeds_fresh_rows():
    """Fresh rows' legal columns get the bias.rs seed (fold 100, call/
    check 50, raise 10/edge, shove 0); tree building is unaffected and
    bias=None stays the historical program."""
    import dataclasses

    from robopoker_tpu.pokerkit.hyperparams import BiasHyperParams

    key = jax.random.PRNGKey(0)
    base = make_nlhe_step(
        proxy_bucket, LINEAR_REGRET, LINEAR_WEIGHT, PLURIBUS_SAMPLING, CFG
    )
    t0, _ = base(init_table(CFG.table_log2), key)
    biased = make_nlhe_step(
        proxy_bucket, LINEAR_REGRET, LINEAR_WEIGHT, PLURIBUS_SAMPLING,
        dataclasses.replace(CFG, warmstart_bias=BiasHyperParams()),
    )
    tb, _ = biased(init_table(CFG.table_log2), key)

    assert np.array_equal(np.asarray(t0.visits), np.asarray(tb.visits))
    occ = np.asarray(tb.visits) > 0
    delta = np.asarray(tb.regret)[occ] - np.asarray(t0.regret)[occ]
    # fold column: exactly {0 (illegal/absent), 100}; shove never seeded
    assert set(np.unique(np.round(delta[:, 0], 3))) <= {0.0, 100.0}
    assert (delta[:, 3] == 0).all()
    assert set(np.unique(np.round(delta[:, 4:], 3))) <= {0.0, 10.0}
    assert (delta[:, 0] == 100.0).any()       # some fold seeds landed


def test_fresh_checkout_resumes_from_compact(tmp_path):
    """Only blueprint_compact.npz survives checkouts (dense is gitignored);
    a FastSession pointed at such a workdir must reconstruct the trained
    table instead of silently serving a fresh one."""
    from robopoker_tpu.nlhe.forge import FastSession
    from robopoker_tpu.utils.checkpoint import save_compact

    cfg = TrainerConfig(batch=4, work_cap=1024, cap=128, max_levels=4,
                        roll_steps=4, tail_steps=8, table_log2=12)
    s = FastSession(workdir=str(tmp_path), trainer=cfg)
    s.train(epochs=3)
    save_compact(tmp_path / "blueprint_compact.npz", s.table, s.run)
    # simulate the fresh checkout: the dense checkpoint is gitignored
    (tmp_path / "blueprint.npz").unlink(missing_ok=True)

    s2 = FastSession(workdir=str(tmp_path), trainer=cfg)
    assert int(s2.table.epoch) == 3
    for f in ("regret", "weight", "payoff", "visits", "key_lo", "key_hi"):
        np.testing.assert_array_equal(np.asarray(getattr(s2.table, f)),
                                      np.asarray(getattr(s.table, f)))
def test_forget_keeps_blueprint(tmp_path):
    import pathlib
    from robopoker_tpu.nlhe.forge import forget
    (tmp_path / "hands.jsonl").write_text("{}\n")
    (tmp_path / "rooms.jsonl").write_text("{}\n")
    (tmp_path / "blueprint_compact.npz").write_bytes(b"x")
    (tmp_path / "snapshots.jsonl").write_text("{}\n")
    forget(str(tmp_path))
    assert not (tmp_path / "hands.jsonl").exists()
    assert not (tmp_path / "rooms.jsonl").exists()
    assert (tmp_path / "blueprint_compact.npz").exists()
    assert (tmp_path / "snapshots.jsonl").exists()
