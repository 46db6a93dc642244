"""Open-addressed infoset-table resolution (table.probe_rows).

The reference resolves infosets exactly via ``HashMap`` probing (ref:
crates/mccfr/src/strategy/book.rs:14-146); round-1 used lossy shared
slots. These tests pin the exact-resolution invariants of the ladder.
"""

import numpy as np

import jax
import jax.numpy as jnp

from robopoker_tpu.nlhe import TrainerConfig, init_table, make_nlhe_step
from robopoker_tpu.nlhe.abstraction import proxy_bucket
from robopoker_tpu.nlhe.table import collision_stats, probe_rows
from robopoker_tpu.mccfr import LINEAR_REGRET, LINEAR_WEIGHT, PLURIBUS_SAMPLING


def _resolve(lo, hi, key):
    r, f = probe_rows(jnp.asarray(lo), jnp.asarray(hi),
                      jnp.asarray([key[0]], jnp.int32),
                      jnp.asarray([key[1]], jnp.int32))
    return int(r[0]), bool(f[0])


def test_probe_relocates_colliding_keys():
    cap = 16
    lo = np.zeros(cap, np.int32)
    hi = np.zeros(cap, np.int32)
    A = (5, 9)   # base slot 5^9 = 12
    B = (1, 13)  # base slot 1^13 = 12 — engineered collision

    # empty table: both claim the base slot
    rA, fA = _resolve(lo, hi, A)
    rB, fB = _resolve(lo, hi, B)
    assert rA == rB == 12 and not fA and not fB

    # A resident at 12: B must displace by its own odd stride (13<<1)|1=27
    lo[12], hi[12] = A
    rB, fB = _resolve(lo, hi, B)
    assert rB == (12 + 27) % cap and rB != 12 and not fB

    # both resident: resolution is stable and exact
    lo[rB], hi[rB] = B
    assert _resolve(lo, hi, A) == (12, False)
    assert _resolve(lo, hi, B) == (rB, False)


def test_probe_fallback_when_ladder_exhausted():
    cap = 16
    B = (1, 13)
    lo = np.zeros(cap, np.int32)
    hi = np.zeros(cap, np.int32)
    # occupy B's entire 8-candidate ladder with foreign keys
    base, stride = 1 ^ 13, (13 << 1) | 1
    for i in range(8):
        s = (base + i * stride) % cap
        lo[s], hi[s] = 77 + i, 88 + i
    r, f = _resolve(lo, hi, B)
    assert f  # ladder exhausted → counted fallback
    assert r == (base + 7 * stride) % cap  # shares the last candidate


def test_trainer_probing_end_to_end():
    cfg = TrainerConfig(batch=4, work_cap=256, cap=64, max_levels=3,
                        roll_steps=3, tail_steps=6, table_log2=12)
    step = make_nlhe_step(proxy_bucket, LINEAR_REGRET, LINEAR_WEIGHT,
                          PLURIBUS_SAMPLING, cfg)
    table = init_table(12)
    key = jax.random.PRNGKey(3)
    for _ in range(4):
        table, m = step(table, key)
    # at ~1% load the ladder never exhausts
    assert int(m["fallbacks"]) == 0
    # every persisted key resolves to a slot holding exactly that key
    lo = np.asarray(table.key_lo)
    hi = np.asarray(table.key_hi)
    occ = (lo != 0) | (hi != 0)
    keys = np.stack([lo[occ], hi[occ]], axis=1)
    assert len(keys) > 0
    stats = collision_stats(table, keys)
    assert stats["collided"] == 0
