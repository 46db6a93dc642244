"""Reduced-scale hierarchical abstraction pipeline test.

Exercises the full reverse-street flow (turn → flop) end-to-end at small
N/K — the same structure as the reference's PreTraining::run
(ref: crates/forge/src/pretraining.rs:21-63), with artifacts flowing
between streets (turn lookup + metric feed the flop Sinkhorn k-means).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robopoker_tpu.lloyd import (
    cluster_flop,
    cluster_turn,
    lookup_device,
    sample_observations,
)
from robopoker_tpu.pokerkit.hyperparams import KmeansHyperParams


@pytest.mark.slow
def test_turn_then_flop_pipeline():
    hp = KmeansHyperParams(iterations=6)
    key = jax.random.PRNGKey(0)

    p4, b4 = sample_observations(key, 512, 4, rng_seed=10)
    turn = cluster_turn(p4, b4, k=8, key=key, chunk=256, hp=hp)
    assert turn.centroids.shape == (8, 101)
    assert turn.metric.shape == (8, 8)
    assert np.allclose(turn.metric, turn.metric.T, atol=1e-5)
    assert np.allclose(np.diag(turn.metric), 0.0, atol=1e-6)
    # lookup resolves training points to their assignment
    from robopoker_tpu.deuce.isomorphism import canonical_key, hash_key
    from robopoker_tpu.lloyd.pipeline import dedupe_canonical

    pu, bu, h1, h2 = dedupe_canonical(p4, b4)
    got = np.asarray(lookup_device(
        turn.lookup, jnp.asarray(h1), jnp.asarray(h2)
    ))
    assert (got == turn.assignment).all()

    p3, b3 = sample_observations(key, 256, 3, rng_seed=11)
    flop = cluster_flop(p3, b3, turn, k=6, key=key, chunk=128, hp=hp)
    assert flop.centroids.shape == (6, 8)
    assert flop.metric.shape == (6, 6)
    # flop metric is a debiased sinkhorn divergence: symmetric-ish, ~0 diag
    assert np.allclose(flop.metric, flop.metric.T, atol=1e-3)
    assert np.abs(np.diag(flop.metric)).max() < 1e-3
    # every flop point got a cluster
    assert (flop.assignment >= 0).all() and (flop.assignment < 6).all()


def test_recompute_chunked_matches_dense():
    """Chunked segment-sum recompute (exhaustive-scale path) must equal the
    single-scatter formula, including weighted pad-row masking."""
    import jax.numpy as jnp
    import numpy as np

    from robopoker_tpu.lloyd.kmeans import recompute

    rng = np.random.default_rng(7)
    n, d, k = 1000, 11, 5
    pts = jnp.asarray(rng.random((n, d)), jnp.float32)
    asg = jnp.asarray(rng.integers(0, k, n), jnp.int32)
    w = jnp.asarray((rng.random(n) > 0.1), jnp.float32)  # some zero-weight rows

    dense_sums = np.zeros((k, d), np.float32)
    dense_mass = np.zeros(k, np.float32)
    np.add.at(dense_sums, np.asarray(asg), np.asarray(pts) * np.asarray(w)[:, None])
    np.add.at(dense_mass, np.asarray(asg), np.asarray(w))
    want = np.where(dense_mass[:, None] > 0,
                    dense_sums / np.maximum(dense_mass[:, None], 1e-30), 0.0)

    for chunk in (64, 333, 1000, 4096):  # incl. ragged tail + one-shot
        got = np.asarray(recompute(pts, asg, k, weights=w, chunk=chunk))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # unweighted path with ragged tail
    got = np.asarray(recompute(pts, asg, k, chunk=333))
    dense_sums = np.zeros((k, d), np.float32)
    dense_mass = np.zeros(k, np.float32)
    np.add.at(dense_sums, np.asarray(asg), np.asarray(pts))
    np.add.at(dense_mass, np.asarray(asg), 1.0)
    want = dense_sums / np.maximum(dense_mass[:, None], 1e-30)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_build_points_device_pads_are_masked():
    """_build_points_device pads inputs to a chunk multiple; pad rows must
    carry zero weight and real rows must match a direct feature call."""
    import jax.numpy as jnp
    import numpy as np

    from robopoker_tpu.lloyd.pipeline import _build_points_device

    def feat(p, b):  # toy feature: one-hot of pocket[0] into 52 bins
        return jax.nn.one_hot(p[:, 0], 52)

    import jax

    rng = np.random.default_rng(3)
    n = 71
    pocket = rng.integers(0, 52, (n, 2)).astype(np.int32)
    board = rng.integers(0, 52, (n, 4)).astype(np.int32)
    buf, valid, n_out = _build_points_device(feat, pocket, board,
                                             chunk=32, bins=52, label="t")
    assert n_out == n
    assert buf.shape == (96, 52)
    np.testing.assert_array_equal(np.asarray(valid),
                                  (np.arange(96) < n).astype(np.float32))
    want = np.asarray(feat(jnp.asarray(pocket), jnp.asarray(board)))
    np.testing.assert_allclose(np.asarray(buf)[:n], want)


def test_river_street_artifact_roundtrip(tmp_path):
    """River artifact = exact-equity buckets (the reference's river table,
    abstraction.rs:89-103): build a small one, reload it through
    LookupBucket, and check street-3 queries return the exact equity
    bucket in the (3<<8)|bucket tag range."""
    import jax.numpy as jnp
    import numpy as np

    from robopoker_tpu.deuce.observation import equity_bucket, river_equity
    from robopoker_tpu.lloyd.pipeline import build_river, sample_observations
    from robopoker_tpu.nlhe.abstraction import LookupBucket

    p5, b5 = sample_observations(None, 300, 5, rng_seed=11)
    art = build_river(p5, b5, chunk=128)
    assert art.street == 3
    assert art.assignment.min() >= 0 and art.assignment.max() <= 100

    np.savez(tmp_path / "river.npz", centroids=art.centroids,
             metric=art.metric, assignment=art.assignment.astype(np.uint8),
             **art.lookup.compact())
    bucket = LookupBucket.load(tmp_path)
    assert bucket.river is not None and bucket.turn is None

    # query the training observations back through the provider
    board = jnp.asarray(b5[:64].astype(np.int32))
    hole = jnp.asarray(p5[:64].astype(np.int32))
    st = jnp.full(64, 3, jnp.int32)
    out = np.asarray(bucket(hole, board, st))
    want = np.asarray(equity_bucket(river_equity(hole, board)))
    assert ((out >> 8) == 3).all(), "every training point must hit the table"
    np.testing.assert_array_equal(out & 0xFF, want)

    # a miss (observation outside the artifact) falls back to the tagged
    # proxy range
    p2, b2 = sample_observations(None, 64, 5, rng_seed=999)
    out2 = np.asarray(bucket(jnp.asarray(p2), jnp.asarray(b2),
                             jnp.full(64, 3, jnp.int32)))
    miss = (out2 >> 8) >= 4
    hit = (out2 >> 8) == 3
    assert (miss | hit).all()
