"""Abstraction layer tests: isomorphism, equity, EMD metric axioms,
k-means, lookup tables.

Mirrors the reference's strategy (SURVEY §4.1): isomorphism
false-positive/negative checks under all 24 permutations, EMD metric
axioms as property tests (ref: crates/lloyd/src/emd.rs:15-166), equity
golden values, small-scale clustering sanity.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robopoker_tpu.deuce import parse_cards
from robopoker_tpu.deuce.isomorphism import (
    PERMS,
    canonical_key,
    canonical_key_np,
    hash_key,
)
from robopoker_tpu.deuce.observation import equity_bucket, river_equity
from robopoker_tpu.lloyd import (
    EmdSpec,
    build_lookup,
    cluster,
    lookup_device,
    sinkhorn_cost,
    sinkhorn_divergence,
    turn_histograms,
    variation_distance,
)


def permute_cards(cards, perm):
    return np.where(cards >= 0, (cards >> 2) * 4 + np.asarray(perm)[cards & 3], cards)


def test_preflop_canonical_count_is_169():
    # the street constant oracle (ref: street.rs:118-146)
    pockets = np.array(
        [(a, b) for a in range(52) for b in range(52) if a != b], np.int32
    )
    board = np.full((len(pockets), 0), -1, np.int32)
    words = np.asarray(canonical_key(jnp.asarray(pockets), jnp.asarray(board)))
    uniq = {tuple(w) for w in words}
    assert len(uniq) == 169


def test_isomorphism_no_false_negatives():
    # any suit permutation of an observation has the same canonical key
    rng = np.random.default_rng(0)
    for _ in range(50):
        deal = rng.choice(52, 7, replace=False)
        pocket, board = deal[:2], deal[2:]
        base = canonical_key_np(pocket, board)[0]
        for perm in itertools.permutations(range(4)):
            pp = permute_cards(pocket, perm)
            bb = permute_cards(board, perm)
            assert (canonical_key_np(pp, bb)[0] == base).all()


def test_isomorphism_no_false_positives():
    # distinct strategic situations keep distinct keys
    a = canonical_key_np(parse_cards("As Ks"), parse_cards("2h 3d 4c"))[0]
    b = canonical_key_np(parse_cards("As Kh"), parse_cards("2h 3d 4c"))[0]
    assert tuple(a) != tuple(b)


def test_device_matches_host_canonical():
    rng = np.random.default_rng(1)
    deals = np.stack([rng.choice(52, 7, replace=False) for _ in range(256)])
    pockets, boards = deals[:, :2].astype(np.int32), deals[:, 2:].astype(np.int32)
    dev = np.asarray(canonical_key(jnp.asarray(pockets), jnp.asarray(boards)))
    host = canonical_key_np(pockets, boards)
    assert (dev == host).all()


def test_river_equity_golden():
    # nuts vs air: royal-flush hero beats everything → equity 1
    pocket = parse_cards("As Ks")[None, :].astype(np.int32)
    board = parse_cards("Qs Js Ts 2h 3d")[None, :].astype(np.int32)
    eq = float(np.asarray(river_equity(jnp.asarray(pocket), jnp.asarray(board)))[0])
    assert eq == 1.0
    # board plays for everyone (quads + ace kicker on board) → all tie
    pocket = parse_cards("2c 3c")[None, :].astype(np.int32)
    board = parse_cards("As Ah Ad Ac Kd")[None, :].astype(np.int32)
    eq = float(np.asarray(river_equity(jnp.asarray(pocket), jnp.asarray(board)))[0])
    assert eq == 0.5
    # 72o on a broadway board: never wins, ties only when the board plays
    # for the opponent too (hero's best five = AKQJ9) → equity = ties/2
    pocket = parse_cards("7c 2d")[None, :].astype(np.int32)
    board = parse_cards("Ah Kh Qd Js 9c")[None, :].astype(np.int32)
    eq = float(np.asarray(river_equity(jnp.asarray(pocket), jnp.asarray(board)))[0])
    assert 0.05 < eq < 0.2


def _random_histograms(rng, n, bins):
    h = rng.random((n, bins)).astype(np.float32) ** 3
    # sparsify: EMD paths exercise off-support handling
    h[h < 0.3] = 0.0
    h[:, 0] += 1e-3  # ensure nonempty
    return h / h.sum(axis=1, keepdims=True)


def _random_metric(rng, bins):
    # random symmetric metric with zero diagonal satisfying triangle via
    # embedding: distances between random points on a line
    x = np.sort(rng.random(bins).astype(np.float32))
    return np.abs(x[:, None] - x[None, :])


def test_emd_metric_axioms_sinkhorn():
    # ref: lloyd/src/emd.rs metric-axiom property tests
    rng = np.random.default_rng(2)
    bins = 16
    cost = _random_metric(rng, bins)
    h = _random_histograms(rng, 3, bins)
    a, b, c = (jnp.asarray(h[i][None]) for i in range(3))
    d = lambda x, y: float(sinkhorn_divergence(x, y, jnp.asarray(cost))[0])
    # symmetry
    assert abs(d(a, b) - d(b, a)) < 1e-3
    # self-annihilation (debiased)
    assert d(a, a) < 1e-4
    # non-negativity
    assert d(a, b) >= 0 and d(b, c) >= 0
    # approximate triangle inequality (entropic: allow slack)
    assert d(a, c) <= d(a, b) + d(b, c) + 0.05


def test_emd_metric_axioms_variation():
    rng = np.random.default_rng(3)
    h = _random_histograms(rng, 3, 101)
    a, b, c = (jnp.asarray(h[i][None]) for i in range(3))
    d = lambda x, y: float(variation_distance(x, y)[0])
    assert abs(d(a, b) - d(b, a)) < 1e-7
    assert d(a, a) == 0.0
    assert d(a, c) <= d(a, b) + d(b, c) + 1e-6


def test_variation_matches_exact_1d_emd():
    # two point masses distance k apart: EMD = k/bins
    bins = 101
    mu = np.zeros((1, bins), np.float32)
    nu = np.zeros((1, bins), np.float32)
    mu[0, 10] = 1.0
    nu[0, 60] = 1.0
    d = float(variation_distance(jnp.asarray(mu), jnp.asarray(nu))[0])
    assert abs(d - 50 / bins) < 1e-6


def test_sinkhorn_approximates_exact_emd():
    # the entropic cost at T=0.025 should be near the exact EMD for
    # well-separated point masses
    bins = 8
    x = np.linspace(0.0, 1.0, bins).astype(np.float32)
    cost = np.abs(x[:, None] - x[None, :])
    mu = np.zeros((1, bins), np.float32)
    nu = np.zeros((1, bins), np.float32)
    mu[0, 0] = 1.0
    nu[0, 7] = 1.0
    d = float(sinkhorn_divergence(
        jnp.asarray(mu), jnp.asarray(nu), jnp.asarray(cost))[0])
    assert abs(d - 1.0) < 0.05


def test_kmeans_separates_synthetic_clusters():
    rng = np.random.default_rng(4)
    bins = 101
    # three well-separated equity profiles with noise
    protos = np.zeros((3, bins), np.float32)
    protos[0, 10] = 1.0
    protos[1, 50] = 1.0
    protos[2, 90] = 1.0
    pts, labels = [], []
    for i in range(3):
        for _ in range(50):
            h = protos[i] + 0.02 * rng.random(bins).astype(np.float32)
            # jitter the mass location slightly
            shift = rng.integers(-3, 4)
            h = np.roll(h, shift)
            pts.append(h / h.sum())
            labels.append(i)
    pts = jnp.asarray(np.stack(pts))
    res = cluster(pts, 3, EmdSpec("variation"), jax.random.PRNGKey(0))
    # each true cluster maps to one found cluster
    labels = np.asarray(labels)
    for i in range(3):
        got = res.assignment[labels == i]
        assert (got == np.bincount(got, minlength=3).argmax()).mean() > 0.95


def test_lookup_roundtrip():
    rng = np.random.default_rng(5)
    deals = np.stack([rng.choice(52, 6, replace=False) for _ in range(500)])
    pockets, boards = deals[:, :2].astype(np.int32), deals[:, 2:].astype(np.int32)
    words = canonical_key(jnp.asarray(pockets), jnp.asarray(boards))
    h1, h2 = hash_key(words)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    # dedupe (canonical classes collide across deals)
    _, idx = np.unique(np.stack([h1, h2], 1).view("i4,i4").ravel(), return_index=True)
    h1u, h2u = h1[idx], h2[idx]
    vals = np.arange(len(h1u), dtype=np.int32)
    table = build_lookup(h1u, h2u, vals)
    got = np.asarray(lookup_device(table, jnp.asarray(h1u), jnp.asarray(h2u)))
    assert (got == vals).all()


def test_turn_histograms_shape_and_mass():
    rng = np.random.default_rng(6)
    deals = np.stack([rng.choice(52, 6, replace=False) for _ in range(32)])
    h = np.asarray(turn_histograms(
        jnp.asarray(deals[:, :2].astype(np.int32)),
        jnp.asarray(deals[:, 2:].astype(np.int32)),
    ))
    assert h.shape == (32, 101)
    assert np.allclose(h.sum(axis=1), 1.0, atol=1e-5)
    # exactly 46 river children contribute
    assert (h > 0).sum(axis=1).max() <= 46


def test_sinkhorn_between_exact_and_greedy():
    # ref: crates/lloyd/src/heuristic.rs — greedy upper-bounds exact EMD;
    # the debiased Sinkhorn divergence should track the exact cost closely
    from robopoker_tpu.lloyd.heuristic import exact_emd, greedy_emd

    rng = np.random.default_rng(7)
    bins = 12
    cost = _random_metric(rng, bins)
    for _ in range(5):
        h = _random_histograms(rng, 2, bins)
        exact = exact_emd(h[0], h[1], cost)
        greedy = greedy_emd(h[0], h[1], cost)
        assert greedy >= exact - 1e-6
        sink = float(sinkhorn_divergence(
            jnp.asarray(h[0][None]), jnp.asarray(h[1][None]),
            jnp.asarray(cost))[0])
        # entropic bias at T=0.025 on [0,1]-scale metrics stays small
        assert abs(sink - exact) < 0.05 + 0.25 * exact


def test_observation_i64_roundtrip():
    # ref: observation.rs:277-283 bijection tests
    from robopoker_tpu.deuce.observation import pack_observation, unpack_observation

    rng = np.random.default_rng(11)
    for n_board in (0, 3, 4, 5):
        for _ in range(50):
            deal = rng.choice(52, 2 + n_board, replace=False).tolist()
            pocket, board = deal[:2], deal[2:]
            bits = pack_observation(pocket, board)
            p2, b2 = unpack_observation(bits)
            assert p2 == pocket and b2 == board


def test_hash_v2_preflop_exhaustive_distinct():
    # all 1,326 preflop deals collapse to exactly 169 canonical classes
    # (ref: crates/deuce/src/street.rs:118-146) and hash_key_v2 keeps all
    # 169 distinct (v1's linear folds are the round-1 collision bug)
    from robopoker_tpu.deuce.isomorphism import hash_key_v2

    import itertools

    deals = np.array(list(itertools.combinations(range(52), 2)), np.int32)
    board = np.full((len(deals), 0), -1, np.int32)
    words = np.asarray(canonical_key(jnp.asarray(deals), jnp.asarray(board)))
    keys = np.unique(words.view("i4,i4,i4,i4").ravel())
    assert len(keys) == 169
    uw = np.unique(words, axis=0)
    h1, h2 = hash_key_v2(jnp.asarray(uw))
    pairs = (np.asarray(h1).astype(np.int64) << 32) ^ (
        np.asarray(h2).astype(np.int64) & 0xFFFFFFFF)
    assert len(np.unique(pairs)) == 169


def test_lookup_hash_version_roundtrip(tmp_path):
    # compact() persists hash_version; load_lookup restores it and
    # LookupBucket queries with the matching hash per table
    from robopoker_tpu.deuce.isomorphism import HASH_VERSION, hash_key_v1
    from robopoker_tpu.lloyd.lookup import load_lookup
    from robopoker_tpu.nlhe.abstraction import LookupBucket

    rng = np.random.default_rng(11)
    deals = np.stack([rng.choice(52, 6, replace=False) for _ in range(400)])
    pockets = deals[:, :2].astype(np.int32)
    boards = deals[:, 2:].astype(np.int32)
    words = canonical_key(jnp.asarray(pockets), jnp.asarray(boards))
    wn = np.asarray(words)
    _, idx = np.unique(wn.view("i4,i4,i4,i4").ravel(), return_index=True)
    idx = np.sort(idx)
    vals = (np.arange(len(idx)) % 256).astype(np.int32)

    # one table per hash version over the same keys/values
    h1v2, h2v2 = hash_key(words[idx])
    t2 = build_lookup(np.asarray(h1v2), np.asarray(h2v2), vals,
                      hash_version=HASH_VERSION)
    h1v1, h2v1 = hash_key_v1(words[idx])
    t1 = build_lookup(np.asarray(h1v1), np.asarray(h2v1), vals,
                      hash_version=1)

    np.savez(tmp_path / "t2.npz", **t2.compact())
    with np.load(tmp_path / "t2.npz") as z:
        r2 = load_lookup(z)
    assert r2.hash_version == HASH_VERSION

    # mixed-version bucket: turn keyed v2, flop keyed v1 — both must hit
    bucket = LookupBucket(flop_lookup=t1, turn_lookup=r2)
    street = jnp.full((len(idx),), 2, jnp.int32)
    got = np.asarray(bucket(jnp.asarray(pockets[idx]),
                            jnp.asarray(boards[idx]), street))
    assert ((got >> 8) == 2).all()
    assert ((got & 0xFF) == vals).all()


@pytest.mark.parametrize("hole_a,board_a,hole_b,board_b", [
    # ref: crates/deuce/src/isomorphism.rs named symmetry classes
    ("2s Ks", "2d 5h 8c Tc Th", "2s Ks", "2h 5c 8d Tc Td"),   # super_symmetry
    ("Ac Ad", "Jc Ts 5s",       "As Ah", "Js Tc 5c"),          # pocket_rank
    ("Td As", "Ts Ks Kh",       "Tc Ad", "Td Kd Kh"),          # public_rank
    ("As Jh", "Ks Js 2d",       "Ah Jd", "Kh Jh 2c"),          # offsuit_backdoor
    ("As Qh", "Ks Js 2s",       "Ad Qh", "Kd Jd 2d"),          # offsuit_draw
    ("Ad Kd", "Qd Jd Td",       "As Ks", "Qs Js Ts"),          # monochrome
    ("Ac Kc", "Qs Js Ts",       "As Ks", "Qh Jh Th"),          # antichrome
    ("Ac Ks", "Qc Js Ts",       "Ad Kh", "Qd Jh Th"),          # semichrome
    ("Ac Kd", "Qh Js 9c",       "Ah Ks", "Qc Jd 9h"),          # polychrome
])
def test_isomorphism_reference_symmetry_classes(hole_a, board_a,
                                                hole_b, board_b):
    a = canonical_key_np(parse_cards(hole_a), parse_cards(board_a))[0]
    b = canonical_key_np(parse_cards(hole_b), parse_cards(board_b))[0]
    assert tuple(a) == tuple(b), (hole_a, board_a, hole_b, board_b)
