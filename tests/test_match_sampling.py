"""Tests for static-shape triple matching and strict negative sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from ultra_torchdrug_tpu.ops.match import (
    build_pattern_join,
    edges_in_patterns,
    edges_in_patterns_indexed,
    head_truth_mask,
    tail_truth_mask,
)
from ultra_torchdrug_tpu.ops.sampling import sample_from_mask, strict_negatives


def random_edges(rng, V=20, E=100, R=6):
    el = np.stack(
        [rng.integers(0, V, E), rng.integers(0, V, E), rng.integers(0, R, E)], axis=1
    ).astype(np.int32)
    return el


def test_edges_in_patterns(rng):
    el = random_edges(rng)
    patterns = np.concatenate([el[::7], random_edges(rng, E=10)], axis=0)
    got = np.asarray(edges_in_patterns(jnp.asarray(el), jnp.asarray(patterns)))
    pat_set = {tuple(p) for p in patterns.tolist()}
    want = np.array([tuple(e) in pat_set for e in el.tolist()])
    np.testing.assert_array_equal(got, want)


def test_edges_in_patterns_with_duplicate_edges(rng):
    el = random_edges(rng, E=50)
    el = np.concatenate([el, el[:10]], axis=0)  # duplicated edges
    patterns = el[5:15]
    got = np.asarray(edges_in_patterns(jnp.asarray(el), jnp.asarray(patterns)))
    pat_set = {tuple(p) for p in patterns.tolist()}
    want = np.array([tuple(e) in pat_set for e in el.tolist()])
    np.testing.assert_array_equal(got, want)


def test_edges_in_patterns_indexed_matches_sort_join(rng):
    """The binary-search join over the pre-sorted static edge index must
    reproduce the sort-merge join exactly — duplicate edges, duplicate
    patterns, and misses included."""
    for E, P in ((1, 3), (50, 1), (200, 40)):
        el = random_edges(rng, V=30, E=E, R=7)
        el = np.concatenate([el, el[: max(E // 5, 1)]], axis=0)  # dup edges
        patterns = np.concatenate(
            [el[:: max(P, 1)][:P], random_edges(rng, V=30, E=P, R=7), el[:1]],
            axis=0,
        )
        idx = build_pattern_join(el[:, :2], el[:, 2])
        want = np.asarray(
            edges_in_patterns(jnp.asarray(el), jnp.asarray(patterns))
        )
        got = np.asarray(
            jax.jit(edges_in_patterns_indexed)(idx, jnp.asarray(patterns))
        )
        np.testing.assert_array_equal(got, want)


def test_edges_in_patterns_indexed_wildcard_rel(rng):
    """remove_one_hop variant: relation is a wildcard — the (h, t)-keyed
    index matches the sort join over relation-zeroed edge lists."""
    el = random_edges(rng, V=25, E=120, R=5)
    pat = random_edges(rng, V=25, E=30, R=5)
    pat[:, 2] = 0
    idx = build_pattern_join(el[:, :2], el[:, 2], wildcard_rel=True)
    el0 = el.copy()
    el0[:, 2] = 0
    want = np.asarray(edges_in_patterns(jnp.asarray(el0), jnp.asarray(pat)))
    got = np.asarray(edges_in_patterns_indexed(idx, jnp.asarray(pat)))
    np.testing.assert_array_equal(got, want)


def test_build_pattern_join_int32_overflow_guard():
    el = np.array([[0, 2**24, 3]], np.int64)
    assert build_pattern_join(el[:, :2].astype(np.int64),
                              np.array([2**10], np.int64)) is None


def test_mask_easy_edges_indexed_matches_plain(rng):
    """_mask_easy_edges with a prepare_join'd graph equals the sort-join
    result (weights identical)."""
    from ultra_torchdrug_tpu.data.graph import Graph
    from ultra_torchdrug_tpu.models.ultra import UltraConfig, _mask_easy_edges
    from ultra_torchdrug_tpu.models.nbfnet import (
        entity_nbfnet_config, rel_nbfnet_config,
    )

    el = random_edges(rng, V=30, E=150, R=6)
    g = Graph.from_triplets(el, 30, 6)
    B, N = 8, 4
    h = jnp.asarray(rng.integers(0, 30, (B, N + 1)).astype(np.int32))
    t = jnp.asarray(rng.integers(0, 30, (B, N + 1)).astype(np.int32))
    r = jnp.asarray(rng.integers(0, 6, (B, N + 1)).astype(np.int32))
    # make some patterns real edges so the mask is non-trivial
    h = h.at[0, 0].set(int(el[0, 0]))
    t = t.at[0, 0].set(int(el[0, 1]))
    r = r.at[0, 0].set(int(el[0, 2]))
    for one_hop in (False, True):
        cfg = UltraConfig(
            entity=entity_nbfnet_config(num_relations=12),
            relation=rel_nbfnet_config(),
            remove_one_hop=one_hop,
        )
        plain = _mask_easy_edges(cfg, g, h, t, r)
        fast = _mask_easy_edges(cfg, g.prepare_join(one_hop=one_hop), h, t, r)
        np.testing.assert_array_equal(
            np.asarray(plain.edge_weight), np.asarray(fast.edge_weight)
        )
        assert (np.asarray(plain.edge_weight) == 0).any()


def test_truth_masks(rng):
    V = 15
    el = random_edges(rng, V=V, E=60, R=4)
    B = 8
    h = rng.integers(0, V, B).astype(np.int32)
    r = rng.integers(0, 4, B).astype(np.int32)
    got = np.asarray(tail_truth_mask(jnp.asarray(el), jnp.asarray(h), jnp.asarray(r), V))
    want = np.zeros((B, V), bool)
    for b in range(B):
        for eh, et_, er in el.tolist():
            if eh == h[b] and er == r[b]:
                want[b, et_] = True
    np.testing.assert_array_equal(got, want)

    t = rng.integers(0, V, B).astype(np.int32)
    got_h = np.asarray(head_truth_mask(jnp.asarray(el), jnp.asarray(t), jnp.asarray(r), V))
    want_h = np.zeros((B, V), bool)
    for b in range(B):
        for eh, et_, er in el.tolist():
            if et_ == t[b] and er == r[b]:
                want_h[b, eh] = True
    np.testing.assert_array_equal(got_h, want_h)


def test_sample_from_mask_only_hits_candidates(rng):
    B, V = 6, 30
    mask = rng.uniform(size=(B, V)) > 0.7
    mask[0] = False
    mask[0, 3] = True  # single candidate row
    out = np.asarray(
        sample_from_mask(jax.random.PRNGKey(0), jnp.asarray(mask), 64)
    )
    for b in range(B):
        assert mask[b, out[b]].all()
    assert (out[0] == 3).all()


def test_sample_from_mask_distribution():
    mask = jnp.asarray(np.array([[True, False, True, True]]))
    out = np.asarray(sample_from_mask(jax.random.PRNGKey(1), mask, 3000))[0]
    counts = np.bincount(out, minlength=4)
    assert counts[1] == 0
    for i in (0, 2, 3):
        assert abs(counts[i] / 3000 - 1 / 3) < 0.05


def test_strict_negatives_avoid_truths(rng):
    V = 25
    el = random_edges(rng, V=V, E=120, R=5)
    B = 8
    pos = el[rng.choice(len(el), B, replace=False)]
    h, t, r = pos[:, 0], pos[:, 1], pos[:, 2]
    neg = np.asarray(
        strict_negatives(
            jax.random.PRNGKey(2), jnp.asarray(el), jnp.asarray(h), jnp.asarray(t),
            jnp.asarray(r), V, 16,
        )
    )
    triples = {tuple(e) for e in el.tolist()}
    for b in range(B // 2):  # tail corruption
        for v in neg[b]:
            assert (h[b], v, r[b]) not in triples
    for b in range(B // 2, B):  # head corruption
        for v in neg[b]:
            assert (v, t[b], r[b]) not in triples
