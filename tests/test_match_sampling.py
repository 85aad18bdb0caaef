"""Tests for static-shape triple matching and strict negative sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from ultra_torchdrug_tpu.ops.match import (
    edges_in_patterns,
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
