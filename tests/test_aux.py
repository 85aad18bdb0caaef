"""Coverage for auxiliary subsystems: RWSE encodings, relation input types,
variadic primitives, debug utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from ultra_torchdrug_tpu.data.graph import Graph
from ultra_torchdrug_tpu.models.rel_inputs import (
    build_initial_features, rel_input_param_init,
)
from ultra_torchdrug_tpu.ops import variadic
from ultra_torchdrug_tpu.utils.rwse import random_walk_se


def ring_graph(n=6):
    tri = np.array([[i, (i + 1) % n, 0] for i in range(n)], np.int32)
    return Graph.from_triplets(tri, n, 1)


def test_rwse_ring():
    g = ring_graph(6)
    rw = random_walk_se(g, 6)
    assert rw.shape == (6, 6)
    # on a directed 6-ring, return probability is 1 exactly at k=6
    np.testing.assert_allclose(rw[:, :5], 0.0, atol=1e-9)
    np.testing.assert_allclose(rw[:, 5], 1.0, atol=1e-9)


def test_rwse_rrpe_shapes():
    g = ring_graph(5)
    rw, rrpe = random_walk_se(g, 4, return_all=True)
    assert rw.shape == (5, 4) and rrpe.shape == (5, 5, 4)


def test_rel_input_types(rng):
    g = ring_graph(8)
    key = jax.random.PRNGKey(0)
    params = rel_input_param_init(
        key, "embedding__degree_encoding__random_walk_encoding", 8, 16
    )
    for itype in ("ones", "zeros", "glorot", "embedding", "degree_encoding",
                  "random_walk_encoding", "ones__embedding"):
        feats = build_initial_features(key, g, itype, 16, params)
        assert feats.shape == (8, 16)
        assert np.isfinite(np.asarray(feats)).all()
    ones = build_initial_features(key, g, "ones", 16, params)
    np.testing.assert_allclose(np.asarray(ones), 1.0)


def test_variadic_sort_and_topk(rng):
    sizes = np.array([3, 0, 4, 2], np.int32)
    vals = rng.normal(size=int(sizes.sum())).astype(np.float32)
    sv, order = variadic.variadic_sort(jnp.asarray(vals), jnp.asarray(sizes))
    # segments individually sorted
    off = 0
    sv = np.asarray(sv)
    for s in sizes:
        seg = sv[off : off + s]
        assert (np.diff(seg) >= 0).all()
        off += s

    topv, topi = variadic.variadic_topk(jnp.asarray(vals), jnp.asarray(sizes), 2)
    topv = np.asarray(topv)
    off = 0
    for si, s in enumerate(sizes):
        if s > 0:
            seg = np.sort(vals[off : off + s])[::-1]
            np.testing.assert_allclose(topv[si, 0], seg[0])
            np.testing.assert_allclose(topv[si, 1], seg[min(1, s - 1)])
        off += s


def test_variadic_topk_empty_segment_sentinel():
    # an empty segment must NOT leak the next segment's best entry
    vals = jnp.asarray(np.array([4.0, 7.0], np.float32))
    sizes = jnp.asarray(np.array([0, 2], np.int32))
    topv, topi = variadic.variadic_topk(vals, sizes, 1)
    assert np.asarray(topv)[0, 0] == -np.inf
    assert np.asarray(topi)[0, 0] == -1
    np.testing.assert_allclose(np.asarray(topv)[1, 0], 7.0)


def test_variadic_unique_duplicates():
    # duplicates within a segment must compact, not zero out uniques
    vals = jnp.asarray(np.array([5.0, 5.0, 3.0], np.float32))
    sizes = jnp.asarray(np.array([3], np.int32))
    out, new_sizes, keep = variadic.variadic_unique(vals, sizes)
    assert int(new_sizes[0]) == 2
    np.testing.assert_array_equal(np.asarray(out)[:2], [3.0, 5.0])
    assert int(np.asarray(keep).sum()) == 2


def test_variadic_shuffle_preserves_segments(rng):
    sizes = np.array([4, 3], np.int32)
    vals = np.arange(7).astype(np.float32)
    out, _ = variadic.variadic_shuffle(
        jax.random.PRNGKey(0), jnp.asarray(vals), jnp.asarray(sizes)
    )
    out = np.asarray(out)
    assert set(out[:4]) == {0, 1, 2, 3}
    assert set(out[4:]) == {4, 5, 6}


def test_bincount():
    vals = jnp.asarray(np.array([0, 2, 2, 5], np.int32))
    got = np.asarray(variadic.bincount(vals, 7))
    np.testing.assert_array_equal(got, [1, 0, 2, 0, 0, 1, 0])


def test_segment_ids_from_sizes():
    sizes = jnp.asarray(np.array([2, 0, 3], np.int32))
    ids = np.asarray(variadic.segment_ids_from_sizes(sizes, 5))
    np.testing.assert_array_equal(ids, [0, 0, 2, 2, 2])


def test_wandb_logger_inert():
    from ultra_torchdrug_tpu.utils.debug import WandbLogger

    logger = WandbLogger(config={"lr": 0.1, "bad": object()})
    logger.log({"loss": 1.0})
    logger.finish()


def test_variadic_topks_per_segment_k(rng):
    sizes = np.array([5, 2, 4], np.int32)
    ks = np.array([3, 1, 2], np.int32)
    vals = rng.normal(size=int(sizes.sum())).astype(np.float32)
    topv, topi, valid = variadic.variadic_topks(
        jnp.asarray(vals), jnp.asarray(sizes), jnp.asarray(ks)
    )
    topv, valid = np.asarray(topv), np.asarray(valid)
    off = 0
    for s_i, (sz, k) in enumerate(zip(sizes, ks)):
        seg = np.sort(vals[off : off + sz])[::-1]
        np.testing.assert_allclose(topv[s_i, :k], seg[:k], rtol=1e-6)
        assert valid[s_i, :k].all() and not valid[s_i, k:].any()
        off += sz


def test_meter_lazy_window_fetch():
    """Meter holds device scalars lazily and fetches once per window; rates
    are reported per second of window wall time."""
    import logging as _logging
    from ultra_torchdrug_tpu.utils.logging import Meter

    records = []

    class _Capture(_logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger = _logging.getLogger("test_meter_lazy")
    logger.setLevel(_logging.INFO)
    logger.addHandler(_Capture())
    meter = Meter(logger, log_interval=3)
    for i in range(3):
        meter.update({"loss": jnp.float32(i)}, rates={"edges": 100})
    assert len(records) == 1  # window flushed exactly once
    assert "loss: 1" in records[0]  # mean(0,1,2)
    assert "edges" in records[0]
    assert meter._count == 0  # window reset
    # plain floats still work
    meter.update({"loss": 2.0})
    meter.log_window()
    assert "loss: 2" in records[-1]
