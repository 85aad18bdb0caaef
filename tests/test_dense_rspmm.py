"""Dense MXU rspmm (ops/dense.py) vs the XLA segment-op oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ultra_torchdrug_tpu.data.graph import Graph
from ultra_torchdrug_tpu.ops.dense import dense_rspmm
from ultra_torchdrug_tpu.ops.rspmm import generalized_rspmm


def _random_graph(rng, N=37, E=900, T=4, multi=True):
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    et = rng.integers(0, T, E)
    if multi:  # force duplicate (s, d, t) edges — A must SUM weights
        src[: E // 8] = src[0]
        dst[: E // 8] = dst[0]
        et[: E // 8] = et[0]
    tri = np.stack([src, dst, et], 1).astype(np.int32)
    w = rng.normal(size=(E,)).astype(np.float32)
    return Graph.from_triplets(tri, N, T, edge_weight=w)


@pytest.mark.parametrize("msg", ["mul", "add"])
@pytest.mark.parametrize("rel_form", ["shared", "per_batch"])
def test_dense_matches_oracle(msg, rel_form):
    rng = np.random.default_rng(0)
    g = _random_graph(rng)
    gd = g.prepare_dense(min_density=0.0)
    assert gd.dense_adj is not None and gd.dense_adj.shape == (4, 37, 37)
    B, D = 3, 16
    shape = (4, D) if rel_form == "shared" else (4, B, D)
    rel = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(37, B, D)).astype(np.float32))

    def f_dense(rr, xx):
        return jnp.sum(jnp.sin(dense_rspmm(gd.dense_adj, rr, xx, msg=msg)))

    def f_ref(rr, xx):
        out = generalized_rspmm(
            g.edge_index, g.edge_type, g.edge_weight, rr, xx,
            msg=msg, agg="add", num_nodes=37, impl="xla",
        )
        return jnp.sum(jnp.sin(out))

    od = dense_rspmm(gd.dense_adj, rel, x, msg=msg)
    orf = generalized_rspmm(
        g.edge_index, g.edge_type, g.edge_weight, rel, x,
        msg=msg, agg="add", num_nodes=37, impl="xla",
    )
    np.testing.assert_allclose(od, orf, rtol=2e-5, atol=2e-5)

    gd_r, gd_x = jax.grad(f_dense, argnums=(0, 1))(rel, x)
    gr_r, gr_x = jax.grad(f_ref, argnums=(0, 1))(rel, x)
    # tolerance: fp32 summation ORDER differs (dense folds multi-edge
    # weights into one A entry; the oracle sums per edge) — cancellation on
    # the forced 112-fold duplicate makes ~1e-4 absolute drift expected
    np.testing.assert_allclose(gd_r, gr_r, rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(gd_x, gr_x, rtol=1e-3, atol=3e-4)


def test_prepare_dense_thresholds():
    rng = np.random.default_rng(1)
    g = _random_graph(rng, N=37, E=40, T=4, multi=False)
    assert g.prepare_dense().dense_adj is None  # density 40/5476 < 2%
    assert g.prepare_dense(min_density=0.0).dense_adj is not None
    big = _random_graph(rng, N=3000, E=500, T=4, multi=False)
    assert big.prepare_dense(min_density=0.0).dense_adj is None  # > max_bytes


def test_weight_transforms_drop_dense_adj():
    rng = np.random.default_rng(2)
    g = _random_graph(rng).prepare_dense(min_density=0.0)
    assert g.dense_adj is not None
    assert g.with_edge_weight(g.edge_weight * 2).dense_adj is None
    assert g.mask_edges(jnp.ones(g.num_edges, bool)).dense_adj is None


def test_conv_routes_dense():
    """conv_apply output is identical (allclose) with and without dense_adj."""
    from ultra_torchdrug_tpu.models.layers import (
        ConvConfig, conv_apply, conv_init,
    )

    rng = np.random.default_rng(3)
    g = _random_graph(rng)
    g = g.with_edge_weight(jnp.abs(g.edge_weight))  # pna wants >= 0 degrees
    gd = g.prepare_dense(min_density=0.0)
    assert gd.dense_adj is not None
    B, D = 3, 16
    for aggregate in ("sum", "mean", "pna"):
        cfg = ConvConfig(
            input_dim=D, output_dim=D, num_relations=4, query_input_dim=D,
            message_func="distmult", aggregate_func=aggregate,
            rel_mode="embedding",
        )
        params = conv_init(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.normal(size=(37, B, D)).astype(np.float32))
        bound = jnp.asarray(rng.normal(size=(37, B, D)).astype(np.float32))
        out_sparse = conv_apply(params, cfg, g, x, bound)
        out_dense = conv_apply(params, cfg, gd, x, bound)
        np.testing.assert_allclose(
            out_dense, out_sparse, rtol=2e-4, atol=2e-5, err_msg=aggregate
        )
