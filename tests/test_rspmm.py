"""rspmm semantics oracle tests: dense numpy reference vs the op, all
msg × agg combinations, shared and per-batch relations, and VJPs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_torchdrug_tpu.ops.rspmm import generalized_rspmm


def make_graph(rng, V=13, E=64, R=5, B=3, D=7):
    heads = rng.integers(0, V, E)
    tails = rng.integers(0, V, E)
    types = rng.integers(0, R, E)
    edge_index = np.stack([heads, tails], axis=1).astype(np.int32)
    edge_type = types.astype(np.int32)
    edge_weight = rng.uniform(0.5, 1.5, E).astype(np.float32)
    rel = rng.normal(size=(R, D)).astype(np.float32)
    rel_b = rng.normal(size=(R, B, D)).astype(np.float32)
    x = rng.normal(size=(V, B, D)).astype(np.float32)
    return edge_index, edge_type, edge_weight, rel, rel_b, x


def dense_rspmm(edge_index, edge_type, edge_weight, rel, x, msg, agg, V):
    B, D = x.shape[1], x.shape[2]
    if agg == "add":
        out = np.zeros((V, B, D), np.float32)
    elif agg == "max":
        out = np.full((V, B, D), -np.inf, np.float32)
    else:
        out = np.full((V, B, D), np.inf, np.float32)
    for (h, t), r, w in zip(edge_index, edge_type, edge_weight):
        re = rel[r] if rel.ndim == 2 else rel[r]
        re = re if re.ndim == 2 else re[None, :]
        m = (re * x[h] if msg == "mul" else re + x[h]) * w
        if agg == "add":
            out[t] += m
        elif agg == "max":
            out[t] = np.maximum(out[t], m)
        else:
            out[t] = np.minimum(out[t], m)
    out[~np.isfinite(out)] = 0.0
    return out


@pytest.mark.parametrize("msg", ["mul", "add"])
@pytest.mark.parametrize("agg", ["add", "max", "min"])
@pytest.mark.parametrize("per_batch_rel", [False, True])
def test_forward_matches_dense(rng, msg, agg, per_batch_rel):
    edge_index, edge_type, edge_weight, rel, rel_b, x = make_graph(rng)
    relation = rel_b if per_batch_rel else rel
    V = x.shape[0]
    out = generalized_rspmm(
        jnp.asarray(edge_index), jnp.asarray(edge_type), jnp.asarray(edge_weight),
        jnp.asarray(relation), jnp.asarray(x), msg=msg, agg=agg, num_nodes=V,
    )
    want = dense_rspmm(edge_index, edge_type, edge_weight, relation, x, msg, agg, V)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("msg", ["mul", "add"])
@pytest.mark.parametrize("per_batch_rel", [False, True])
def test_custom_vjp_matches_autodiff(rng, msg, per_batch_rel):
    edge_index, edge_type, edge_weight, rel, rel_b, x = make_graph(rng)
    relation = jnp.asarray(rel_b if per_batch_rel else rel)
    xj = jnp.asarray(x)
    ei, et, ew = jnp.asarray(edge_index), jnp.asarray(edge_type), jnp.asarray(edge_weight)
    V = x.shape[0]

    def loss_custom(relation, x):
        out = generalized_rspmm(ei, et, ew, relation, x, msg=msg, agg="add", num_nodes=V)
        return jnp.sum(jnp.sin(out) * out)

    def loss_auto(relation, x):
        out = generalized_rspmm(
            ei, et, ew, relation, x, msg=msg, agg="add", num_nodes=V, edge_grad=True
        )
        return jnp.sum(jnp.sin(out) * out)

    g_custom = jax.grad(loss_custom, argnums=(0, 1))(relation, xj)
    g_auto = jax.grad(loss_auto, argnums=(0, 1))(relation, xj)
    for a, b in zip(g_custom, g_auto):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_max_agg_grad_runs(rng):
    edge_index, edge_type, edge_weight, rel, _, x = make_graph(rng)
    ei, et, ew = jnp.asarray(edge_index), jnp.asarray(edge_type), jnp.asarray(edge_weight)

    def loss(relation, x):
        out = generalized_rspmm(
            ei, et, ew, relation, x, msg="mul", agg="max", num_nodes=x.shape[0]
        )
        return jnp.sum(out**2)

    g = jax.grad(loss, argnums=(0, 1))(jnp.asarray(rel), jnp.asarray(x))
    assert all(np.isfinite(np.asarray(gi)).all() for gi in g)


def test_masked_edges_contribute_nothing(rng):
    edge_index, edge_type, edge_weight, rel, _, x = make_graph(rng)
    keep = rng.uniform(size=edge_weight.shape) > 0.5
    masked_w = edge_weight * keep
    out_masked = generalized_rspmm(
        jnp.asarray(edge_index), jnp.asarray(edge_type), jnp.asarray(masked_w),
        jnp.asarray(rel), jnp.asarray(x), msg="mul", agg="add", num_nodes=x.shape[0],
    )
    out_removed = generalized_rspmm(
        jnp.asarray(edge_index[keep]), jnp.asarray(edge_type[keep]),
        jnp.asarray(edge_weight[keep]), jnp.asarray(rel), jnp.asarray(x),
        msg="mul", agg="add", num_nodes=x.shape[0],
    )
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_removed), rtol=1e-5, atol=1e-5
    )
