"""Relational conv layer vs an independent dense numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_torchdrug_tpu.data.graph import Graph
from ultra_torchdrug_tpu.models.layers import ConvConfig, conv_apply, conv_init

EPS = 1e-6


def np_layer_norm(x, scale, bias, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def np_relu(x):
    return np.maximum(x, 0)


def oracle_conv(p, cfg, g, x, boundary, query=None, rel_injected=None):
    """Dense reference: explicit per-edge messages, python scatter."""
    V, B, D = x.shape
    # relation input
    if cfg.rel_mode == "embedding":
        rel = np.asarray(p["relation"]["weight"])  # [R, D]
        rel = np.broadcast_to(rel[:, None, :], (rel.shape[0], B, D))
    elif cfg.rel_mode == "dependent":
        w, b = np.asarray(p["relation_linear"]["w"]), np.asarray(p["relation_linear"]["b"])
        rel = (np.asarray(query) @ w + b).reshape(B, cfg.num_relations, D)
        rel = rel.transpose(1, 0, 2)
    else:
        rel = np.asarray(rel_injected)
        if cfg.project:
            layers = p["relation_projection"]["layers"]
            h = rel
            for i, lp in enumerate(layers):
                h = h @ np.asarray(lp["w"]) + np.asarray(lp["b"])
                if i < len(layers) - 1:
                    h = np_relu(h)
            rel = h
        if rel.ndim == 3:  # [B, R, D] -> [R, B, D]
            rel = rel.transpose(1, 0, 2)
        else:
            rel = np.broadcast_to(rel[:, None, :], (rel.shape[0], B, D))

    el = np.asarray(g.edge_list)
    w = np.asarray(g.edge_weight)
    x_np, bnd = np.asarray(x), np.asarray(boundary)
    deg = np.zeros(V)
    for (h, t, r), we in zip(el, w):
        deg[t] += we
    degree = deg[:, None, None] + 1

    def msg(h, r):
        if cfg.message_func == "distmult":
            return rel[r] * x_np[h]
        if cfg.message_func == "transe":
            return rel[r] + x_np[h]
        d = D // 2
        xr, xi = x_np[h][..., :d], x_np[h][..., d:]
        rr, ri = rel[r][..., :d], rel[r][..., d:]
        return np.concatenate([xr * rr - xi * ri, xr * ri + xi * rr], axis=-1)

    agg = cfg.aggregate_func
    base = agg.replace("_nobound", "")
    bounded = not agg.endswith("_nobound")

    def scatter(fn, init, transform=lambda m: m):
        out = np.full((V, B, D), init, np.float32)
        for (h, t, r), we in zip(el, w):
            out[t] = fn(out[t], transform(msg(h, r)) * we)
        out[~np.isfinite(out)] = 0
        return out

    if base == "sum":
        update = scatter(np.add, 0.0)
        if bounded:
            update = update + bnd
    elif base == "mean":
        update = scatter(np.add, 0.0)
        update = (update + bnd) / degree if bounded else update / degree
    elif base == "max":
        update = scatter(np.maximum, -np.inf)
        if bounded:
            update = np.maximum(update, bnd)
    elif base == "pna":
        s = scatter(np.add, 0.0)
        # reference sq path: rspmm(rel**2, x**2) with the layer's mul
        rel_sq_msg = {
            "distmult": lambda h, r: (rel[r] ** 2) * (x_np[h] ** 2),
            "transe": lambda h, r: (rel[r] ** 2) + (x_np[h] ** 2),
        }[cfg.message_func]
        sq = np.zeros((V, B, D), np.float32)
        for (h, t, r), we in zip(el, w):
            sq[t] += rel_sq_msg(h, r) * we
        mx = scatter(np.maximum, -np.inf)
        mn = scatter(np.minimum, np.inf)
        if bounded:
            mean = (s + bnd) / degree
            sq_mean = (sq + bnd**2) / degree
            mx, mn = np.maximum(mx, bnd), np.minimum(mn, bnd)
        else:
            mean, sq_mean = s / degree, sq / degree
        std = np.sqrt(np.clip(sq_mean - mean**2, EPS, None))
        feats = np.stack([mean, mx, mn, std], -1).reshape(V, B, 4 * D)
        scale = np.log(degree)
        scale = scale / scale.mean()
        scales = np.concatenate([np.ones_like(scale), scale, 1 / np.clip(scale, 1e-2, None)], -1)
        update = (feats[..., None] * scales[:, :, None, :]).reshape(V, B, 12 * D)

    out = np.concatenate([x_np, update], -1) @ np.asarray(p["linear"]["w"]) + np.asarray(
        p["linear"]["b"]
    )
    if cfg.layer_norm:
        out = np_layer_norm(out, np.asarray(p["layer_norm"]["scale"]), np.asarray(p["layer_norm"]["bias"]))
    return np_relu(out)


def setup(rng, cfg, V=9, E=40, B=4):
    triplets = np.stack(
        [
            rng.integers(0, V, E),
            rng.integers(0, V, E),
            rng.integers(0, cfg.num_relations, E),
        ],
        axis=1,
    ).astype(np.int32)
    g = Graph.from_triplets(triplets, V, cfg.num_relations)
    g = g.with_edge_weight(jnp.asarray(rng.uniform(0.5, 1.5, E).astype(np.float32)))
    x = rng.normal(size=(V, B, cfg.input_dim)).astype(np.float32)
    bnd = rng.normal(size=(V, B, cfg.input_dim)).astype(np.float32)
    p = conv_init(jax.random.PRNGKey(7), cfg)
    return g, jnp.asarray(x), jnp.asarray(bnd), p


@pytest.mark.parametrize("message", ["distmult", "transe"])
@pytest.mark.parametrize("aggregate", ["sum", "mean", "max", "pna", "sum_nobound"])
def test_conv_embedding_mode(rng, message, aggregate):
    cfg = ConvConfig(6, 5, num_relations=3, query_input_dim=6,
                     message_func=message, aggregate_func=aggregate,
                     layer_norm=True, rel_mode="embedding")
    g, x, bnd, p = setup(rng, cfg)
    got = conv_apply(p, cfg, g, x, bnd)
    want = oracle_conv(p, cfg, g, np.asarray(x), np.asarray(bnd))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("per_batch", [False, True])
def test_conv_injected_project(rng, per_batch):
    cfg = ConvConfig(6, 5, num_relations=3, query_input_dim=6,
                     message_func="distmult", aggregate_func="sum",
                     layer_norm=True, rel_mode="injected", project=True)
    g, x, bnd, p = setup(rng, cfg)
    B = x.shape[1]
    shape = (B, 3, 6) if per_batch else (3, 6)
    rel = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    got = conv_apply(p, cfg, g, x, bnd, rel_injected=rel)
    want = oracle_conv(p, cfg, g, np.asarray(x), np.asarray(bnd), rel_injected=np.asarray(rel))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_conv_dependent(rng):
    cfg = ConvConfig(6, 5, num_relations=3, query_input_dim=6,
                     message_func="distmult", aggregate_func="pna",
                     rel_mode="dependent")
    g, x, bnd, p = setup(rng, cfg)
    query = jnp.asarray(rng.normal(size=(x.shape[1], 6)).astype(np.float32))
    got = conv_apply(p, cfg, g, x, bnd, query=query)
    want = oracle_conv(p, cfg, g, np.asarray(x), np.asarray(bnd), query=np.asarray(query))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_conv_rotate(rng):
    cfg = ConvConfig(6, 5, num_relations=3, query_input_dim=6,
                     message_func="rotate", aggregate_func="sum",
                     rel_mode="embedding")
    g, x, bnd, p = setup(rng, cfg)
    got = conv_apply(p, cfg, g, x, bnd)
    want = oracle_conv(p, cfg, g, np.asarray(x), np.asarray(bnd))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_conv_grads_finite(rng):
    cfg = ConvConfig(6, 6, num_relations=3, query_input_dim=6,
                     message_func="distmult", aggregate_func="sum",
                     layer_norm=True, rel_mode="embedding")
    g, x, bnd, p = setup(rng, cfg)

    def loss(p, x):
        return (conv_apply(p, cfg, g, x, bnd) ** 2).sum()

    gp, gx = jax.grad(loss, argnums=(0, 1))(p, x)
    for leaf in jax.tree_util.tree_leaves((gp, gx)):
        assert np.isfinite(np.asarray(leaf)).all()
