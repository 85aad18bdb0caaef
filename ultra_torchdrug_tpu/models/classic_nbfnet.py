"""Classic NBFNet: standalone Bellman–Ford reasoner with learned query
embeddings, plus path interpretability (edge-gradient beam search).

Re-implements NeuralBellmanFordNetwork (/root/reference/ultra/model.py:198-493):
query vectors come from an Embedding(2R, D) table instead of a relation tower;
layers run in "dependent" mode (per-query relation projections) by default.
``visualize`` differentiates the score w.r.t. per-layer edge weights and beam-
searches the top-k highest-gradient paths (model.py:394-493) — the edge-grad
path uses the autodiff rspmm variant, mirroring the reference's O(E) fallback.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import Graph
from ..nn.core import embedding_init, mlp_init
from .layers import conv_apply, conv_init
from .nbfnet import NBFNetConfig, _flat_boundary, _mlp_head_split


def classic_nbfnet_config(
    input_dim: int = 32,
    hidden_dims: Sequence[int] = (32,) * 6,
    num_relations: int = 1,  # base relation count R (doubled internally)
    message_func: str = "distmult",
    aggregate_func: str = "pna",
    dependent: bool = True,
    **kw,
) -> NBFNetConfig:
    return NBFNetConfig(
        input_dim=input_dim,
        hidden_dims=tuple(hidden_dims),
        num_relations=num_relations * 2,
        message_func=message_func,
        aggregate_func=aggregate_func,
        short_cut=kw.get("short_cut", True),
        layer_norm=kw.get("layer_norm", False),
        concat_hidden=kw.get("concat_hidden", False),
        num_mlp_layer=kw.get("num_mlp_layer", 2),
        rel_mode="dependent" if dependent else "embedding",
        project=False,
        rspmm_impl=kw.get("rspmm_impl", "xla"),
    )


def classic_nbfnet_init(key, cfg: NBFNetConfig) -> dict:
    lcfgs = cfg.layer_configs()
    keys = jax.random.split(key, len(lcfgs) + 2)
    feature_dim = (
        cfg.hidden_dims[-1] * (len(cfg.hidden_dims) if cfg.concat_hidden else 1)
        + cfg.input_dim
    )
    return {
        "layers": [conv_init(k, c) for k, c in zip(keys[:-2], lcfgs)],
        "query": embedding_init(keys[-2], cfg.num_relations, cfg.input_dim),
        "mlp": mlp_init(
            keys[-1], feature_dim, [feature_dim] * (cfg.num_mlp_layer - 1) + [1]
        ),
    }


def _bellmanford(
    params, cfg: NBFNetConfig, graph: Graph, source, query_rel,
    edge_grad: bool = False, edge_weights: List[jnp.ndarray] = None,
):
    """Propagate from `source` conditioned on `query_rel`. When
    ``edge_weights`` is given (one [E] array per layer), each layer uses its
    own weights — the separate_grad mechanism of model.py:120-125 that lets
    visualize() take per-step edge gradients."""
    B = source.shape[0]
    query = params["query"]["weight"][query_rel]  # [B, D]
    V = graph.num_nodes
    boundary = _flat_boundary(V, B, cfg.input_dim, source, query)

    hiddens = []
    x = boundary
    for i, (p, lcfg) in enumerate(zip(params["layers"], cfg.layer_configs())):
        g = graph if edge_weights is None else graph.with_edge_weight(edge_weights[i])
        h = conv_apply(p, lcfg, g, x, boundary, query=query, edge_grad=edge_grad)
        if cfg.short_cut and h.shape == x.shape:
            h = h + x
        hiddens.append(h)
        x = h
    if cfg.concat_hidden:
        out = jnp.concatenate([h.reshape(V, B, -1) for h in hiddens], -1)
    else:
        out = hiddens[-1].reshape(V, B, -1)
    return out, query


def classic_score_all(params, cfg, graph_und: Graph, source, query_rel) -> jnp.ndarray:
    """[B, V] scores for (source[b], query_rel[b], ?) over all entities.
    The [state; query] MLP head runs split (nbfnet._mlp_head_split): the
    query half is one [B, H] matmul broadcast into the sum, so the
    [V, B, feat+D] concat is never materialized."""
    feature, query = _bellmanford(params, cfg, graph_und, source, query_rel)
    return _mlp_head_split(params["mlp"], feature, query)[..., 0].T


# ---------------------------------------------------------------------------
# path interpretability (visualize/beam_search, model.py:394-493)
# ---------------------------------------------------------------------------


def edge_gradients(
    params, cfg: NBFNetConfig, graph_und: Graph, h_index: int, t_index: int,
    r_index: int,
):
    """Per-layer d(score[t]) / d(edge_weight): list of [E] arrays."""
    num_layers = len(cfg.hidden_dims)
    base_w = graph_und.edge_weight

    def score_fn(edge_weights):
        feature, query = _bellmanford(
            params, cfg, graph_und,
            jnp.asarray([h_index]), jnp.asarray([r_index]),
            edge_grad=True, edge_weights=list(edge_weights),
        )
        score = _mlp_head_split(params["mlp"], feature, query)[..., 0]  # [V, 1]
        return score[t_index, 0]

    grads = jax.grad(score_fn)(tuple(base_w for _ in range(num_layers)))
    return list(grads)


def beam_search_paths(
    graph_und: Graph,
    edge_grads: List,
    h_index: int,
    t_index: int,
    num_beam: int = 10,
    path_topk: int = 10,
) -> Tuple[List[List[Tuple[int, int, int]]], List[float]]:
    """Top-k paths by cumulative edge gradient — device-side tensorized beam
    with the reference's semantics (model.py:416-470): per layer, every edge
    broadcasts its source's beam distances plus its own gradient; candidates
    dedup equal-distance beam slots (first occurrence wins, :431-436); each
    node keeps its per-segment top-`num_beam` via variadic_topk (:455); edges
    leaving the target are excluded (:425). All static-shape segment ops —
    O(E·num_beam) on device per layer, no python per-edge loops — so it runs
    at FB15k237 scale (544k undirected edges) in seconds."""
    from ..ops.variadic import variadic_topk

    el = np.asarray(graph_und.edge_list)
    num_nodes = graph_und.num_nodes
    num_layers = len(edge_grads)
    NEG = float("-inf")

    # static topology prep: edges sorted by destination so per-node candidate
    # groups are contiguous for the variadic top-k
    order = np.argsort(el[:, 1], kind="stable")
    el_s = el[order]
    src_s = jnp.asarray(el_s[:, 0])
    sizes = jnp.asarray(
        np.bincount(el_s[:, 1], minlength=num_nodes).astype(np.int32) * num_beam
    )
    order_j = jnp.asarray(order.astype(np.int32))
    el_j = jnp.asarray(el_s.astype(np.int32))
    exclude = (el_s[:, 0] == t_index)[:, None]  # don't leave the target

    @jax.jit
    def beam_step(dist, grad):
        msg = dist[src_s] + grad[order_j][:, None]  # [E, k]
        msg = jnp.where(jnp.asarray(exclude), NEG, msg)
        # beam rows are sorted descending, so equal-distance duplicates are
        # adjacent: keep the first occurrence per edge (model.py:431-436)
        first = jnp.concatenate(
            [jnp.ones((msg.shape[0], 1), bool), msg[:, 1:] != msg[:, :-1]], 1
        )
        msg = jnp.where(first, msg, NEG)
        vals, idx = variadic_topk(msg.reshape(-1), sizes, num_beam)
        vals = jnp.where(sizes[:, None] > 0, vals, NEG)  # isolated nodes
        e, b = idx // num_beam, idx % num_beam
        back = jnp.concatenate([el_j[e], b[..., None].astype(jnp.int32)], -1)
        back = jnp.where(jnp.isfinite(vals)[..., None], back, -1)
        return vals, back

    dist = jnp.full((num_nodes, num_beam), NEG)
    dist = dist.at[h_index, 0].set(0.0)
    distances, back_edges = [], []
    for step in range(num_layers):
        dist, back = beam_step(dist, jnp.asarray(edge_grads[step]))
        distances.append(np.asarray(dist))
        back_edges.append(np.asarray(back))

    paths, avg_lengths = [], []
    for i in range(num_layers):
        order = np.argsort(-distances[i][t_index])
        for b in order[:path_topk]:
            d = distances[i][t_index, b]
            if d == NEG:
                break
            u, v, r, prev = back_edges[i][t_index, b]
            path = [(int(u), int(v), int(r))]
            for j in range(i - 1, -1, -1):
                u, v, r, prev = back_edges[j][u, prev]
                path.append((int(u), int(v), int(r)))
            paths.append(path[::-1])
            avg_lengths.append(float(d) / len(path))
    if paths:
        pairs = sorted(zip(avg_lengths, paths), key=lambda t: -t[0])[:path_topk]
        avg_lengths, paths = [p[0] for p in pairs], [p[1] for p in pairs]
    return paths, avg_lengths


def visualize(
    params, cfg: NBFNetConfig, graph: Graph, h_index: int, t_index: int,
    r_index: int, num_beam: int = 10, path_topk: int = 10,
):
    """Top-k reasoning paths for a (h, r, t) query (model.py:394-414)."""
    graph_und = graph.undirected_with_inverse()
    grads = edge_gradients(params, cfg, graph_und, h_index, t_index, r_index)
    return beam_search_paths(
        graph_und, grads, h_index, t_index, num_beam, path_topk
    )
