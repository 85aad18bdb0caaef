"""ULTRA: the full two-tower model — relation-graph GNN conditioning an
entity-graph NBFNet reasoner.

Re-designs the composition in the reference's task/model glue
(/root/reference/ultra/task.py:228-277 + model.py:145-194) as pure functions:

  train:  strict negatives -> easy-edge masking -> head/tail flip ->
          relation tower -> entity tower -> gather candidate scores
  eval:   relation tower once -> entity tower from (h, r) and (t, r+R) ->
          all-entity score matrices (the reference's chunked scoring loop +
          @utils.cached memoization collapses into one all-entity pass)

Static-shape notes: "removing" easy edges multiplies their weight by 0 (and
the weight of their mirrored inverse edge — the reference removes the directed
edge before expanding to undirected); head-corruption is expressed per-row as
(source=t, relation=r+R) rather than by mutating index tensors
(negative_sample_to_tail, model.py:76-83).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..data.graph import Graph
from ..ops.match import edges_in_patterns, edges_in_patterns_indexed
from .nbfnet import (
    NBFNetConfig,
    entity_nbfnet_config,
    entity_nbfnet_init,
    entity_nbfnet_score_all,
    rel_nbfnet_apply,
    rel_nbfnet_apply_shared,
    rel_nbfnet_config,
    rel_nbfnet_init,
)


@dataclasses.dataclass(frozen=True)
class UltraConfig:
    entity: NBFNetConfig
    relation: NBFNetConfig
    remove_one_hop: bool = False
    # RelationModelList support (rel_model.py:209-223): >1 towers feed the
    # entity layers individually (model.py:149-156 requires num_layers + 1)
    num_rel_models: int = 1
    # CustomNBFNet-style shared labeling (one [2R, D] output for the batch)
    # instead of CustomNBFNetFull per-query conditioning
    rel_shared: bool = False

    @staticmethod
    def default(num_relations: int, rspmm_impl: str = "xla") -> "UltraConfig":
        """The architecture of every shipped config (6x64 distmult/sum,
        layer_norm + short_cut, project, config/transductive/pretrain_3g.yaml)."""
        return UltraConfig(
            entity=entity_nbfnet_config(
                input_dim=64,
                hidden_dims=(64,) * 6,
                num_relations=num_relations * 2,
                rspmm_impl=rspmm_impl,
            ),
            relation=rel_nbfnet_config(rspmm_impl=rspmm_impl),
        )


def ultra_init(key, cfg: UltraConfig) -> dict:
    k1, k2 = jax.random.split(key)
    if cfg.num_rel_models == 1:
        relation = rel_nbfnet_init(k2, cfg.relation)
    else:
        keys = jax.random.split(k2, cfg.num_rel_models)
        relation = [rel_nbfnet_init(k, cfg.relation) for k in keys]
    return {
        "entity": entity_nbfnet_init(k1, cfg.entity),
        "relation": relation,
    }


def _rel_queries(params, cfg: UltraConfig, rel_graph, pos_r):
    """Run the relation tower(s); returns a single tensor or a list."""
    apply = rel_nbfnet_apply_shared if cfg.rel_shared else rel_nbfnet_apply
    if cfg.num_rel_models == 1:
        return apply(params["relation"], cfg.relation, rel_graph, pos_r)
    return [
        apply(p, cfg.relation, rel_graph, pos_r) for p in params["relation"]
    ]


# ---------------------------------------------------------------------------


def _mask_easy_edges(
    cfg: UltraConfig, fact_graph: Graph, h_index, t_index, r_index
) -> Graph:
    """Zero the weights of (h, t, r) [and mirrored inverse] edges appearing in
    the batch — the static-shape remove_easy_edges (model.py:57-74). Operates
    on the *directed* fact graph; callers expand to undirected afterwards so
    the inverse copies inherit the mask.

    When the graph carries a PatternJoinIndex (Graph.prepare_join), the join
    runs as P binary searches against the pre-sorted static edges instead of
    lexsorting E+P rows every step (~14 ms -> sub-ms at FB scale)."""
    if cfg.remove_one_hop:
        h_ext = jnp.concatenate([h_index, t_index], axis=-1)
        t_ext = jnp.concatenate([t_index, h_index], axis=-1)
        patterns = jnp.stack(
            [h_ext.reshape(-1), t_ext.reshape(-1), jnp.zeros_like(h_ext.reshape(-1))],
            axis=-1,
        )
        if fact_graph.join_index_ht is not None:
            hit = edges_in_patterns_indexed(fact_graph.join_index_ht, patterns)
            return fact_graph.mask_edges(~hit)
        edge_list = fact_graph.edge_list.at[:, 2].set(0)  # wildcard relation
    else:
        patterns = jnp.stack(
            [h_index.reshape(-1), t_index.reshape(-1), r_index.reshape(-1)], axis=-1
        )
        if fact_graph.join_index is not None:
            hit = edges_in_patterns_indexed(fact_graph.join_index, patterns)
            return fact_graph.mask_edges(~hit)
        edge_list = fact_graph.edge_list
    hit = edges_in_patterns(edge_list, patterns)
    return fact_graph.mask_edges(~hit)


def _flip_heads_to_tails(h_index, t_index, r_index, num_relations: int):
    """negative_sample_to_tail (model.py:76-83): rows whose head varies are
    head-corruption rows; convert to tail form via the inverse relation."""
    is_t_neg = (h_index == h_index[:, :1]).all(axis=-1, keepdims=True)
    new_h = jnp.where(is_t_neg, h_index, t_index)
    new_t = jnp.where(is_t_neg, t_index, h_index)
    new_r = jnp.where(is_t_neg, r_index, r_index + num_relations)
    return new_h, new_t, new_r


def ultra_train_scores(
    params: dict,
    cfg: UltraConfig,
    fact_graph: Graph,
    rel_graph: Graph,
    pos_h: jnp.ndarray,
    pos_t: jnp.ndarray,
    pos_r: jnp.ndarray,
    neg_index: jnp.ndarray,
    remove_easy: bool = True,
    fact_graph_und: Graph = None,
) -> jnp.ndarray:
    """Scores for [positive | negatives]: [B, 1 + N].

    neg_index: [B, N] — first half of rows are corrupted tails, second half
    corrupted heads (task.py:270-274's batch assembly).
    """
    B = pos_h.shape[0]
    N = neg_index.shape[1]
    half = B // 2
    ar = jnp.arange(B)

    h_index = jnp.broadcast_to(pos_h[:, None], (B, N + 1))
    t_index = jnp.broadcast_to(pos_t[:, None], (B, N + 1))
    r_index = jnp.broadcast_to(pos_r[:, None], (B, N + 1))
    row_is_tail_neg = (ar < half)[:, None]
    t_index = jnp.where(
        row_is_tail_neg & (jnp.arange(N + 1) >= 1)[None, :],
        jnp.concatenate([pos_t[:, None], neg_index], axis=1),
        t_index,
    )
    h_index = jnp.where(
        (~row_is_tail_neg) & (jnp.arange(N + 1) >= 1)[None, :],
        jnp.concatenate([pos_h[:, None], neg_index], axis=1),
        h_index,
    )

    graph = fact_graph
    if remove_easy:
        graph = _mask_easy_edges(cfg, graph, h_index, t_index, r_index)
    if fact_graph_und is None:
        graph_und = graph.undirected_with_inverse()
    else:
        # precomputed undirected graph (edge order = [directed; inverse]):
        # reuse its topology/layouts, substitute the per-batch masked weights
        graph_und = fact_graph_und.with_edge_weight(
            jnp.concatenate([graph.edge_weight, graph.edge_weight])
        )

    h_index, t_index, r_index = _flip_heads_to_tails(
        h_index, t_index, r_index, fact_graph.num_relations
    )

    rel_queries = _rel_queries(params, cfg, rel_graph, pos_r)  # [B, 2R, D]

    # targets: the head runs on the 1+N candidate entities only (the
    # reference gathers `feature` at the candidate index before its MLP too,
    # model.py:176-181) — identical to indexing the [B, V] score matrix
    return entity_nbfnet_score_all(
        params["entity"], cfg.entity, graph_und, rel_queries,
        source=h_index[:, 0], query_rel=r_index[:, 0], targets=t_index,
    )  # [B, 1+N]


def ultra_eval_scores(
    params: dict,
    cfg: UltraConfig,
    fact_graph: Graph,
    rel_graph: Graph,
    pos_h: jnp.ndarray,
    pos_t: jnp.ndarray,
    pos_r: jnp.ndarray,
    fact_graph_und: Graph = None,
):
    """All-entity score matrices for tail and head prediction:
    (t_scores [B, V], h_scores [B, V])."""
    graph_und = (
        fact_graph.undirected_with_inverse()
        if fact_graph_und is None
        else fact_graph_und
    )
    rel_queries = _rel_queries(params, cfg, rel_graph, pos_r)
    t_scores = entity_nbfnet_score_all(
        params["entity"], cfg.entity, graph_und, rel_queries,
        source=pos_h, query_rel=pos_r,
    )
    h_scores = entity_nbfnet_score_all(
        params["entity"], cfg.entity, graph_und, rel_queries,
        source=pos_t, query_rel=pos_r + fact_graph.num_relations,
    )
    return t_scores, h_scores
