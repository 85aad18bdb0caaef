"""Multi-rel-model (RelationModelList) and shared-labeling (CustomNBFNet)
variants of the ULTRA composition."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ultra_torchdrug_tpu.data.graph import Graph
from ultra_torchdrug_tpu.data.relgraph import build_relation_graph
from ultra_torchdrug_tpu.models.nbfnet import (
    entity_nbfnet_config, rel_nbfnet_config,
)
from ultra_torchdrug_tpu.models.ultra import (
    UltraConfig, ultra_eval_scores, ultra_init, ultra_train_scores,
)


def setup(rng, num_rel_models=1, rel_shared=False, num_layers=2):
    V, E, R = 22, 110, 4
    tri = np.unique(np.stack([
        rng.integers(0, V, E), rng.integers(0, V, E), rng.integers(0, R, E)
    ], 1), axis=0).astype(np.int32)
    g = Graph.from_triplets(tri, V, R)
    rg = build_relation_graph(g)
    cfg = UltraConfig(
        entity=entity_nbfnet_config(
            input_dim=8, hidden_dims=(8,) * num_layers, num_relations=R * 2
        ),
        relation=rel_nbfnet_config(input_dim=8, hidden=8, num_layers=2),
        num_rel_models=num_rel_models,
        rel_shared=rel_shared,
    )
    params = ultra_init(jax.random.PRNGKey(0), cfg)
    return g, rg, cfg, params, tri


def test_shared_rel_tower(rng):
    g, rg, cfg, params, tri = setup(rng, rel_shared=True)
    h, t, r = (jnp.asarray(tri[:4, i]) for i in range(3))
    t_s, h_s = ultra_eval_scores(params, cfg, g, rg, h, t, r)
    assert t_s.shape == (4, g.num_nodes)
    assert np.isfinite(np.asarray(t_s)).all()


def test_multi_rel_models_per_layer_injection(rng):
    # num_layers + 1 towers: tower 0 seeds the query, towers 1..L feed layers
    g, rg, cfg, params, tri = setup(rng, num_rel_models=3, num_layers=2)
    assert isinstance(params["relation"], list) and len(params["relation"]) == 3
    h, t, r = (jnp.asarray(tri[:4, i]) for i in range(3))
    neg = jnp.asarray(rng.integers(0, g.num_nodes, (4, 5)).astype(np.int32))
    scores = ultra_train_scores(params, cfg, g, rg, h, t, r, neg)
    assert scores.shape == (4, 6)

    def loss(p):
        return (ultra_train_scores(p, cfg, g, rg, h, t, r, neg) ** 2).sum()

    grads = jax.grad(loss)(params)
    # every tower receives gradient signal
    for tower in grads["relation"]:
        total = sum(
            float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(tower)
        )
        assert total > 0
