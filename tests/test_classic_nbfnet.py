"""Classic NBFNet (learned queries) + path visualization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ultra_torchdrug_tpu.data.graph import Graph
from ultra_torchdrug_tpu.models.classic_nbfnet import (
    beam_search_paths,
    classic_nbfnet_config,
    classic_nbfnet_init,
    classic_score_all,
    edge_gradients,
    visualize,
)


def chain_graph():
    """0 -r0-> 1 -r0-> 2 -r0-> 3 plus distractor edges."""
    triplets = np.array(
        [[0, 1, 0], [1, 2, 0], [2, 3, 0], [0, 3, 1], [3, 1, 1]], np.int32
    )
    return Graph.from_triplets(triplets, 4, 2)


def test_classic_scores_shapes(rng):
    g = chain_graph()
    cfg = classic_nbfnet_config(
        input_dim=8, hidden_dims=(8, 8), num_relations=g.num_relations,
        aggregate_func="pna",
    )
    params = classic_nbfnet_init(jax.random.PRNGKey(0), cfg)
    und = g.undirected_with_inverse()
    scores = classic_score_all(
        params, cfg, und, jnp.asarray([0, 1]), jnp.asarray([0, 1])
    )
    assert scores.shape == (2, 4)
    assert np.isfinite(np.asarray(scores)).all()


def test_classic_training_signal(rng):
    g = chain_graph()
    cfg = classic_nbfnet_config(
        input_dim=8, hidden_dims=(8, 8), num_relations=g.num_relations,
        aggregate_func="sum", layer_norm=True,
    )
    params = classic_nbfnet_init(jax.random.PRNGKey(0), cfg)
    und = g.undirected_with_inverse()

    def loss(p):
        s = classic_score_all(p, cfg, und, jnp.asarray([0]), jnp.asarray([0]))
        return -s[0, 1] + jax.nn.logsumexp(s[0])

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_edge_gradients_and_visualize():
    g = chain_graph()
    cfg = classic_nbfnet_config(
        input_dim=8, hidden_dims=(8, 8, 8), num_relations=g.num_relations,
        aggregate_func="sum",
    )
    params = classic_nbfnet_init(jax.random.PRNGKey(3), cfg)
    und = g.undirected_with_inverse()
    grads = edge_gradients(params, cfg, und, 0, 3, 0)
    assert len(grads) == 3
    assert all(gr.shape == (und.num_edges,) for gr in grads)

    paths, weights = visualize(params, cfg, g, 0, 3, 0, num_beam=5, path_topk=5)
    assert len(paths) == len(weights) > 0
    for path in paths:
        # connected path ending at the target
        assert path[-1][1] == 3
        assert path[0][0] == 0
        for (u1, v1, _), (u2, _, _) in zip(path, path[1:]):
            assert v1 == u2


def test_beam_search_scales_to_100k_edges():
    """The tensorized beam must handle FB15k237-scale edge counts in seconds
    (the reference's device beam, model.py:416-470) — wall-clock bounded."""
    import time

    rng = np.random.default_rng(0)
    V, E, R, L = 8000, 120000, 7, 4
    tri = np.stack([
        rng.integers(0, V, E), rng.integers(0, V, E), rng.integers(0, R, E)
    ], 1).astype(np.int32)
    g = Graph.from_triplets(tri, V, R).undirected_with_inverse()
    grads = [rng.normal(size=g.num_edges).astype(np.float32) * 0.01
             for _ in range(L)]
    t0 = time.time()
    paths, weights = beam_search_paths(g, grads, 0, 5, num_beam=10, path_topk=10)
    elapsed = time.time() - t0
    assert elapsed < 60, f"beam search too slow: {elapsed:.1f}s"
    assert len(paths) == 10
    for path, w in zip(paths, weights):
        assert path[-1][1] == 5 and np.isfinite(w)
        for (u1, v1, _), (u2, _, _) in zip(path, path[1:]):
            assert v1 == u2
