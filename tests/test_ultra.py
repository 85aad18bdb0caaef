"""End-to-end model composition tests on a tiny synthetic KG."""

import jax
import jax.numpy as jnp
import numpy as np

from ultra_torchdrug_tpu.data.graph import Graph
from ultra_torchdrug_tpu.data.relgraph import build_relation_graph
from ultra_torchdrug_tpu.models.ultra import (
    UltraConfig, ultra_eval_scores, ultra_init, ultra_train_scores,
)
from ultra_torchdrug_tpu.ops.sampling import strict_negatives
from ultra_torchdrug_tpu.tasks.kg import bce_self_adversarial


def tiny_kg(rng, V=20, E=80, R=5):
    triplets = np.unique(
        np.stack(
            [rng.integers(0, V, E), rng.integers(0, V, E), rng.integers(0, R, E)],
            axis=1,
        ),
        axis=0,
    ).astype(np.int32)
    return Graph.from_triplets(triplets, V, R)


def small_cfg(num_relations):
    from ultra_torchdrug_tpu.models.nbfnet import (
        entity_nbfnet_config, rel_nbfnet_config,
    )

    return UltraConfig(
        entity=entity_nbfnet_config(
            input_dim=8, hidden_dims=(8, 8), num_relations=num_relations * 2
        ),
        relation=rel_nbfnet_config(input_dim=8, hidden=8, num_layers=2),
    )


def test_eval_scores_shapes_and_determinism(rng):
    g = tiny_kg(rng)
    rg = build_relation_graph(g)
    cfg = small_cfg(g.num_relations)
    params = ultra_init(jax.random.PRNGKey(0), cfg)
    B = 4
    h = jnp.asarray(rng.integers(0, g.num_nodes, B).astype(np.int32))
    t = jnp.asarray(rng.integers(0, g.num_nodes, B).astype(np.int32))
    r = jnp.asarray(rng.integers(0, g.num_relations, B).astype(np.int32))
    t1, h1 = ultra_eval_scores(params, cfg, g, rg, h, t, r)
    t2, h2 = ultra_eval_scores(params, cfg, g, rg, h, t, r)
    assert t1.shape == (B, g.num_nodes) and h1.shape == (B, g.num_nodes)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert np.isfinite(np.asarray(t1)).all() and np.isfinite(np.asarray(h1)).all()


def test_score_chunking_matches_unchunked(rng):
    """score_chunk (the large-graph eval escape hatch) changes only memory
    behavior: chunked scoring over a V not divisible by the chunk equals the
    single-pass result exactly."""
    import dataclasses

    g = tiny_kg(rng, V=23)  # 23 % 8 != 0: exercises the pad path
    rg = build_relation_graph(g)
    cfg = small_cfg(g.num_relations)
    cfg_chunked = dataclasses.replace(
        cfg, entity=dataclasses.replace(cfg.entity, score_chunk=8)
    )
    params = ultra_init(jax.random.PRNGKey(0), cfg)
    B = 4
    h = jnp.asarray(rng.integers(0, g.num_nodes, B).astype(np.int32))
    t = jnp.asarray(rng.integers(0, g.num_nodes, B).astype(np.int32))
    r = jnp.asarray(rng.integers(0, g.num_relations, B).astype(np.int32))
    t1, h1 = ultra_eval_scores(params, cfg, g, rg, h, t, r)
    t2, h2 = ultra_eval_scores(params, cfg_chunked, g, rg, h, t, r)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), rtol=1e-6)


def test_train_scores_match_eval_when_no_easy_removal(rng):
    """Without easy-edge masking, the train-batch scores must equal gathering
    the all-entity eval scores at the candidate indices (tail rows against
    t_scores, head rows against h_scores)."""
    g = tiny_kg(rng)
    rg = build_relation_graph(g)
    cfg = small_cfg(g.num_relations)
    params = ultra_init(jax.random.PRNGKey(1), cfg)
    B, N = 4, 6
    el = np.asarray(g.edge_list)
    pos = el[rng.choice(len(el), B, replace=False)]
    h, t, r = (jnp.asarray(pos[:, i]) for i in range(3))
    neg = strict_negatives(jax.random.PRNGKey(2), g.edge_list, h, t, r, g.num_nodes, N)

    scores = ultra_train_scores(params, cfg, g, rg, h, t, r, neg, remove_easy=False)
    t_scores, h_scores = ultra_eval_scores(params, cfg, g, rg, h, t, r)

    half = B // 2
    for b in range(B):
        pos_want = t_scores[b, t[b]] if b < half else h_scores[b, h[b]]
        np.testing.assert_allclose(scores[b, 0], pos_want, rtol=1e-4, atol=1e-5)
        for j in range(N):
            if b < half:
                want = t_scores[b, neg[b, j]]
            else:
                want = h_scores[b, neg[b, j]]
            np.testing.assert_allclose(scores[b, 1 + j], want, rtol=1e-4, atol=1e-5)


def test_easy_edge_masking_changes_scores_and_keeps_shapes(rng):
    g = tiny_kg(rng)
    rg = build_relation_graph(g)
    cfg = small_cfg(g.num_relations)
    params = ultra_init(jax.random.PRNGKey(3), cfg)
    B, N = 4, 6
    el = np.asarray(g.edge_list)
    pos = el[rng.choice(len(el), B, replace=False)]
    h, t, r = (jnp.asarray(pos[:, i]) for i in range(3))
    neg = strict_negatives(jax.random.PRNGKey(4), g.edge_list, h, t, r, g.num_nodes, N)
    s_masked = ultra_train_scores(params, cfg, g, rg, h, t, r, neg, remove_easy=True)
    s_plain = ultra_train_scores(params, cfg, g, rg, h, t, r, neg, remove_easy=False)
    assert s_masked.shape == (B, N + 1)
    assert not np.allclose(np.asarray(s_masked), np.asarray(s_plain))


def test_loss_and_grads(rng):
    g = tiny_kg(rng)
    rg = build_relation_graph(g)
    cfg = small_cfg(g.num_relations)
    params = ultra_init(jax.random.PRNGKey(5), cfg)
    B, N = 4, 6
    el = np.asarray(g.edge_list)
    pos = el[rng.choice(len(el), B, replace=False)]
    h, t, r = (jnp.asarray(pos[:, i]) for i in range(3))
    neg = strict_negatives(jax.random.PRNGKey(6), g.edge_list, h, t, r, g.num_nodes, N)

    @jax.jit
    def loss_fn(params):
        s = ultra_train_scores(params, cfg, g, rg, h, t, r, neg)
        return bce_self_adversarial(s, adversarial_temperature=1.0)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least some gradient signal everywhere except unused trees
    nonzero = sum(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert nonzero > len(leaves) * 0.8


def test_remat_modes_identical_gradients(rng):
    """All remat policies must produce identical losses and gradients."""
    import dataclasses

    g = tiny_kg(rng)
    rg = build_relation_graph(g)
    base = small_cfg(g.num_relations)
    B, N = 4, 6
    el = np.asarray(g.edge_list)
    pos = el[rng.choice(len(el), B, replace=False)]
    h, t, r = (jnp.asarray(pos[:, i]) for i in range(3))
    neg = jnp.asarray(rng.integers(0, g.num_nodes, (B, N)).astype(np.int32))
    params = ultra_init(jax.random.PRNGKey(0), base)

    results = {}
    for mode in (False, True, "save_rspmm"):
        cfg = dataclasses.replace(
            base,
            entity=dataclasses.replace(base.entity, remat=mode),
            relation=dataclasses.replace(base.relation, remat=mode),
        )

        def loss(p):
            return bce_self_adversarial(
                ultra_train_scores(p, cfg, g, rg, h, t, r, neg)
            )

        l, grads = jax.value_and_grad(loss)(params)
        results[str(mode)] = (float(l), jax.tree_util.tree_leaves(grads))
    base_l, base_g = results["False"]
    for mode, (l, gl) in results.items():
        assert abs(l - base_l) < 1e-6, mode
        for a, b in zip(gl, base_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6, err_msg=mode)


def test_micro_batch_identical_scores_and_gradients(rng):
    """micro_batch chunks the entity tower into a checkpointed lax.map;
    forward scores and weight gradients must match the unchunked run."""
    import dataclasses

    g = tiny_kg(rng)
    rg = build_relation_graph(g)
    base = small_cfg(g.num_relations)
    B, N = 8, 6
    el = np.asarray(g.edge_list)
    pos = el[rng.choice(len(el), B, replace=False)]
    h, t, r = (jnp.asarray(pos[:, i]) for i in range(3))
    neg = jnp.asarray(rng.integers(0, g.num_nodes, (B, N)).astype(np.int32))
    params = ultra_init(jax.random.PRNGKey(0), base)

    def loss(p, cfg):
        return bce_self_adversarial(
            ultra_train_scores(p, cfg, g, rg, h, t, r, neg)
        )

    results = {}
    for mb in (0, 2, 4):
        cfg = dataclasses.replace(
            base, entity=dataclasses.replace(base.entity, micro_batch=mb)
        )
        l, grads = jax.value_and_grad(lambda p: loss(p, cfg))(params)
        results[mb] = (float(l), jax.tree_util.tree_leaves(grads))
    l0, g0 = results[0]
    for mb in (2, 4):
        l, gl = results[mb]
        assert abs(l - l0) < 1e-6, mb
        for a, b in zip(gl, g0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6, err_msg=str(mb))


def test_auto_micro_batch_sizing():
    """auto_micro_batch halves the chunk until the per-layer carries fit half
    the HBM budget; explicit settings and fitting batches are untouched."""
    import dataclasses

    from ultra_torchdrug_tpu.tasks.task import (
        _MB_BUDGET_FRACTION, _hbm_bytes, auto_micro_batch,
    )

    cfg = small_cfg(5)  # 2 layers, D=8
    budget = _MB_BUDGET_FRACTION * _hbm_bytes()
    # tiny graph: fits, no change
    assert auto_micro_batch(cfg, 1000, 64).entity.micro_batch == 0
    # synthetic huge graph: 2 * V * 64 * 8 * 4 bytes > budget -> must chunk
    huge_v = int(budget / (2 * 8 * 4 * 8)) + 1  # fits only at mb <= 8
    out = auto_micro_batch(cfg, huge_v, 64)
    mb = out.entity.micro_batch
    assert 0 < mb <= 8 and 64 % mb == 0
    # explicit micro_batch wins
    explicit = dataclasses.replace(
        cfg, entity=dataclasses.replace(cfg.entity, micro_batch=16)
    )
    assert auto_micro_batch(explicit, huge_v, 64).entity.micro_batch == 16
