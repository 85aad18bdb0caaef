"""Multi-chip tests on the virtual 8-device CPU mesh: edge-partitioned rspmm
and the full ULTRA training step under data x edge sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ultra_torchdrug_tpu.data.graph import Graph
from ultra_torchdrug_tpu.data.relgraph import build_relation_graph
from ultra_torchdrug_tpu.models.nbfnet import entity_nbfnet_config, rel_nbfnet_config
from ultra_torchdrug_tpu.models.ultra import (
    UltraConfig, ultra_init, ultra_train_scores,
)
from ultra_torchdrug_tpu.ops.rspmm import generalized_rspmm
from ultra_torchdrug_tpu.parallel.mesh import make_mesh, use_mesh
from ultra_torchdrug_tpu.parallel.sharded_rspmm import sharded_rspmm
from ultra_torchdrug_tpu.tasks.kg import bce_self_adversarial


def padded_graph(rng, V=20, E=96, R=5, pad_to=8):
    E = (E // pad_to) * pad_to
    triplets = np.stack(
        [rng.integers(0, V, E), rng.integers(0, V, E), rng.integers(0, R, E)], axis=1
    ).astype(np.int32)
    return Graph.from_triplets(triplets, V, R)


def test_sharded_rspmm_matches_dense(rng):
    assert len(jax.devices()) >= 8
    mesh = make_mesh(data=1, edge=8)
    g = padded_graph(rng)
    B, D = 3, 6
    rel = jnp.asarray(rng.normal(size=(g.num_relations, D)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(g.num_nodes, B, D)).astype(np.float32))

    want = generalized_rspmm(
        g.edge_index, g.edge_type, g.edge_weight, rel, x,
        msg="mul", agg="add", num_nodes=g.num_nodes,
    )
    got = sharded_rspmm(
        g.edge_index, g.edge_type, g.edge_weight, rel, x,
        msg="mul", num_nodes=g.num_nodes, mesh=mesh,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_sharded_rspmm_grads_match(rng):
    mesh = make_mesh(data=1, edge=8)
    g = padded_graph(rng)
    B, D = 2, 4
    rel = jnp.asarray(rng.normal(size=(g.num_relations, B, D)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(g.num_nodes, B, D)).astype(np.float32))

    def loss_ref(rel, x):
        out = generalized_rspmm(
            g.edge_index, g.edge_type, g.edge_weight, rel, x,
            msg="mul", agg="add", num_nodes=g.num_nodes,
        )
        return jnp.sum(out * jnp.cos(out))

    def loss_sharded(rel, x):
        out = sharded_rspmm(
            g.edge_index, g.edge_type, g.edge_weight, rel, x,
            msg="mul", num_nodes=g.num_nodes, mesh=mesh,
        )
        return jnp.sum(out * jnp.cos(out))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(rel, x)
    g_sh = jax.grad(loss_sharded, argnums=(0, 1))(rel, x)
    for a, b in zip(g_ref, g_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_ultra_train_step_with_edge_sharding(rng):
    """Full train-score pass with edge-partitioned propagation equals the
    unsharded result."""
    mesh = make_mesh(data=1, edge=8)
    # num edges divisible by 8 so the undirected graph (2E) shards evenly
    g = padded_graph(rng, V=24, E=120, R=4, pad_to=8)
    rg_raw = build_relation_graph(g)
    # pad relation graph edges to a multiple of 8 with weight-0 edges
    pad = (-rg_raw.num_edges) % 8
    if pad:
        tri = np.concatenate(
            [np.asarray(rg_raw.edge_list), np.zeros((pad, 3), np.int32)], 0
        )
        wts = np.concatenate(
            [np.asarray(rg_raw.edge_weight), np.zeros(pad, np.float32)]
        )
        rg = Graph.from_triplets(tri, rg_raw.num_nodes, 4, edge_weight=wts)
    else:
        rg = rg_raw

    def cfgs(axis):
        return UltraConfig(
            entity=entity_nbfnet_config(
                input_dim=8, hidden_dims=(8, 8), num_relations=g.num_relations * 2,
                edge_axis=axis,
            ),
            relation=rel_nbfnet_config(
                input_dim=8, hidden=8, num_layers=2, edge_axis=axis,
            ),
        )

    params = ultra_init(jax.random.PRNGKey(0), cfgs(""))
    B, N = 4, 6
    el = np.asarray(g.edge_list)
    pos = el[rng.choice(len(el), B, replace=False)]
    h, t, r = (jnp.asarray(pos[:, i]) for i in range(3))
    neg = jnp.asarray(rng.integers(0, g.num_nodes, (B, N)).astype(np.int32))

    plain = ultra_train_scores(params, cfgs(""), g, rg, h, t, r, neg)
    with use_mesh(mesh):
        sharded = jax.jit(
            lambda p: ultra_train_scores(p, cfgs("edge"), g, rg, h, t, r, neg)
        )(params)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(plain), rtol=1e-4, atol=1e-5
    )

    def loss_plain(p):
        return bce_self_adversarial(
            ultra_train_scores(p, cfgs(""), g, rg, h, t, r, neg)
        )

    def loss_sharded(p):
        return bce_self_adversarial(
            ultra_train_scores(p, cfgs("edge"), g, rg, h, t, r, neg)
        )

    gp = jax.grad(loss_plain)(params)
    with use_mesh(mesh):
        gs = jax.jit(jax.grad(loss_sharded))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_engine_data_parallel_matches_single(tmp_path, rng):
    """Engine with an 8-way data mesh produces the same losses as without."""
    from ultra_torchdrug_tpu.data.datasets import synthetic_transductive
    from ultra_torchdrug_tpu.engine.engine import Engine
    from ultra_torchdrug_tpu.tasks.task import TaskConfig, TransductiveKGTask

    ds = synthetic_transductive(num_nodes=30, num_edges=240, num_relations=4)
    cfg = UltraConfig(
        entity=entity_nbfnet_config(input_dim=8, hidden_dims=(8, 8),
                                    num_relations=ds.num_relations * 2),
        relation=rel_nbfnet_config(input_dim=8, hidden=8, num_layers=2),
    )

    def run(mesh):
        task = TransductiveKGTask(ds, cfg, TaskConfig(num_negative=8))
        eng = Engine(task, batch_size=16, lr=1e-3, seed=7,
                     work_dir=str(tmp_path), log_interval=10**9, mesh=mesh)
        eng.train(num_epoch=1, batch_per_epoch=3)
        batch = task.train_triples[:16]
        loss, _ = task.loss_step(eng.params, jax.random.PRNGKey(0), batch)
        return float(loss)

    l_single = run(None)
    l_dp = run(make_mesh(data=8, edge=1))
    assert abs(l_single - l_dp) < 1e-4


def test_distributed_helpers_single_process():
    from ultra_torchdrug_tpu.parallel import distributed as dist

    assert dist.process_count() == 1
    m = dist.reduce_metrics_mean({"a": 1.0})
    assert m == {"a": 1.0}
    r = np.arange(10).reshape(5, 2)
    np.testing.assert_array_equal(dist.gather_rankings(r), r)
    np.testing.assert_array_equal(dist.shard_eval_triples(r), r)
    assert not dist.initialize_distributed()


def test_round_robin_gather_realigns():
    """Simulated multi-process eval: pad + round-robin shard, per-process
    results stacked process-major, inversion restores original triple order
    (per-relation metrics attribute ranks by that order)."""
    from ultra_torchdrug_tpu.parallel import distributed as dist

    for n, P in [(10, 3), (8, 4), (7, 2), (5, 5), (3, 4)]:
        vals = np.arange(n * 2).reshape(n, 2)
        pad = (-n) % P
        padded = np.concatenate([vals, np.repeat(vals[:1], pad, 0)], 0)
        shards = [padded[p::P] for p in range(P)]
        flat = np.concatenate(shards, 0)  # process-major, like allgather
        out = dist.invert_round_robin(flat, P)[:n]
        np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("msg", ["mul", "add"])
def test_partitioned_rspmm_pallas(rng, msg):
    """Production multi-chip path: destination/source row-block partitioned
    Pallas kernels (interpret mode on the CPU mesh) — no full-tensor psum.
    Forward and both gradients match the unsharded XLA op."""
    from ultra_torchdrug_tpu.parallel.sharded_rspmm import (
        build_partitioned_rspmm_inputs, partitioned_rspmm_pallas,
    )

    mesh = make_mesh(data=1, edge=8)
    V, E, R, B, D = 21, 150, 5, 2, 4
    tri = np.stack([
        rng.integers(0, V, E), rng.integers(0, V, E), rng.integers(0, R, E)
    ], 1).astype(np.int32)
    w = jnp.asarray(rng.uniform(0.5, 1.5, E).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(R, B, D)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(V, B, D)).astype(np.float32))

    layouts = build_partitioned_rspmm_inputs(
        tri[:, :2], tri[:, 2], V, R, 8, tile_rows=8, tile_edges=16,
        include_rel_layout=(msg == "add"),
    )

    def loss_ref(rel, x, ww):
        out = generalized_rspmm(
            jnp.asarray(tri[:, :2]), jnp.asarray(tri[:, 2]), ww,
            rel, x, msg=msg, agg="add", num_nodes=V,
        )
        return jnp.sum(out * jnp.sin(out)), out

    def loss_pt(rel, x, ww):
        out = partitioned_rspmm_pallas(
            ww, layouts, rel, x, msg=msg, mesh=mesh,
        )
        return jnp.sum(out * jnp.sin(out)), out

    (_, out_ref), (_, out_pt) = loss_ref(rel, x, w), loss_pt(rel, x, w)
    np.testing.assert_allclose(np.asarray(out_pt), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    g_ref = jax.grad(lambda r, xx: loss_ref(r, xx, w)[0], argnums=(0, 1))(rel, x)
    g_pt = jax.jit(jax.grad(lambda r, xx: loss_pt(r, xx, w)[0], argnums=(0, 1)))(rel, x)
    for a, b in zip(g_ref, g_pt):
        # telescoping accumulation (rspmm_pallas NACC sum-minus-mark) rounds
        # differently than the oracle's per-edge order; small-magnitude grad
        # elements see ~1e-5 absolute drift
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=3e-5)


def test_partitioned_rspmm_dynamic_weights(rng):
    """Per-batch edge weights (easy-edge masking) flow through the replicated
    [E] weight vector + global edge_id re-gather — masked edges contribute
    nothing on every shard."""
    from ultra_torchdrug_tpu.parallel.sharded_rspmm import (
        build_partitioned_rspmm_inputs, partitioned_rspmm_pallas,
    )

    mesh = make_mesh(data=1, edge=8)
    V, E, R, B, D = 17, 120, 4, 2, 4
    tri = np.stack([
        rng.integers(0, V, E), rng.integers(0, V, E), rng.integers(0, R, E)
    ], 1).astype(np.int32)
    mask = (rng.uniform(size=E) > 0.3).astype(np.float32)
    rel = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(V, B, D)).astype(np.float32))
    layouts = build_partitioned_rspmm_inputs(
        tri[:, :2], tri[:, 2], V, R, 8, tile_rows=8, tile_edges=16,
    )
    want = generalized_rspmm(
        jnp.asarray(tri[:, :2]), jnp.asarray(tri[:, 2]), jnp.asarray(mask),
        rel, x, msg="mul", agg="add", num_nodes=V,
    )
    got = partitioned_rspmm_pallas(
        jnp.asarray(mask), layouts, rel, x, msg="mul", mesh=mesh,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ultra_train_step_partitioned_pallas(rng):
    """Full ULTRA train-score + grads with rspmm_impl='pallas' and edge_axis:
    the conv routes through partitioned_rspmm_pallas (graph.part_layouts) and
    matches the unsharded XLA result."""
    mesh = make_mesh(data=1, edge=4)
    g = padded_graph(rng, V=18, E=64, R=3, pad_to=8)
    rg_raw = build_relation_graph(g)
    pad = (-rg_raw.num_edges) % 4
    tri = np.concatenate(
        [np.asarray(rg_raw.edge_list), np.zeros((pad, 3), np.int32)], 0
    ) if pad else np.asarray(rg_raw.edge_list)
    wts = np.concatenate(
        [np.asarray(rg_raw.edge_weight), np.zeros(pad, np.float32)]
    ) if pad else np.asarray(rg_raw.edge_weight)
    rg = Graph.from_triplets(tri, rg_raw.num_nodes, 4, edge_weight=wts)

    def cfgs(axis, impl):
        return UltraConfig(
            entity=entity_nbfnet_config(
                input_dim=8, hidden_dims=(8, 8), num_relations=g.num_relations * 2,
                edge_axis=axis, rspmm_impl=impl,
            ),
            relation=rel_nbfnet_config(
                input_dim=8, hidden=8, num_layers=2, edge_axis=axis,
                rspmm_impl=impl,
            ),
        )

    params = ultra_init(jax.random.PRNGKey(0), cfgs("", "xla"))
    B, N = 3, 5
    el = np.asarray(g.edge_list)
    pos = el[rng.choice(len(el), B, replace=False)]
    h, t, r = (jnp.asarray(pos[:, i]) for i in range(3))
    neg = jnp.asarray(rng.integers(0, g.num_nodes, (B, N)).astype(np.int32))

    # graphs with sharded layouts attached (what the task layer prepares:
    # the UNDIRECTED propagation graph carries the layouts — the model reuses
    # its topology and substitutes per-batch masked weights)
    g_und = g.undirected_with_inverse() \
             .prepare_pallas(tile_rows=8, tile_edges=16, hot_rows=0) \
             .prepare_pallas_sharded(4, tile_rows=8, tile_edges=16)
    rg_sh = rg.prepare_pallas(tile_rows=8, tile_edges=16, hot_rows=0) \
              .prepare_pallas_sharded(4, tile_rows=8, tile_edges=16)

    # guard against a silent XLA fallback: count partitioned-path calls
    import importlib

    sr = importlib.import_module(
        "ultra_torchdrug_tpu.parallel.sharded_rspmm"
    )
    calls = {"n": 0}
    real = sr.partitioned_rspmm_pallas

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    sr.partitioned_rspmm_pallas = counting
    try:
        plain = ultra_train_scores(params, cfgs("", "xla"), g, rg, h, t, r, neg)
        with use_mesh(mesh):
            sharded = jax.jit(
                lambda p: ultra_train_scores(
                    p, cfgs("edge", "pallas"), g, rg_sh, h, t, r, neg,
                    fact_graph_und=g_und,
                )
            )(params)
    finally:
        sr.partitioned_rspmm_pallas = real
    assert calls["n"] > 0, "partitioned Pallas path was never taken"
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(plain), rtol=1e-4, atol=1e-5
    )

    def loss_plain(p):
        return bce_self_adversarial(
            ultra_train_scores(p, cfgs("", "xla"), g, rg, h, t, r, neg)
        )

    def loss_sharded(p):
        return bce_self_adversarial(
            ultra_train_scores(
                p, cfgs("edge", "pallas"), g, rg_sh, h, t, r, neg,
                fact_graph_und=g_und,
            )
        )

    gp = jax.grad(loss_plain)(params)
    with use_mesh(mesh):
        gs = jax.jit(jax.grad(loss_sharded))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# ring-pipelined row-sharded rspmm (O(V/n) node-state memory per chip)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("msg", ["mul", "add"])
def test_ring_rspmm_matches_oracle(rng, msg):
    from ultra_torchdrug_tpu.parallel.ring_rspmm import (
        build_ring_rspmm_inputs, ring_rspmm,
    )

    mesh = make_mesh(data=1, edge=8)
    g = padded_graph(rng, V=43, E=160, R=5)  # V not divisible by n: pad path
    B, D = 3, 6
    rel = jnp.asarray(rng.normal(size=(g.num_relations, D)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(g.num_nodes, B, D)).astype(np.float32))
    inputs = build_ring_rspmm_inputs(g.edge_index, g.edge_type, g.num_nodes, 8)

    want = generalized_rspmm(
        g.edge_index, g.edge_type, g.edge_weight, rel, x,
        msg=msg, agg="add", num_nodes=g.num_nodes,
    )
    got = jax.jit(
        lambda w, r, xx: ring_rspmm(w, inputs, r, xx, msg=msg, mesh=mesh)
    )(g.edge_weight, rel, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("rel_shape", ["shared", "per_batch"])
def test_ring_rspmm_grads_match(rng, rel_shape):
    from ultra_torchdrug_tpu.parallel.ring_rspmm import (
        build_ring_rspmm_inputs, ring_rspmm,
    )

    mesh = make_mesh(data=1, edge=8)
    g = padded_graph(rng, V=30, E=128, R=4)
    B, D = 2, 4
    shape = (g.num_relations, D) if rel_shape == "shared" else (
        g.num_relations, B, D)
    rel = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(g.num_nodes, B, D)).astype(np.float32))
    inputs = build_ring_rspmm_inputs(g.edge_index, g.edge_type, g.num_nodes, 8)
    probe = jnp.asarray(
        rng.normal(size=(g.num_nodes, B, D)).astype(np.float32))

    def loss_ref(rel, x):
        out = generalized_rspmm(
            g.edge_index, g.edge_type, g.edge_weight, rel, x,
            msg="mul", agg="add", num_nodes=g.num_nodes,
        )
        return jnp.sum(out * probe)

    def loss_ring(rel, x):
        out = ring_rspmm(g.edge_weight, inputs, rel, x, msg="mul", mesh=mesh)
        return jnp.sum(out * probe)

    want = jax.grad(loss_ref, argnums=(0, 1))(rel, x)
    got = jax.jit(jax.grad(loss_ring, argnums=(0, 1)))(rel, x)
    for w, g_ in zip(want, got):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_ring_rspmm_keeps_states_row_sharded(rng):
    """The op's output (and consumed x) shard along the edge axis — the
    memory-scaling contract: no chip materializes full node states inside."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ultra_torchdrug_tpu.parallel.ring_rspmm import (
        build_ring_rspmm_inputs, ring_rspmm,
    )

    mesh = make_mesh(data=1, edge=8)
    g = padded_graph(rng, V=64, E=192, R=4)
    B, D = 2, 4
    rel = jnp.asarray(rng.normal(size=(g.num_relations, D)).astype(np.float32))
    x = jax.device_put(
        jnp.asarray(rng.normal(size=(g.num_nodes, B, D)).astype(np.float32)),
        NamedSharding(mesh, P("edge")),
    )
    inputs = build_ring_rspmm_inputs(g.edge_index, g.edge_type, g.num_nodes, 8)
    out = jax.jit(
        lambda w, r, xx: ring_rspmm(w, inputs, r, xx, msg="mul", mesh=mesh)
    )(g.edge_weight, rel, x)
    assert not out.sharding.is_fully_replicated
    want = generalized_rspmm(
        g.edge_index, g.edge_type, g.edge_weight, rel,
        jax.device_put(x, NamedSharding(mesh, P())), msg="mul", agg="add",
        num_nodes=g.num_nodes,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ultra_train_step_ring(rng):
    """Full ULTRA train-score + grads with rspmm_impl='ring': the conv routes
    through the row-sharded ring path (graph.ring_inputs) and matches the
    unsharded XLA result."""
    import importlib

    rr_mod = importlib.import_module("ultra_torchdrug_tpu.parallel.ring_rspmm")

    mesh = make_mesh(data=1, edge=4)
    g = padded_graph(rng, V=18, E=64, R=3, pad_to=8)
    rg = build_relation_graph(g)

    def cfgs(axis, impl):
        return UltraConfig(
            entity=entity_nbfnet_config(
                input_dim=8, hidden_dims=(8, 8), num_relations=g.num_relations * 2,
                edge_axis=axis, rspmm_impl=impl,
            ),
            relation=rel_nbfnet_config(
                input_dim=8, hidden=8, num_layers=2, edge_axis=axis,
                rspmm_impl=impl,
            ),
        )

    params = ultra_init(jax.random.PRNGKey(0), cfgs("", "xla"))
    B, N = 3, 5
    el = np.asarray(g.edge_list)
    pos = el[rng.choice(len(el), B, replace=False)]
    h, t, r = (jnp.asarray(pos[:, i]) for i in range(3))
    neg = jnp.asarray(rng.integers(0, g.num_nodes, (B, N)).astype(np.int32))

    g_und = g.undirected_with_inverse().prepare_ring(4)
    rg_ring = rg.prepare_ring(4)

    calls = {"n": 0}
    real = rr_mod.ring_rspmm

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    rr_mod.ring_rspmm = counting
    try:
        plain = ultra_train_scores(params, cfgs("", "xla"), g, rg, h, t, r, neg)
        with use_mesh(mesh):
            ringed = jax.jit(
                lambda p: ultra_train_scores(
                    p, cfgs("edge", "ring"), g, rg_ring, h, t, r, neg,
                    fact_graph_und=g_und,
                )
            )(params)
    finally:
        rr_mod.ring_rspmm = real
    assert calls["n"] > 0, "ring path was never taken"
    np.testing.assert_allclose(
        np.asarray(ringed), np.asarray(plain), rtol=1e-4, atol=1e-5
    )

    def loss_plain(p):
        return bce_self_adversarial(
            ultra_train_scores(p, cfgs("", "xla"), g, rg, h, t, r, neg)
        )

    def loss_ring(p):
        return bce_self_adversarial(
            ultra_train_scores(
                p, cfgs("edge", "ring"), g, rg_ring, h, t, r, neg,
                fact_graph_und=g_und,
            )
        )

    gp = jax.grad(loss_plain)(params)
    with use_mesh(mesh):
        gs = jax.jit(jax.grad(loss_ring))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_ring_rspmm_pallas_buckets(rng):
    """Ring steps through the fused Pallas kernels (per-bucket CSR layouts,
    interpret mode on CPU): forward and gradients match the XLA oracle."""
    from ultra_torchdrug_tpu.parallel.ring_rspmm import (
        build_ring_rspmm_inputs, ring_rspmm,
    )

    mesh = make_mesh(data=1, edge=8)
    g = padded_graph(rng, V=40, E=160, R=4)
    B, D = 2, 4
    rel = jnp.asarray(rng.normal(size=(g.num_relations, B, D)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(g.num_nodes, B, D)).astype(np.float32))
    inputs = build_ring_rspmm_inputs(
        g.edge_index, g.edge_type, g.num_nodes, 8,
        pallas=True, tile_rows=8, tile_edges=16,
    )
    assert inputs.fwd_lay is not None
    probe = jnp.asarray(
        rng.normal(size=(g.num_nodes, B, D)).astype(np.float32))

    def loss_ref(rel, x):
        out = generalized_rspmm(
            g.edge_index, g.edge_type, g.edge_weight, rel, x,
            msg="mul", agg="add", num_nodes=g.num_nodes,
        )
        return jnp.sum(out * probe), out

    def loss_ring(rel, x):
        out = ring_rspmm(g.edge_weight, inputs, rel, x, msg="mul", mesh=mesh)
        return jnp.sum(out * probe), out

    (_, want_out), want_g = jax.value_and_grad(
        loss_ref, argnums=(0, 1), has_aux=True)(rel, x)
    (_, got_out), got_g = jax.jit(jax.value_and_grad(
        loss_ring, argnums=(0, 1), has_aux=True))(rel, x)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               rtol=1e-5, atol=1e-5)
    for w, got in zip(want_g, got_g):
        np.testing.assert_allclose(np.asarray(got), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# degree-balanced relabeling (parallel/balance.py)
# ---------------------------------------------------------------------------


def zipf_graph(rng, V=200, E=1600, R=5):
    """Hub-dominated endpoints: contiguous blocks are badly edge-imbalanced."""
    ranks = rng.zipf(1.5, size=6 * E)
    ranks = ranks[ranks <= V][:E] - 1
    other = rng.integers(0, V, E)
    tri = np.stack([ranks, other, rng.integers(0, R, E)], 1).astype(np.int32)
    # make it undirected-like so in-degree == out-degree per node
    inv = tri[:, [1, 0, 2]]
    return Graph.from_triplets(np.concatenate([tri, inv]), V, R)


def hub_graph(rng, V=200, E=1600, R=5, hubs=16, hub_frac=0.5):
    """FB15k237-like hub structure: a cluster of hub nodes carries half the
    edges but each single hub stays well under one block's edge share (3% vs
    12.5%) — the regime where node-granularity relabeling can balance. The
    hubs share low ids, so CONTIGUOUS blocks are badly imbalanced."""
    n_hub = int(E * hub_frac)
    src = np.concatenate([
        rng.integers(0, hubs, n_hub), rng.integers(0, V, E - n_hub)
    ])
    tri = np.stack(
        [src, rng.integers(0, V, E), rng.integers(0, R, E)], 1
    ).astype(np.int32)
    inv = tri[:, [1, 0, 2]]
    return Graph.from_triplets(np.concatenate([tri, inv]), V, R)


def test_degree_balanced_permutation(rng):
    from ultra_torchdrug_tpu.parallel.balance import (
        block_edge_counts, degree_balanced_permutation, imbalance,
    )

    g = hub_graph(rng)
    ei = np.asarray(g.edge_index)
    src, dst = ei[:, 0], ei[:, 1]
    n = 8
    before = imbalance(dst, g.num_nodes, n)
    assert before > 2.0  # hub block dominates under contiguous ids

    to_new, to_old = degree_balanced_permutation(src, dst, g.num_nodes, n)
    # permutation sanity: bijection over V, empty slots point at the pad row
    assert sorted(to_new.tolist()) == list(range(g.num_nodes))
    filled = to_old[to_old < g.num_nodes]
    assert sorted(filled.tolist()) == list(range(g.num_nodes))
    np.testing.assert_array_equal(to_old[to_new], np.arange(g.num_nodes))

    after_dst = imbalance(to_new[dst], g.num_nodes, n)
    after_src = imbalance(to_new[src], g.num_nodes, n)
    # near-exact balance on both partitions from the single permutation
    assert after_dst < 1.05 and after_src < 1.05
    # every block carries edges
    assert block_edge_counts(to_new[dst], g.num_nodes, n).min() > 0


@pytest.mark.parametrize(
    "path", ["ring", "ring_pallas", "partitioned", "partitioned_transe"]
)
def test_balanced_paths_match_oracle(rng, path):
    """balance=True through each multi-chip path: forward + both grads match
    the unsharded XLA op on a hub-heavy graph (the permutation is an
    internal relabeling — the op contract stays original node order).
    partitioned_transe covers the rel-layout family (d_relation via the
    relation-sorted gathers) under relabeled row ownership."""
    mesh = make_mesh(data=1, edge=8)
    g = zipf_graph(rng, V=45, E=220)
    B, D = 2, 4
    msg = "add" if path == "partitioned_transe" else "mul"
    rel = jnp.asarray(rng.normal(size=(g.num_relations, B, D)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(g.num_nodes, B, D)).astype(np.float32))
    probe = jnp.asarray(rng.normal(size=(g.num_nodes, B, D)).astype(np.float32))

    if path.startswith("partitioned"):
        from ultra_torchdrug_tpu.parallel.sharded_rspmm import (
            build_partitioned_rspmm_inputs, partitioned_rspmm_pallas,
        )

        inputs = build_partitioned_rspmm_inputs(
            g.edge_index, g.edge_type, g.num_nodes, g.num_relations, 8,
            tile_rows=8, tile_edges=16, balance=True,
            include_rel_layout=(msg == "add"),
        )
        assert inputs.to_new is not None

        def shard_out(w, r, xx):
            return partitioned_rspmm_pallas(w, inputs, r, xx, msg=msg,
                                            mesh=mesh)
    else:
        from ultra_torchdrug_tpu.parallel.ring_rspmm import (
            build_ring_rspmm_inputs, ring_rspmm,
        )

        inputs = build_ring_rspmm_inputs(
            g.edge_index, g.edge_type, g.num_nodes, 8, balance=True,
            pallas=(path == "ring_pallas"), tile_rows=8, tile_edges=16,
        )
        assert inputs.to_new is not None

        def shard_out(w, r, xx):
            return ring_rspmm(w, inputs, r, xx, msg="mul", mesh=mesh)

    def loss_ref(r, xx):
        out = generalized_rspmm(
            g.edge_index, g.edge_type, g.edge_weight, r, xx,
            msg=msg, agg="add", num_nodes=g.num_nodes,
        )
        return jnp.sum(out * probe), out

    def loss_sh(r, xx):
        out = shard_out(g.edge_weight, r, xx)
        return jnp.sum(out * probe), out

    (_, want_out), want_g = jax.value_and_grad(
        loss_ref, argnums=(0, 1), has_aux=True)(rel, x)
    (_, got_out), got_g = jax.jit(jax.value_and_grad(
        loss_sh, argnums=(0, 1), has_aux=True))(rel, x)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               rtol=1e-4, atol=1e-5)
    for w, got in zip(want_g, got_g):
        np.testing.assert_allclose(np.asarray(got), np.asarray(w),
                                   rtol=1e-4, atol=3e-5)


def test_ultra_train_step_ring_permuted_balanced(rng):
    """Task-style ring prep (permuted_io=True, balance=True): the entity
    tower carries block-domain states for the whole stack and only maps
    indices at the boundary scatter / score readout — scores and grads match
    the unsharded XLA model on a hub-heavy graph."""
    mesh = make_mesh(data=1, edge=4)
    g = hub_graph(rng, V=30, E=120, R=3, hubs=6)
    # hub_graph returns the undirected-like graph; carve a directed half for
    # the model flow (the und graph is rebuilt below like the task does)
    tri = np.asarray(g.edge_list)[: g.num_edges // 2]
    g = Graph.from_triplets(tri, g.num_nodes, g.num_relations)
    rg = build_relation_graph(g)

    def cfgs(axis, impl):
        return UltraConfig(
            entity=entity_nbfnet_config(
                input_dim=8, hidden_dims=(8, 8),
                num_relations=g.num_relations * 2,
                edge_axis=axis, rspmm_impl=impl,
            ),
            relation=rel_nbfnet_config(
                input_dim=8, hidden=8, num_layers=2, edge_axis=axis,
                rspmm_impl=impl,
            ),
        )

    params = ultra_init(jax.random.PRNGKey(0), cfgs("", "xla"))
    B, N = 3, 5
    el = np.asarray(g.edge_list)
    pos = el[rng.choice(len(el), B, replace=False)]
    h, t, r = (jnp.asarray(pos[:, i]) for i in range(3))
    neg = jnp.asarray(rng.integers(0, g.num_nodes, (B, N)).astype(np.int32))

    g_und = g.undirected_with_inverse().prepare_ring(
        4, balance=True, permuted_io=True
    )
    assert g_und.ring_inputs.permuted_io
    assert g_und.ring_inputs.to_new is not None
    rg_ring = rg.prepare_ring(4)

    plain = ultra_train_scores(params, cfgs("", "xla"), g, rg, h, t, r, neg)

    def loss_ring(p):
        s = ultra_train_scores(
            p, cfgs("edge", "ring"), g, rg_ring, h, t, r, neg,
            fact_graph_und=g_und,
        )
        return bce_self_adversarial(s), s

    with use_mesh(mesh):
        (_, ringed), grads_r = jax.jit(
            jax.value_and_grad(loss_ring, has_aux=True))(params)
    np.testing.assert_allclose(np.asarray(ringed), np.asarray(plain),
                               rtol=1e-4, atol=1e-5)

    def loss_plain(p):
        return bce_self_adversarial(
            ultra_train_scores(p, cfgs("", "xla"), g, rg, h, t, r, neg)
        )

    grads_p = jax.grad(loss_plain)(params)
    for a, b in zip(jax.tree_util.tree_leaves(grads_p),
                    jax.tree_util.tree_leaves(grads_r)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_eval_data_parallel_matches_single(tmp_path, rng):
    """Eval batches shard over the mesh's data axis (single-process
    multi-device); metrics are identical to the un-meshed run."""
    from ultra_torchdrug_tpu.data.datasets import synthetic_transductive
    from ultra_torchdrug_tpu.engine.engine import Engine
    from ultra_torchdrug_tpu.tasks.task import TaskConfig, TransductiveKGTask

    ds = synthetic_transductive(num_nodes=30, num_edges=240, num_relations=4)
    cfg = UltraConfig(
        entity=entity_nbfnet_config(input_dim=8, hidden_dims=(8, 8),
                                    num_relations=ds.num_relations * 2),
        relation=rel_nbfnet_config(input_dim=8, hidden=8, num_layers=2),
    )

    def run(mesh):
        task = TransductiveKGTask(ds, cfg, TaskConfig(num_negative=8))
        eng = Engine(task, batch_size=16, lr=1e-3, seed=7,
                     work_dir=str(tmp_path), log_interval=10**9, mesh=mesh)
        ctx = use_mesh(mesh) if mesh is not None else use_mesh(None)
        with ctx:
            return eng.evaluate("valid")

    m_single = run(None)
    m_dp = run(make_mesh(data=8, edge=1))
    for k in ("mrr", "mr", "hits@10"):
        assert abs(m_single[k] - m_dp[k]) < 1e-6, k


@pytest.mark.parametrize("agg", ["max", "min"])
@pytest.mark.parametrize("msg", ["mul", "add"])
def test_ring_rspmm_minmax_matches_oracle(rng, msg, agg):
    """Ring max/min: per-bucket extrema combined across steps + argext
    backward match the single-chip semantics (ties have measure zero on
    random continuous inputs)."""
    from ultra_torchdrug_tpu.parallel.ring_rspmm import (
        build_ring_rspmm_inputs, ring_rspmm,
    )

    mesh = make_mesh(data=1, edge=8)
    # dedupe: duplicate (h, t, r) edges are EXACT ties, where the ring (like
    # the single-chip pallas kernels) grants gradient to every tied edge but
    # XLA's segment_max VJP picks one — the documented convention delta
    V, E, R = 43, 160, 5
    tri = np.unique(np.stack(
        [rng.integers(0, V, E), rng.integers(0, V, E), rng.integers(0, R, E)],
        axis=1), axis=0).astype(np.int32)
    g = Graph.from_triplets(tri, V, R)
    B, D = 3, 6
    rel = jnp.asarray(rng.normal(size=(g.num_relations, D)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(g.num_nodes, B, D)).astype(np.float32))
    inputs = build_ring_rspmm_inputs(g.edge_index, g.edge_type, g.num_nodes, 8)
    probe = jnp.asarray(rng.normal(size=(g.num_nodes, B, D)).astype(np.float32))

    want = generalized_rspmm(
        g.edge_index, g.edge_type, g.edge_weight, rel, x,
        msg=msg, agg=agg, num_nodes=g.num_nodes,
    )
    got = jax.jit(
        lambda w, r, xx: ring_rspmm(w, inputs, r, xx, msg=msg, agg=agg,
                                    mesh=mesh)
    )(g.edge_weight, rel, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss_ref(rel, x):
        out = generalized_rspmm(
            g.edge_index, g.edge_type, g.edge_weight, rel, x,
            msg=msg, agg=agg, num_nodes=g.num_nodes,
        )
        return jnp.sum(out * probe)

    def loss_ring(rel, x):
        out = ring_rspmm(g.edge_weight, inputs, rel, x, msg=msg, agg=agg,
                         mesh=mesh)
        return jnp.sum(out * probe)

    want_g = jax.grad(loss_ref, argnums=(0, 1))(rel, x)
    got_g = jax.jit(jax.grad(loss_ring, argnums=(0, 1)))(rel, x)
    for w, g_ in zip(want_g, got_g):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("aggf", ["max", "pna", "mean"])
def test_ultra_train_step_ring_agg_variants(rng, aggf):
    """VERDICT r2 #7: max/pna/mean entity towers under the permuted-IO
    balanced ring (block-domain degree side inputs + ring extrema) — scores
    and grads match the unsharded single-chip model. For max/pna the
    single-chip oracle is the PALLAS path: zero-valued messages from
    not-yet-reached rows tie EXACTLY at the extremum, where ring and pallas
    follow the reference CUDA convention (gradient to every tied edge) while
    XLA's segment extrema VJP picks one."""
    mesh = make_mesh(data=1, edge=4)
    g = hub_graph(rng, V=30, E=120, R=3, hubs=6)
    # dedupe: duplicate edges are exact ties where the ring argext backward
    # (all tied edges) and XLA's segment extrema VJP (one edge) diverge by
    # convention — max/pna grads would differ through no fault of the ring
    tri = np.unique(np.asarray(g.edge_list)[: g.num_edges // 2], axis=0)
    g = Graph.from_triplets(tri, g.num_nodes, g.num_relations)
    rg = build_relation_graph(g)

    def cfgs(axis, impl):
        return UltraConfig(
            entity=entity_nbfnet_config(
                input_dim=8, hidden_dims=(8, 8),
                num_relations=g.num_relations * 2,
                aggregate_func=aggf, edge_axis=axis, rspmm_impl=impl,
            ),
            relation=rel_nbfnet_config(
                input_dim=8, hidden=8, num_layers=2, edge_axis=axis,
                rspmm_impl=impl,
            ),
        )

    params = ultra_init(jax.random.PRNGKey(0), cfgs("", "xla"))
    B, N = 3, 5
    el = np.asarray(g.edge_list)
    pos = el[rng.choice(len(el), B, replace=False)]
    h, t, r = (jnp.asarray(pos[:, i]) for i in range(3))
    neg = jnp.asarray(rng.integers(0, g.num_nodes, (B, N)).astype(np.int32))

    g_und = g.undirected_with_inverse().prepare_ring(
        4, balance=True, permuted_io=True
    )
    rg_ring = rg.prepare_ring(4)

    from ultra_torchdrug_tpu.models.layers import ring_block_domain

    lcfg = cfgs("edge", "ring").entity.layer_configs()[0]
    with use_mesh(mesh):
        assert ring_block_domain(lcfg, g_und) is not None, (
            f"{aggf} should ride the block-domain ring now"
        )

    if aggf == "mean":
        plain_impl, plain_und = "xla", None
    else:  # tie convention: pallas is the matching single-chip oracle
        plain_impl = "pallas"
        plain_und = g.undirected_with_inverse().prepare_pallas()

    plain = ultra_train_scores(
        params, cfgs("", plain_impl), g, rg, h, t, r, neg,
        fact_graph_und=plain_und,
    )

    def loss_ring(p):
        s = ultra_train_scores(
            p, cfgs("edge", "ring"), g, rg_ring, h, t, r, neg,
            fact_graph_und=g_und,
        )
        return bce_self_adversarial(s), s

    with use_mesh(mesh):
        (_, ringed), grads_r = jax.jit(
            jax.value_and_grad(loss_ring, has_aux=True))(params)
    np.testing.assert_allclose(np.asarray(ringed), np.asarray(plain),
                               rtol=1e-4, atol=1e-5)

    def loss_plain(p):
        return bce_self_adversarial(
            ultra_train_scores(p, cfgs("", plain_impl), g, rg, h, t, r, neg,
                               fact_graph_und=plain_und)
        )

    grads_p = jax.grad(loss_plain)(params)
    for a, b in zip(jax.tree_util.tree_leaves(grads_p),
                    jax.tree_util.tree_leaves(grads_r)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Pallas remote-DMA boundary exchange (parallel/rdma.py) — interpret mode
# ---------------------------------------------------------------------------


def test_rdma_rotate_matches_ppermute(rng):
    """The RDMA kernel is a drop-in for ppermute(perm=[(i, i+1) % n])."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from ultra_torchdrug_tpu.parallel.rdma import rdma_rotate

    mesh = make_mesh(data=1, edge=8)
    n = 8
    x = jnp.asarray(rng.normal(size=(n * 6, 4, 8)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n * 6, 8)).astype(np.float32))
    perm = [(i, (i + 1) % n) for i in range(n)]

    def via_rdma(tree):
        return rdma_rotate(tree, axis="edge", n_shards=n)

    def via_ppermute(tree):
        return jax.lax.ppermute(tree, "edge", perm)

    for body in (via_rdma, via_ppermute):
        sm = jax.jit(shard_map(
            body, mesh=mesh, in_specs=P("edge"), out_specs=P("edge"),
            check_vma=False,
        ))
        got = sm((x, y))
        if body is via_rdma:
            got_rdma = got
        else:
            got_pp = got
    for a, b in zip(jax.tree_util.tree_leaves(got_rdma),
                    jax.tree_util.tree_leaves(got_pp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("agg", ["add", "max"])
def test_ring_rspmm_rdma_exchange_matches(rng, agg):
    """ring_rspmm(exchange='rdma') == exchange='ppermute' bitwise, fwd+grad."""
    from ultra_torchdrug_tpu.parallel.ring_rspmm import (
        build_ring_rspmm_inputs, ring_rspmm,
    )

    mesh = make_mesh(data=1, edge=8)
    g = padded_graph(rng, V=43, E=160, R=5)
    B, D = 2, 4
    rel = jnp.asarray(rng.normal(size=(g.num_relations, D)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(g.num_nodes, B, D)).astype(np.float32))
    inputs = build_ring_rspmm_inputs(g.edge_index, g.edge_type, g.num_nodes, 8)
    probe = jnp.asarray(
        rng.normal(size=(g.num_nodes, B, D)).astype(np.float32))

    def make_loss(exchange):
        def loss(rel, x):
            out = ring_rspmm(g.edge_weight, inputs, rel, x, msg="mul",
                             agg=agg, mesh=mesh, exchange=exchange)
            return jnp.sum(out * probe), out
        return loss

    (l_pp, out_pp), g_pp = jax.jit(jax.value_and_grad(
        make_loss("ppermute"), argnums=(0, 1), has_aux=True))(rel, x)
    (l_rd, out_rd), g_rd = jax.jit(jax.value_and_grad(
        make_loss("rdma"), argnums=(0, 1), has_aux=True))(rel, x)
    np.testing.assert_array_equal(np.asarray(out_rd), np.asarray(out_pp))
    for a, b in zip(g_rd, g_pp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
