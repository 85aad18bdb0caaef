"""Offline reference-parity gate: the JAX framework vs the pure-torch oracle
(tests/reference_oracle.py), both executing ONE exported ``.pth`` checkpoint
on the same synthetic KG. Fails on any semantic drift in the conv layer, the
two towers, the relation-graph construction, or the ranking protocol — the
achievable stand-in for the td_ultra_4g zero-shot MRR gate until real
checkpoints/datasets are available (BASELINE.md acceptance table)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import reference_oracle as oracle
from ultra_torchdrug_tpu.data.graph import Graph
from ultra_torchdrug_tpu.data.relgraph import build_relation_graph
from ultra_torchdrug_tpu.models.layers import ConvConfig, conv_apply, conv_init
from ultra_torchdrug_tpu.models.nbfnet import (
    entity_nbfnet_config, rel_nbfnet_config,
)
from ultra_torchdrug_tpu.models.ultra import (
    UltraConfig, ultra_eval_scores, ultra_init,
)
from ultra_torchdrug_tpu.ops.match import head_truth_mask, tail_truth_mask
from ultra_torchdrug_tpu.utils.checkpoint import export_torch_checkpoint

V, E, R, B, D = 30, 220, 5, 6, 16
N_ENT_LAYERS, N_REL_LAYERS = 3, 3


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(7)
    tri = np.stack([
        rng.integers(0, V, E), rng.integers(0, V, E), rng.integers(0, R, E)
    ], 1)
    # cycle edges so every node has in+out coverage (max/min kernel-init
    # corner documented in reference_oracle.py never fires)
    cyc = np.stack([np.arange(V), (np.arange(V) + 1) % V,
                    rng.integers(0, R, V)], 1)
    tri = np.unique(np.concatenate([tri, cyc]), axis=0).astype(np.int32)

    cfg = UltraConfig(
        entity=entity_nbfnet_config(
            input_dim=D, hidden_dims=(D,) * N_ENT_LAYERS, num_relations=R * 2,
        ),
        relation=rel_nbfnet_config(input_dim=D, hidden=D,
                                   num_layers=N_REL_LAYERS),
    )
    params = ultra_init(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path_factory.mktemp("pth") / "parity.pth")
    export_torch_checkpoint(path, params)
    sd = torch.load(path, map_location="cpu", weights_only=False)["model"]

    g = Graph.from_triplets(tri, V, R)
    hq = rng.choice(len(tri), B, replace=False)
    h, t, r = tri[hq, 0], tri[hq, 1], tri[hq, 2]
    return tri, cfg, params, sd, g, h, t, r


def test_relation_graph_matches_reference_construction(setup):
    tri, _, _, _, g, *_ = setup
    rg = build_relation_graph(g)
    ours = set(map(tuple, np.asarray(rg.edge_list).tolist()))
    e_t = torch.tensor(tri[:, :2], dtype=torch.long)
    t_t = torch.tensor(tri[:, 2], dtype=torch.long)
    ref_e, ref_t = oracle.build_relation_graph(e_t, t_t, V, R)
    theirs = set(
        (int(a), int(b), int(c))
        for (a, b), c in zip(ref_e.tolist(), ref_t.tolist())
    )
    assert ours == theirs
    assert rg.num_nodes == 2 * R


def test_per_layer_activations_allclose(setup):
    """Both towers, layer by layer, from one .pth."""
    tri, cfg, params, sd, g, h, t, r = setup
    rg = build_relation_graph(g)

    # --- relation tower -------------------------------------------------
    rel_hid_ref = []
    e_t = torch.tensor(tri[:, :2], dtype=torch.long)
    t_t = torch.tensor(tri[:, 2], dtype=torch.long)
    ref_e, ref_t = oracle.build_relation_graph(e_t, t_t, V, R)
    rel_q_ref = oracle.rel_tower_forward(
        sd, ref_e, ref_t, 2 * R, torch.tensor(r, dtype=torch.long),
        N_REL_LAYERS, D, collect=rel_hid_ref,
    )
    # jax side, layer by layer (same math _propagate runs)
    rq = jnp.asarray(r)
    boundary = jnp.zeros((2 * R, B, D), jnp.float32)
    boundary = boundary.at[rq, jnp.arange(B)].add(jnp.ones((B, D)))
    # oracle edge order differs from ours; rebuild its graph on our side so
    # activations are comparable edge-for-edge
    rg_o = Graph.from_triplets(
        np.concatenate([np.asarray(ref_e), np.asarray(ref_t)[:, None]], 1)
        .astype(np.int32), 2 * R, 4,
    )
    x = boundary
    for i, (p, lcfg) in enumerate(zip(params["relation"]["layers"],
                                      cfg.relation.layer_configs())):
        hid = conv_apply(p, lcfg, rg_o, x, boundary)
        if hid.shape == x.shape:
            hid = hid + x
        np.testing.assert_allclose(
            np.asarray(hid), rel_hid_ref[i].numpy(), rtol=2e-5, atol=2e-5,
            err_msg=f"relation tower layer {i}",
        )
        x = hid
    rel_q_jax = x.transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(rel_q_jax), rel_q_ref.numpy(),
                               rtol=2e-5, atol=2e-5)

    # --- entity tower ----------------------------------------------------
    und = g.undirected_with_inverse()
    ent_hid_ref = []
    e_und = torch.tensor(np.asarray(und.edge_index), dtype=torch.long)
    t_und = torch.tensor(np.asarray(und.edge_type), dtype=torch.long)
    oracle.entity_tower_score_all(
        sd, e_und, t_und, torch.ones(len(e_und)), V,
        torch.tensor(rel_q_ref.numpy()), torch.tensor(h, dtype=torch.long),
        torch.tensor(r, dtype=torch.long), N_ENT_LAYERS, D,
        collect=ent_hid_ref,
    )
    query = rel_q_jax[jnp.arange(B), jnp.asarray(r)]
    bnd = jnp.zeros((V, B, D), jnp.float32)
    bnd = bnd.at[jnp.asarray(h), jnp.arange(B)].add(query)
    x = bnd
    for i, (p, lcfg) in enumerate(zip(params["entity"]["layers"],
                                      cfg.entity.layer_configs())):
        hid = conv_apply(p, lcfg, und, x, bnd, rel_injected=rel_q_jax)
        if hid.shape == x.shape:
            hid = hid + x
        np.testing.assert_allclose(
            np.asarray(hid), ent_hid_ref[i].numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"entity tower layer {i}",
        )
        x = hid


def test_eval_scores_and_ranks_match(setup):
    """The full public zero-shot path: scores allclose, filtered ranks
    IDENTICAL (integer-exact) between frameworks."""
    tri, cfg, params, sd, g, h, t, r = setup
    rg = build_relation_graph(g)
    t_jax, h_jax = ultra_eval_scores(
        params, cfg, g, rg, jnp.asarray(h), jnp.asarray(t), jnp.asarray(r)
    )
    t_ref, h_ref = oracle.ultra_eval_scores(
        sd, torch.tensor(tri[:, :2], dtype=torch.long),
        torch.tensor(tri[:, 2], dtype=torch.long), V, R,
        torch.tensor(h, dtype=torch.long), torch.tensor(t, dtype=torch.long),
        torch.tensor(r, dtype=torch.long), N_ENT_LAYERS, N_REL_LAYERS, D,
    )
    np.testing.assert_allclose(np.asarray(t_jax), t_ref.numpy(),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(h_jax), h_ref.numpy(),
                               rtol=3e-4, atol=3e-4)

    # ranking protocol over the full graph as filter
    el = g.edge_list
    t_truth = tail_truth_mask(el, jnp.asarray(h), jnp.asarray(r), V)
    h_truth = head_truth_mask(el, jnp.asarray(t), jnp.asarray(r), V)
    from ultra_torchdrug_tpu.tasks.kg import filtered_ranking

    t_rank_jax = filtered_ranking(t_jax, jnp.asarray(t), t_truth, True)
    h_rank_jax = filtered_ranking(h_jax, jnp.asarray(h), h_truth, True)

    t_mask_ref = torch.tensor(~np.asarray(t_truth))
    h_mask_ref = torch.tensor(~np.asarray(h_truth))
    t_rank_ref = oracle.filtered_rank(t_ref, torch.tensor(t, dtype=torch.long),
                                      t_mask_ref)
    h_rank_ref = oracle.filtered_rank(h_ref, torch.tensor(h, dtype=torch.long),
                                      h_mask_ref)
    np.testing.assert_array_equal(np.asarray(t_rank_jax),
                                  t_rank_ref.numpy())
    np.testing.assert_array_equal(np.asarray(h_rank_jax),
                                  h_rank_ref.numpy())


@pytest.mark.parametrize("msg", ["transe", "distmult", "rotate"])
@pytest.mark.parametrize("agg", ["sum", "mean", "max", "pna", "sum_nobound",
                                 "pna_nobound"])
def test_conv_layer_parity_all_modes(msg, agg):
    """Every message x aggregation combination of the conv layer against the
    torch oracle (layer.py:302-392 fused-path formulas), shared weights."""
    rng = np.random.default_rng(11)
    v, e, rr, b, d = 20, 120, 4, 3, 8
    tri = np.stack([rng.integers(0, v, e), rng.integers(0, v, e),
                    rng.integers(0, rr, v + e - v)], 1)
    cyc = np.stack([np.arange(v), (np.arange(v) + 1) % v,
                    rng.integers(0, rr, v)], 1)
    tri = np.unique(np.concatenate([tri, cyc]), axis=0).astype(np.int32)
    g = Graph.from_triplets(tri, v, rr,
                            edge_weight=rng.uniform(0.5, 1.5, len(tri)))
    cfg = ConvConfig(
        input_dim=d, output_dim=d, num_relations=rr, query_input_dim=d,
        message_func=msg, aggregate_func=agg, layer_norm=True,
        rel_mode="injected", project=True,
    )
    params = conv_init(jax.random.PRNGKey(0), cfg)
    x = rng.normal(size=(v, b, d)).astype(np.float32)
    bnd = rng.normal(size=(v, b, d)).astype(np.float32)
    rel = rng.normal(size=(b, rr, d)).astype(np.float32)

    out_jax = conv_apply(params, cfg, g, jnp.asarray(x), jnp.asarray(bnd),
                         rel_injected=jnp.asarray(rel))

    sd = {
        "l.linear.weight": torch.tensor(np.asarray(params["linear"]["w"]).T),
        "l.linear.bias": torch.tensor(np.asarray(params["linear"]["b"])),
        "l.layer_norm.weight":
            torch.tensor(np.asarray(params["layer_norm"]["scale"])),
        "l.layer_norm.bias":
            torch.tensor(np.asarray(params["layer_norm"]["bias"])),
    }
    for j, mp in enumerate(params["relation_projection"]["layers"]):
        sd[f"l.relation_projection.layers.{j}.weight"] = \
            torch.tensor(np.asarray(mp["w"]).T)
        sd[f"l.relation_projection.layers.{j}.bias"] = \
            torch.tensor(np.asarray(mp["b"]))
    p = oracle.ConvParams(sd, "l", has_ln=True, has_proj=True)
    out_ref = oracle.conv_forward(
        p, torch.tensor(tri[:, :2], dtype=torch.long),
        torch.tensor(tri[:, 2], dtype=torch.long),
        torch.tensor(np.asarray(g.edge_weight)), v,
        torch.tensor(x), torch.tensor(bnd), rel_input=torch.tensor(rel),
        message_func=msg, aggregate_func=agg,
    )
    np.testing.assert_allclose(np.asarray(out_jax), out_ref.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_torch_autograd(setup, tmp_path):
    """Backward parity: d(loss)/d(weights) from torch autograd through the
    oracle vs jax.grad through both towers (which exercises the rspmm custom
    VJPs end to end), compared key-by-key through the .pth exporter's layout
    mapping. The loss is a smooth function of the full [B, V] score matrices
    so every parameter receives signal."""
    tri, cfg, params, sd, g, h, t, r = setup

    # --- torch side -------------------------------------------------------
    sd_g = {k: v.clone().requires_grad_(True) for k, v in sd.items()}
    t_ref, h_ref = oracle.ultra_eval_scores(
        sd_g, torch.tensor(tri[:, :2], dtype=torch.long),
        torch.tensor(tri[:, 2], dtype=torch.long), V, R,
        torch.tensor(h, dtype=torch.long), torch.tensor(t, dtype=torch.long),
        torch.tensor(r, dtype=torch.long), N_ENT_LAYERS, N_REL_LAYERS, D,
    )
    ((t_ref ** 2).mean() + (h_ref ** 2).mean()).backward()

    # --- jax side ----------------------------------------------------------
    rg = build_relation_graph(g)

    def loss_fn(p):
        ts, hs = ultra_eval_scores(
            p, cfg, g, rg, jnp.asarray(h), jnp.asarray(t), jnp.asarray(r)
        )
        return jnp.mean(ts ** 2) + jnp.mean(hs ** 2)

    grads = jax.grad(loss_fn)(params)
    gpath = str(tmp_path / "grads.pth")
    export_torch_checkpoint(gpath, grads)
    gd = torch.load(gpath, map_location="cpu", weights_only=False)["model"]

    compared = 0
    for k, v in sd_g.items():
        if v.grad is None:  # exporter-only dead params get no oracle grad
            continue
        np.testing.assert_allclose(
            gd[k].numpy(), v.grad.numpy(), rtol=1e-3, atol=1e-5, err_msg=k
        )
        compared += 1
    assert compared >= 4 * (N_ENT_LAYERS + N_REL_LAYERS)


def test_classic_nbfnet_scores_match_oracle():
    """End-to-end classic NBFNet (NeuralBellmanFordNetwork,
    /root/reference/ultra/model.py:198-392): learned query embeddings,
    per-layer DEPENDENT relation projections, pna aggregation, [state;query]
    MLP scoring — all-entity scores against the torch oracle built from the
    same weights."""
    from ultra_torchdrug_tpu.models.classic_nbfnet import (
        classic_nbfnet_config, classic_nbfnet_init, classic_score_all,
    )

    rng = np.random.default_rng(5)
    v, rr, b, d = 18, 4, 3, 8
    e = 90
    tri = np.stack([rng.integers(0, v, e), rng.integers(0, v, e),
                    rng.integers(0, rr, e)], 1).astype(np.int32)
    g = Graph.from_triplets(tri, v, rr)
    g_und = g.undirected_with_inverse()

    cfg = classic_nbfnet_config(
        input_dim=d, hidden_dims=(d, d), num_relations=rr,
        aggregate_func="pna", dependent=True,
    )
    params = classic_nbfnet_init(jax.random.PRNGKey(3), cfg)
    source = np.array([0, 5, 9], np.int32)
    qrel = np.array([1, 0, 2 + rr], np.int32)  # incl. an inverse relation

    scores_jax = np.asarray(classic_score_all(
        params, cfg, g_und, jnp.asarray(source), jnp.asarray(qrel)
    ))  # [B, V]

    # ---- torch oracle from the same weights -------------------------------
    und = np.asarray(g_und.edge_list)
    edges_t = torch.tensor(und[:, :2], dtype=torch.long)
    etype_t = torch.tensor(und[:, 2], dtype=torch.long)
    ew_t = torch.tensor(np.asarray(g_und.edge_weight))
    R2 = cfg.num_relations

    query = torch.tensor(
        np.asarray(params["query"]["weight"]))[torch.tensor(qrel, dtype=torch.long)]
    x = torch.zeros(v, b, d)
    x[torch.tensor(source, dtype=torch.long), torch.arange(b)] = query
    boundary = x.clone()
    for i, lp in enumerate(params["layers"]):
        wl = torch.tensor(np.asarray(lp["relation_linear"]["w"]))
        bl = torch.tensor(np.asarray(lp["relation_linear"]["b"]))
        rel_input = (query @ wl + bl).view(b, R2, d)  # dependent projection
        sd = {
            "l.linear.weight": torch.tensor(np.asarray(lp["linear"]["w"]).T),
            "l.linear.bias": torch.tensor(np.asarray(lp["linear"]["b"])),
        }
        p = oracle.ConvParams(sd, "l", has_ln=False)
        h = oracle.conv_forward(
            p, edges_t, etype_t, ew_t, v, x, boundary,
            rel_input=rel_input, message_func=cfg.message_func,
            aggregate_func="pna",
        )
        if h.shape == x.shape:
            h = h + x  # short_cut
        x = h
    feat = torch.cat([x, query.unsqueeze(0).expand(v, b, d)], -1)
    mlp_layers = [
        (torch.tensor(np.asarray(ml["w"]).T), torch.tensor(np.asarray(ml["b"])))
        for ml in params["mlp"]["layers"]
    ]
    scores_ref = oracle.mlp(mlp_layers, feat)[..., 0].T.numpy()  # [B, V]

    np.testing.assert_allclose(scores_jax, scores_ref, rtol=3e-5, atol=3e-5)
