"""Checkpoint tests: native round trip (covered in test_engine) + the torch
.pth importer against a synthetic state dict in the reference's key layout."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from ultra_torchdrug_tpu.models.nbfnet import (  # noqa: E402
    entity_nbfnet_config, rel_nbfnet_config,
)
from ultra_torchdrug_tpu.models.ultra import UltraConfig, ultra_init  # noqa: E402
from ultra_torchdrug_tpu.utils.checkpoint import import_torch_checkpoint  # noqa: E402


def make_reference_state_dict(num_entity_layers=2, num_rel_layers=2, d=8, R2=10):
    """Reference layout (ultra/model.py TransferNBFNet + rel_model.py RelNBFNet
    inside a task state dict): torch Linear stores [out, in]."""
    g = torch.Generator().manual_seed(0)
    sd = {}

    def lin(key, out_d, in_d):
        sd[f"{key}.weight"] = torch.randn(out_d, in_d, generator=g)
        sd[f"{key}.bias"] = torch.randn(out_d, generator=g)

    for i in range(num_entity_layers):
        lin(f"model.layers.{i}.linear", d, 2 * d)
        sd[f"model.layers.{i}.layer_norm.weight"] = torch.randn(d, generator=g)
        sd[f"model.layers.{i}.layer_norm.bias"] = torch.randn(d, generator=g)
        lin(f"model.layers.{i}.relation_projection.layers.0", d, d)
        lin(f"model.layers.{i}.relation_projection.layers.1", d, d)
    lin("model.mlp.layers.0", 2 * d, 2 * d)
    lin("model.mlp.layers.1", 1, 2 * d)
    sd["model.dist_embed.weight"] = torch.randn(10, d, generator=g)
    for i in range(num_rel_layers):
        lin(f"rel_models.0.model.layers.{i}.linear", d, 2 * d)
        sd[f"rel_models.0.model.layers.{i}.layer_norm.weight"] = torch.randn(d, generator=g)
        sd[f"rel_models.0.model.layers.{i}.layer_norm.bias"] = torch.randn(d, generator=g)
        sd[f"rel_models.0.model.layers.{i}.relation.weight"] = torch.randn(4, d, generator=g)
    # dead rel-tower mlp present in reference checkpoints
    lin("rel_models.0.model.mlp.layers.0", 2 * d, 2 * d)
    lin("rel_models.0.model.mlp.layers.1", d, 2 * d)
    return sd


def template(d=8, R=5):
    cfg = UltraConfig(
        entity=entity_nbfnet_config(input_dim=d, hidden_dims=(d, d),
                                    num_relations=R * 2),
        relation=rel_nbfnet_config(input_dim=d, hidden=d, num_layers=2),
    )
    return cfg, ultra_init(jax.random.PRNGKey(0), cfg)


def test_import_torch_checkpoint(tmp_path):
    sd = make_reference_state_dict()
    path = str(tmp_path / "ref.pth")
    torch.save({"model": sd, "optimizer": {}}, path)

    cfg, params = template()
    imported = import_torch_checkpoint(path, params)

    # linear weights transposed [out,in] -> [in,out]
    want = sd["model.layers.0.linear.weight"].numpy().T
    np.testing.assert_allclose(
        np.asarray(imported["entity"]["layers"][0]["linear"]["w"]), want
    )
    want_b = sd["model.mlp.layers.1.bias"].numpy()
    np.testing.assert_allclose(
        np.asarray(imported["entity"]["mlp"]["layers"][1]["b"]), want_b
    )
    # layer norm weight -> scale
    np.testing.assert_allclose(
        np.asarray(imported["relation"]["layers"][1]["layer_norm"]["scale"]),
        sd["rel_models.0.model.layers.1.layer_norm.weight"].numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(imported["relation"]["layers"][0]["relation"]["weight"]),
        sd["rel_models.0.model.layers.0.relation.weight"].numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(
            imported["entity"]["layers"][1]["relation_projection"]["layers"][0]["w"]
        ),
        sd["model.layers.1.relation_projection.layers.0.weight"].numpy().T,
    )


def test_import_fix_reasoner_keeps_current(tmp_path):
    sd = make_reference_state_dict()
    path = str(tmp_path / "ref.pth")
    torch.save({"model": sd}, path)
    cfg, params = template()
    imported = import_torch_checkpoint(path, params, fix_reasoner=True)
    # relation_projection / relation.weight keep the current init
    np.testing.assert_allclose(
        np.asarray(
            imported["entity"]["layers"][0]["relation_projection"]["layers"][0]["w"]
        ),
        np.asarray(params["entity"]["layers"][0]["relation_projection"]["layers"][0]["w"]),
    )
    np.testing.assert_allclose(
        np.asarray(imported["relation"]["layers"][0]["relation"]["weight"]),
        np.asarray(params["relation"]["layers"][0]["relation"]["weight"]),
    )
    # but the linear weights are loaded
    np.testing.assert_allclose(
        np.asarray(imported["entity"]["layers"][0]["linear"]["w"]),
        sd["model.layers.0.linear.weight"].numpy().T,
    )


def test_imported_model_scores(tmp_path, rng):
    """The imported parameter tree drives a real forward pass."""
    from ultra_torchdrug_tpu.data.graph import Graph
    from ultra_torchdrug_tpu.data.relgraph import build_relation_graph
    from ultra_torchdrug_tpu.models.ultra import ultra_eval_scores
    import jax.numpy as jnp

    sd = make_reference_state_dict()
    path = str(tmp_path / "ref.pth")
    torch.save({"model": sd}, path)
    cfg, params = template()
    imported = import_torch_checkpoint(path, params)

    V, E, R = 20, 90, 5
    tri = np.unique(np.stack([
        rng.integers(0, V, E), rng.integers(0, V, E), rng.integers(0, R, E)
    ], 1), axis=0).astype(np.int32)
    g = Graph.from_triplets(tri, V, R)
    rg = build_relation_graph(g)
    t_s, h_s = ultra_eval_scores(
        imported, cfg, g, rg,
        jnp.asarray([0, 1]), jnp.asarray([2, 3]), jnp.asarray([0, 1]),
    )
    assert np.isfinite(np.asarray(t_s)).all()


def test_export_import_roundtrip(tmp_path):
    """Our params -> reference .pth -> back: bit-identical live weights."""
    from ultra_torchdrug_tpu.utils.checkpoint import export_torch_checkpoint

    cfg, params = template()
    path = str(tmp_path / "exported.pth")
    export_torch_checkpoint(path, params)
    back = import_torch_checkpoint(path, params)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_exported_checkpoint_keys_match_reference_layout(tmp_path):
    from ultra_torchdrug_tpu.utils.checkpoint import export_torch_checkpoint

    cfg, params = template()
    path = str(tmp_path / "exported.pth")
    export_torch_checkpoint(path, params)
    sd = torch.load(path, weights_only=False)["model"]
    want_subset = {
        "model.layers.0.linear.weight",
        "model.layers.0.layer_norm.weight",
        "model.layers.0.relation_projection.layers.0.weight",
        "model.mlp.layers.1.bias",
        "model.dist_embed.weight",
        "rel_models.0.model.layers.1.relation.weight",
        "rel_models.0.model.mlp.layers.0.weight",
    }
    assert want_subset <= set(sd)
    # torch layout: Linear stores [out, in]
    assert sd["model.layers.0.linear.weight"].shape == (8, 16)


def test_multi_tower_export_import_roundtrip(tmp_path):
    from ultra_torchdrug_tpu.utils.checkpoint import export_torch_checkpoint

    d, R = 8, 5
    cfg = UltraConfig(
        entity=entity_nbfnet_config(input_dim=d, hidden_dims=(d, d),
                                    num_relations=R * 2),
        relation=rel_nbfnet_config(input_dim=d, hidden=d, num_layers=2),
        num_rel_models=3,
    )
    params = ultra_init(jax.random.PRNGKey(4), cfg)
    path = str(tmp_path / "multi.pth")
    export_torch_checkpoint(path, params)
    back = import_torch_checkpoint(path, params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
