"""Zero-shot rehearsal: a reference-layout .pth checkpoint at the FULL
flagship architecture (6x64 entity + relation towers) imported and evaluated
through the CLI path on an inductive dataset — the exact flow the td_ultra_4g
parity gate uses, minus the real weights/dataset (absent in this offline
environment)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def make_flagship_pth(path):
    g = torch.Generator().manual_seed(7)
    sd = {}

    def lin(key, out_d, in_d):
        sd[f"{key}.weight"] = torch.randn(out_d, in_d, generator=g) * 0.1
        sd[f"{key}.bias"] = torch.randn(out_d, generator=g) * 0.1

    d = 64
    for i in range(6):
        lin(f"model.layers.{i}.linear", d, 2 * d)
        sd[f"model.layers.{i}.layer_norm.weight"] = torch.ones(d)
        sd[f"model.layers.{i}.layer_norm.bias"] = torch.zeros(d)
        lin(f"model.layers.{i}.relation_projection.layers.0", d, d)
        lin(f"model.layers.{i}.relation_projection.layers.1", d, d)
    lin("model.mlp.layers.0", 2 * d, 2 * d)
    lin("model.mlp.layers.1", 1, 2 * d)
    sd["model.dist_embed.weight"] = torch.randn(10, d, generator=g)
    for i in range(6):
        lin(f"rel_models.0.model.layers.{i}.linear", d, 2 * d)
        sd[f"rel_models.0.model.layers.{i}.layer_norm.weight"] = torch.ones(d)
        sd[f"rel_models.0.model.layers.{i}.layer_norm.bias"] = torch.zeros(d)
        sd[f"rel_models.0.model.layers.{i}.relation.weight"] = (
            torch.randn(4, d, generator=g) * 0.1
        )
    lin("rel_models.0.model.mlp.layers.0", 2 * d, 2 * d)
    lin("rel_models.0.model.mlp.layers.1", d, 2 * d)
    torch.save({"model": sd, "optimizer": {}}, path)


def test_zero_shot_inference_via_cli(tmp_path):
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "script"))
    import run_full

    ckpt = str(tmp_path / "fake_ultra_4g.pth")
    make_flagship_pth(ckpt)

    cfg = tmp_path / "inference.yaml"
    cfg.write_text(f"""
output_dir: {tmp_path}
dataset:
  class: SynthInductiveKG
task:
  class: InductiveKnowledgeGraphCompletionAdapted
  model:
    class: TransferNBFNet
    input_dim: 64
    hidden_dims: [64, 64, 64, 64, 64, 64]
    message_func: distmult
    aggregate_func: sum
    short_cut: yes
    layer_norm: yes
    project: yes
    mod: yes
  rel_models:
    class: RelationModelList
    num_rel_models: 1
    rel_model:
      class_str: RelNBFNet
      input_dim: 64
      input_type: ones
      num_layers: 6
      hidden: 64
  criterion: bce
  num_negative: 16
  strict_negative: yes
  adversarial_temperature: 1.0
  full_batch_eval: yes
optimizer:
  class: AdamW
  lr: 0.0005
engine:
  batch_size: 8
train:
  num_epoch: 0
metric: mrr
checkpoint: {ckpt}
fast_test: 16
""")
    engine = run_full.main(["-c", str(cfg)])
    m = engine.evaluate("test", fast_test=16)
    assert 0 < m["mrr"] <= 1
    assert np.isfinite(m["mr"])
