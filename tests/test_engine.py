"""End-to-end engine tests on synthetic KGs: training reduces loss, eval
produces sane metrics, checkpoints round-trip."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from ultra_torchdrug_tpu.data.datasets import (
    JointDataset, synthetic_inductive, synthetic_transductive,
)
from ultra_torchdrug_tpu.engine.engine import Engine
from ultra_torchdrug_tpu.models.nbfnet import entity_nbfnet_config, rel_nbfnet_config
from ultra_torchdrug_tpu.models.ultra import UltraConfig
from ultra_torchdrug_tpu.tasks.task import (
    InductiveKGTask, MultiGraphPretrainTask, TaskConfig, TransductiveKGTask,
)


def tiny_model_cfg(num_relations):
    return UltraConfig(
        entity=entity_nbfnet_config(
            input_dim=8, hidden_dims=(8, 8), num_relations=num_relations * 2
        ),
        relation=rel_nbfnet_config(input_dim=8, hidden=8, num_layers=2),
    )


def tiny_task_cfg(**kw):
    return TaskConfig(num_negative=8, **kw)


def test_transductive_train_and_eval(tmp_path):
    ds = synthetic_transductive(num_nodes=40, num_edges=300, num_relations=5)
    task = TransductiveKGTask(ds, tiny_model_cfg(ds.num_relations), tiny_task_cfg())
    eng = Engine(task, batch_size=16, lr=5e-3, work_dir=str(tmp_path), log_interval=1000)

    for _ in range(2):
        eng.train(num_epoch=1, batch_per_epoch=8)
    m = eng.evaluate("valid")
    assert 0 < m["mrr"] <= 1
    assert m["mr"] >= 1
    assert set(m) >= {"mr", "mrr", "hits@1", "hits@10", "mrr-tail"}

    # checkpoint round trip
    path = os.path.join(str(tmp_path), "ckpt.pkl")
    eng.save(path)
    p_before = jax.tree_util.tree_leaves(eng.params)
    eng2 = Engine(task, batch_size=16, work_dir=str(tmp_path))
    eng2.load(path)
    p_after = jax.tree_util.tree_leaves(eng2.params)
    for a, b in zip(p_before, p_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    m2 = eng2.evaluate("valid")
    assert abs(m2["mrr"] - m["mrr"]) < 1e-6


def test_training_improves_loss(tmp_path):
    ds = synthetic_transductive(num_nodes=30, num_edges=250, num_relations=4)
    task = TransductiveKGTask(ds, tiny_model_cfg(ds.num_relations), tiny_task_cfg())
    eng = Engine(task, batch_size=16, lr=1e-2, work_dir=str(tmp_path), log_interval=1000)

    def avg_loss():
        key = jax.random.PRNGKey(99)
        tot = 0.0
        for i in range(4):
            batch = task.train_triples[i * 16 : (i + 1) * 16]
            loss, _ = task.loss_step(eng.params, key, batch)
            tot += float(loss)
        return tot / 4

    before = avg_loss()
    eng.train(num_epoch=3, batch_per_epoch=10)
    after = avg_loss()
    assert after < before


def test_inductive_task(tmp_path):
    ds = synthetic_inductive()
    cfg = dataclasses.replace(
        tiny_task_cfg(), metrics=("mr", "mrr", "hits@1", "hits@10", "hits@10_50")
    )
    task = InductiveKGTask(ds, tiny_model_cfg(ds.num_relations), cfg)
    eng = Engine(task, batch_size=16, work_dir=str(tmp_path), log_interval=1000)
    eng.train(num_epoch=1, batch_per_epoch=5)
    m = eng.evaluate("test")
    assert 0 < m["mrr"] <= 1 and 0 <= m["hits@10_50"] <= 1
    m_valid = eng.evaluate("valid")
    assert 0 < m_valid["mrr"] <= 1


def test_multigraph_pretraining(tmp_path):
    graphs = [
        synthetic_transductive("g0", 30, 220, 4, seed=0),
        synthetic_transductive("g1", 25, 180, 4, seed=1),
    ]
    ds = JointDataset("joint", graphs)
    cfg = dataclasses.replace(
        tiny_task_cfg(), metrics=("mr", "mrr", "hits@1", "hits@10")
    )
    task = MultiGraphPretrainTask(ds, tiny_model_cfg(4), cfg)
    eng = Engine(task, batch_size=16, work_dir=str(tmp_path), log_interval=1000)
    eng.train(num_epoch=1, batch_per_epoch=6)
    m = eng.evaluate("valid")
    assert 0 < m["mrr"] <= 1
    assert set(m["per_graph"]) == {"g0", "g1"}


def test_steps_per_call_matches_per_step_loop(tmp_path):
    """steps_per_call=K chains K optimizer steps in one jit (lax.scan). With
    bpe % K == 0 the batch schedule and RNG keys are identical to the K=1
    loop, so the trained params must match."""
    ds = synthetic_transductive(num_nodes=30, num_edges=220, num_relations=4)

    def run(K):
        task = TransductiveKGTask(
            ds, tiny_model_cfg(ds.num_relations), tiny_task_cfg()
        )
        eng = Engine(task, batch_size=16, lr=5e-3, work_dir=str(tmp_path),
                     log_interval=1000, seed=7, steps_per_call=K)
        eng.train(num_epoch=1, batch_per_epoch=8)
        assert eng.meter.global_step == 8
        return eng.params

    p1 = run(1)
    p4 = run(4)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-6)


def test_steps_per_call_multigraph_and_weights(tmp_path):
    # multigraph: one mixture draw per chunk; just exercises the chunked path
    graphs = [
        synthetic_transductive("g0", 30, 220, 4, seed=0),
        synthetic_transductive("g1", 25, 180, 4, seed=1),
    ]
    task = MultiGraphPretrainTask(
        JointDataset("joint", graphs), tiny_model_cfg(4), tiny_task_cfg()
    )
    eng = Engine(task, batch_size=16, work_dir=str(tmp_path),
                 log_interval=1000, steps_per_call=3)
    eng.train(num_epoch=1, batch_per_epoch=5)  # rounds up to 6 (whole chunks)
    assert eng.meter.global_step == 6

    # sample_weight rides the scan as stacked [K, B]
    ds = synthetic_transductive(num_nodes=30, num_edges=200, num_relations=4)
    task = TransductiveKGTask(
        ds, tiny_model_cfg(ds.num_relations), tiny_task_cfg(sample_weight=True)
    )
    eng = Engine(task, batch_size=16, work_dir=str(tmp_path),
                 log_interval=1000, steps_per_call=2)
    eng.train(num_epoch=1, batch_per_epoch=4)
    assert eng.meter.global_step == 4


def test_multigraph_mixture_distribution_matches_edge_weights(tmp_path):
    """The per-STEP graph-id marginal must follow the edge-count mixture
    weights (reference engine.py:23-28) for steps_per_call 1 AND 4 — K>1
    draws the graph once per K-step chunk, which keeps the marginal unbiased
    (each chunk's K steps all count toward the drawn graph)."""
    graphs = [
        synthetic_transductive("g0", 30, 300, 4, seed=0),
        synthetic_transductive("g1", 25, 100, 4, seed=1),
    ]
    task = MultiGraphPretrainTask(
        JointDataset("joint", graphs), tiny_model_cfg(4), tiny_task_cfg()
    )
    expect = task._graph_probs  # 0.75 / 0.25
    for K, bpe, tol in ((1, 2000, 0.05), (4, 2000, 0.09)):
        eng = Engine(task, batch_size=16, work_dir=str(tmp_path),
                     log_interval=10**9, steps_per_call=K, seed=123 + K)
        counts = np.zeros(task.num_graphs)
        for gid, k, _batch, _sw in eng._epoch_chunks(bpe):
            counts[gid] += k
        freq = counts / counts.sum()
        # tol ≈ 4σ of the binomial at bpe (K=1) / bpe/K (K=4) draws
        np.testing.assert_allclose(freq, expect, atol=tol)


def test_engine_logger_wandb_wiring(tmp_path, monkeypatch):
    """`engine.logger: wandb` (reference pretrain_3g.yaml:47; torchdrug
    core.Engine logger kwarg) constructs a WandbLogger fed window means and
    eval dicts through the meter — verified against a stubbed wandb module."""
    import sys
    import types

    logged = []
    inits = []

    class _Run:
        def log(self, metrics, step=None):
            logged.append((dict(metrics), step))

        def finish(self):
            pass

    stub = types.ModuleType("wandb")

    def _init(project=None, config=None):
        inits.append((project, config))
        return _Run()

    stub.init = _init
    monkeypatch.setitem(sys.modules, "wandb", stub)

    from ultra_torchdrug_tpu.engine.build import build_engine

    ds = synthetic_transductive(num_nodes=30, num_edges=200, num_relations=4)
    task = TransductiveKGTask(ds, tiny_model_cfg(ds.num_relations), tiny_task_cfg())
    cfg = {
        "engine": {"logger": "wandb", "batch_size": 16, "log_interval": 2},
        "optimizer": {"class": "AdamW", "lr": 5e-3},
        "task": {"class": "KnowledgeGraphCompletion"},
    }
    eng = build_engine(cfg, task, work_dir=str(tmp_path))
    assert eng.metric_logger is not None
    assert inits and inits[0][0] == "ultra_tpu"
    assert inits[0][1]["engine"]["logger"] == "wandb"  # scrubbed config passed
    eng.train(num_epoch=1, batch_per_epoch=4)
    window = [m for m, _ in logged if "loss" in m]
    assert window and all("it_per_s" in m for m, _ in logged if "loss" in m)
    eng.evaluate("valid")
    evals = [m for m, _ in logged if any(k.endswith("mrr") for k in m)]
    assert evals  # eval dicts reach the sink with the split/epoch prefix


def test_sample_weight_path(tmp_path):
    ds = synthetic_transductive(num_nodes=30, num_edges=200, num_relations=4)
    task = TransductiveKGTask(
        ds, tiny_model_cfg(ds.num_relations), tiny_task_cfg(sample_weight=True)
    )
    eng = Engine(task, batch_size=16, work_dir=str(tmp_path), log_interval=1000)
    eng.train(num_epoch=1, batch_per_epoch=3)  # just runs


def test_auto_eval_batch_policy_and_invariance(tmp_path):
    """Auto eval batch sizing: raises small batches to the cap on small
    graphs, shrinks below the request at huge V (HBM model), is pinned by
    cfg.eval_batch_size — and metrics are invariant to the batch size (the
    eval loop pads-to-batch; scoring is per-triple)."""
    ds = synthetic_transductive(num_nodes=40, num_edges=300, num_relations=5)
    task = TransductiveKGTask(ds, tiny_model_cfg(ds.num_relations), tiny_task_cfg())
    # small graph: raised to the power-of-two cap
    assert task._resolve_eval_batch(16, num_nodes=40) == 128
    # huge graph: shrunk to what the 16 GB fallback budget fits
    b_huge = task._resolve_eval_batch(64, num_nodes=3_000_000)
    assert b_huge < 64 and b_huge & (b_huge - 1) == 0
    # explicit pin wins
    task_pin = TransductiveKGTask(
        ds, tiny_model_cfg(ds.num_relations), tiny_task_cfg(eval_batch_size=7)
    )
    assert task_pin._resolve_eval_batch(16, num_nodes=40) == 7

    eng = Engine(task, batch_size=16, work_dir=str(tmp_path), log_interval=1000)
    m_auto = eng.evaluate("valid")
    eng_pin = Engine(task_pin, batch_size=16, work_dir=str(tmp_path),
                     log_interval=1000)
    eng_pin.params = eng.params
    m_pin = eng_pin.evaluate("valid")
    assert abs(m_auto["mrr"] - m_pin["mrr"]) < 1e-6


def test_toy_eval_protocol(tmp_path):
    ds = synthetic_inductive(num_relations=5, seed=3)
    cfg = dataclasses.replace(
        tiny_task_cfg(),
        metrics=("mrr", "hits@10_50"),
        toy_eval=True,
    )
    task = InductiveKGTask(ds, tiny_model_cfg(ds.num_relations), cfg)
    eng = Engine(task, batch_size=16, work_dir=str(tmp_path), log_interval=1000)
    m = eng.evaluate("test")
    # 50-negative protocol: ranks bounded by 51
    assert 0 < m["mrr"] <= 1
    assert 0 <= m["hits@10_50"] <= 1


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_learning_on_compositional_structure(tmp_path, impl):
    """Eval MRR must rise well above random after brief training on a KG whose
    held-out triples follow compositional offset rules (uniform-random KGs are
    unlearnable, so this is the real learning-loop check). Runs BOTH rspmm
    impls (pallas = interpret-mode kernels on CPU): training-timescale
    numerics drift in the fused kernels/VJPs would pass unit parity but fail
    to converge here."""
    import dataclasses as _dc

    from ultra_torchdrug_tpu.data.datasets import synthetic_compositional

    ds = synthetic_compositional(num_nodes=100, offsets=(1, 2, 3), per_relation=150)
    cfg = tiny_model_cfg(ds.num_relations)
    cfg = _dc.replace(
        cfg,
        entity=_dc.replace(cfg.entity, rspmm_impl=impl),
        relation=_dc.replace(cfg.relation, rspmm_impl=impl),
    )
    task = TransductiveKGTask(ds, cfg, TaskConfig(num_negative=16))
    eng = Engine(task, batch_size=32, lr=5e-3, work_dir=str(tmp_path),
                 log_interval=10**9)
    m0 = eng.evaluate("valid")
    eng.train(num_epoch=1, batch_per_epoch=60)
    m1 = eng.evaluate("valid")
    assert m1["mrr"] > max(3 * m0["mrr"], 0.08), (m0["mrr"], m1["mrr"])
