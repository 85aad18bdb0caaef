"""Fail-soft policy demotion (VERDICT r4 #5): a device OOM on the first
execution of a resolved auto policy demotes one tier (halved HBM budget ->
full-save -> save_rspmm -> full remat -> halved micro_batch) and the run
completes instead of crashing. The HBM calibration constants are fractions of
the QUERIED device budget (tasks/task.py::_hbm_bytes), so the ladder is
chip-size-aware; demotion just shrinks that budget."""

import dataclasses

import jax
import numpy as np
import pytest

import ultra_torchdrug_tpu.tasks.task as task_mod
from ultra_torchdrug_tpu.data.datasets import synthetic_transductive
from ultra_torchdrug_tpu.engine.engine import Engine, _is_oom_error
from ultra_torchdrug_tpu.models.nbfnet import entity_nbfnet_config, rel_nbfnet_config
from ultra_torchdrug_tpu.models.ultra import UltraConfig
from ultra_torchdrug_tpu.tasks.task import TaskConfig, TransductiveKGTask


def auto_cfg(num_relations, input_dim=8, hidden_dims=(8, 8)):
    return UltraConfig(
        entity=entity_nbfnet_config(
            input_dim=input_dim, hidden_dims=hidden_dims,
            num_relations=num_relations * 2, remat="auto", stack="auto",
        ),
        relation=rel_nbfnet_config(input_dim=8, hidden=8, num_layers=2),
    )


FAKE_OOM = RuntimeError(
    "RESOURCE_EXHAUSTED: Out of memory allocating 17179869184 bytes."
)


def test_is_oom_error_matcher():
    assert _is_oom_error(FAKE_OOM)
    assert _is_oom_error(RuntimeError("Allocator ran out of memory"))
    assert not _is_oom_error(RuntimeError("INVALID_ARGUMENT: shape mismatch"))


def test_demotion_walks_the_policy_ladder(monkeypatch):
    """With a faked HBM size chosen so tier 0 resolves full-save, each
    demotion level must re-resolve one tier down the measured ladder."""
    ds = synthetic_transductive(num_nodes=300, num_edges=1500, num_relations=6)
    cfg = auto_cfg(ds.num_relations, input_dim=64,
                   hidden_dims=(64,) * 6)
    task = TransductiveKGTask(ds, cfg, TaskConfig(num_negative=8))
    # unit = V*B*D*4 = 300*16*64*4 = 1.17 MB at B=16.
    # full-save peak 6.2*6*unit = 43.7 MB; save_rspmm (2L+4)=16 units = 18.8 MB
    monkeypatch.setattr(task_mod, "_hbm_bytes", lambda: 80 << 20)

    def ent_remat(t):
        return t._resolve_model_cfg(t.fact_graph, batch=16).entity.remat

    assert ent_remat(task) is False  # 43.7 <= 0.7*80 MB: full-save
    assert task.demote_policy("test")
    assert ent_remat(task) == "save_rspmm"  # 43.7 > 28 MB, 18.8 <= 28 MB
    assert task.demote_policy("test")
    assert ent_remat(task) is True  # 18.8 > 14 MB: full remat
    # deeper levels shrink the auto micro batch via the same halved budget
    lvl2 = task_mod.auto_micro_batch(
        task._resolve_model_cfg(task.fact_graph, batch=16),
        task.fact_graph.num_nodes, 16, budget_bytes=task._budget_bytes(),
    ).entity.micro_batch
    for _ in range(2):
        assert task.demote_policy("test")
    lvl4 = task_mod.auto_micro_batch(
        task._resolve_model_cfg(task.fact_graph, batch=16),
        task.fact_graph.num_nodes, 16, budget_bytes=task._budget_bytes(),
    ).entity.micro_batch
    assert (lvl4 or 16) <= (lvl2 or 16)
    # ladder is finite: after max levels demote_policy refuses
    while task.demote_policy("test"):
        pass
    assert task._policy_demotion == task._MAX_POLICY_DEMOTION
    assert not task.demote_policy("test")


def test_engine_survives_injected_oom(tmp_path, monkeypatch):
    """End-to-end: the first step execution raises a fake RESOURCE_EXHAUSTED;
    the engine restores the donated params snapshot, demotes the task one
    tier, recompiles, and the epoch completes with finite metrics."""
    ds = synthetic_transductive(num_nodes=40, num_edges=300, num_relations=5)
    task = TransductiveKGTask(ds, auto_cfg(ds.num_relations),
                              TaskConfig(num_negative=8))
    eng = Engine(task, batch_size=16, lr=5e-3, work_dir=str(tmp_path),
                 log_interval=1000)

    orig = Engine._get_step_fn
    state = {"oomed": False}

    def patched(self, gid):
        fn = orig(self, gid)
        if state["oomed"]:
            return fn

        def raiser(*a, **k):
            state["oomed"] = True
            raise FAKE_OOM

        return raiser

    monkeypatch.setattr(Engine, "_get_step_fn", patched)
    p0 = jax.tree_util.tree_map(np.asarray, eng.params)
    eng.train(num_epoch=1, batch_per_epoch=4)
    assert state["oomed"]
    assert task._policy_demotion == 1
    # params actually trained past the restored snapshot
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(eng.params))
    )
    assert moved
    m = eng.evaluate("valid")
    assert 0 < m["mrr"] <= 1


def test_engine_reraises_non_oom(tmp_path, monkeypatch):
    ds = synthetic_transductive(num_nodes=40, num_edges=300, num_relations=5)
    task = TransductiveKGTask(ds, auto_cfg(ds.num_relations),
                              TaskConfig(num_negative=8))
    eng = Engine(task, batch_size=16, work_dir=str(tmp_path))

    def raiser(self, gid):
        def fn(*a, **k):
            raise RuntimeError("INVALID_ARGUMENT: not an OOM")
        return fn

    monkeypatch.setattr(Engine, "_get_step_fn", raiser)
    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        eng.train(num_epoch=1, batch_per_epoch=2)
    assert task._policy_demotion == 0


def test_eval_oom_demotes_and_retries(tmp_path, monkeypatch):
    ds = synthetic_transductive(num_nodes=40, num_edges=300, num_relations=5)
    task = TransductiveKGTask(ds, auto_cfg(ds.num_relations),
                              TaskConfig(num_negative=8))
    eng = Engine(task, batch_size=16, work_dir=str(tmp_path))

    orig_eval = type(task).evaluate
    state = {"calls": 0}

    def patched(self, *a, **k):
        state["calls"] += 1
        if state["calls"] == 1:
            raise FAKE_OOM
        return orig_eval(self, *a, **k)

    monkeypatch.setattr(type(task), "evaluate", patched)
    m = eng.evaluate("valid")
    assert state["calls"] == 2
    assert task._policy_demotion == 1
    assert 0 < m["mrr"] <= 1
