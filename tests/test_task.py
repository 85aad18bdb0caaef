"""Loss / ranking / metric protocol tests vs brute-force numpy."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ultra_torchdrug_tpu.tasks.kg import (
    bce_self_adversarial,
    cross_entropy_positive,
    evaluate_ranking,
    filtered_ranking,
    margin_ranking,
)


def np_bce_adv(scores, T):
    def sigmoid(x):
        return 1 / (1 + np.exp(-x))

    B, K = scores.shape
    target = np.zeros_like(scores)
    target[:, 0] = 1
    p = sigmoid(scores)
    loss = -(target * np.log(p + 1e-12) + (1 - target) * np.log(1 - p + 1e-12))
    w = np.ones_like(scores)
    if T > 0:
        e = np.exp(scores[:, 1:] / T - scores[:, 1:].max(1, keepdims=True) / T)
        w[:, 1:] = e / e.sum(1, keepdims=True)
    else:
        w[:, 1:] = 1 / (K - 1)
    return ((loss * w).sum(1) / w.sum(1)).mean()


def test_bce_self_adversarial(rng):
    scores = rng.normal(size=(6, 9)).astype(np.float32) * 3
    for T in (1.0, 0.5, 0.0):
        got = float(bce_self_adversarial(jnp.asarray(scores), T))
        want = np_bce_adv(scores, T)
        assert abs(got - want) < 1e-4


def test_margin_and_ce_run(rng):
    scores = jnp.asarray(rng.normal(size=(6, 9)).astype(np.float32))
    assert np.isfinite(float(margin_ranking(scores)))
    assert np.isfinite(float(cross_entropy_positive(scores)))


def test_filtered_ranking_bruteforce(rng):
    B, V = 7, 30
    scores = rng.normal(size=(B, V)).astype(np.float32)
    scores[2, 5] = scores[2, 6]  # engineered tie
    target = rng.integers(0, V, B).astype(np.int32)
    truth = rng.uniform(size=(B, V)) > 0.8
    got = np.asarray(
        filtered_ranking(jnp.asarray(scores), jnp.asarray(target), jnp.asarray(truth))
    )
    for b in range(B):
        pos = scores[b, target[b]]
        want = 1 + sum(
            1 for v in range(V) if scores[b, v] >= pos and not truth[b, v]
        )
        assert got[b] == want


def test_unfiltered_ranking(rng):
    B, V = 4, 20
    scores = rng.normal(size=(B, V)).astype(np.float32)
    target = rng.integers(0, V, B).astype(np.int32)
    truth = np.zeros((B, V), bool)
    got = np.asarray(
        filtered_ranking(
            jnp.asarray(scores), jnp.asarray(target), jnp.asarray(truth), filtered=False
        )
    )
    for b in range(B):
        want = 1 + (scores[b] >= scores[b, target[b]]).sum()
        assert got[b] == want


def test_evaluate_ranking_metrics(rng):
    ranking = jnp.asarray(np.array([[1, 3], [2, 10], [5, 1]], np.int32))
    m = evaluate_ranking(ranking, ["mr", "mrr", "hits@1", "hits@3", "mrr-tail", "mrr-head"])
    flat = np.array([1, 3, 2, 10, 5, 1], float)
    assert abs(float(m["mr"]) - flat.mean()) < 1e-6
    assert abs(float(m["mrr"]) - (1 / flat).mean()) < 1e-6
    assert abs(float(m["hits@1"]) - (flat <= 1).mean()) < 1e-6
    assert abs(float(m["hits@3"]) - (flat <= 3).mean()) < 1e-6
    assert abs(float(m["mrr-tail"]) - (1 / flat[[0, 2, 4]]).mean()) < 1e-6
    assert abs(float(m["mrr-head"]) - (1 / flat[[1, 3, 5]]).mean()) < 1e-6


def test_hits_at_k_sampled_estimator():
    # rank 1 out of many candidates -> fp_rate 0 -> estimator = 1
    ranking = jnp.asarray(np.array([1, 51], np.int32))
    ncand = jnp.asarray(np.array([100, 100], np.float32))
    m = evaluate_ranking(ranking, ["hits@10_50"], num_candidates=ncand)
    # manual: fp_rate = 0 and 0.5
    def manual(fp):
        s = 0.0
        for i in range(10):
            s += math.comb(50, i) * fp**i * (1 - fp) ** (50 - i)
        return s

    want = (manual(0.0) + manual(0.5)) / 2
    assert abs(float(m["hits@10_50"]) - want) < 1e-5


def test_per_relation_breakdown():
    ranking = jnp.asarray(np.array([1, 2, 4], np.int32))
    rels = jnp.asarray(np.array([0, 0, 1], np.int32))
    m = evaluate_ranking(ranking, ["mrr"], rel_index=rels, num_relations=2)
    assert abs(float(m["mrr_rel_0"]) - (1 + 0.5) / 2) < 1e-6
    assert abs(float(m["mrr_rel_1"]) - 0.25) < 1e-6


def test_remat_auto_policy_tiers(monkeypatch):
    """remat='auto' resolves by peak models (calibrated on real-TPU OOM
    boundaries): FB-scale -> full-save + unroll (fastest), WN-scale ->
    save_rspmm + scan (full-save and any-unroll exceed HBM), ATOMIC-scale ->
    full remat + scan; the relation tower sizes off the RELATION graph (2R
    nodes) and always full-saves."""
    import dataclasses
    import types
    from ultra_torchdrug_tpu.tasks import task as task_mod
    from ultra_torchdrug_tpu.models.ultra import UltraConfig

    monkeypatch.setattr(task_mod, "_hbm_bytes", lambda: 16 << 30)
    monkeypatch.setattr(task_mod.jax, "default_backend", lambda: "tpu")

    t = object.__new__(task_mod.TransductiveKGTask)
    cfg = UltraConfig.default(237)
    t.model_cfg = dataclasses.replace(
        cfg,
        entity=dataclasses.replace(cfg.entity, remat="auto", stack="auto"),
        relation=dataclasses.replace(cfg.relation, remat="auto", stack="auto"),
    )

    def fake_graph(v):
        return types.SimpleNamespace(num_nodes=v)

    fb = t._resolve_model_cfg(fake_graph(14541), 64)
    assert fb.entity.remat is False and fb.entity.stack == "unroll"
    wn = t._resolve_model_cfg(fake_graph(40943), 64)
    assert wn.entity.remat == "save_rspmm" and wn.entity.stack == "scan"
    atomic = t._resolve_model_cfg(fake_graph(304388), 64)
    assert atomic.entity.remat is True and atomic.entity.stack == "scan"
    for resolved in (fb, wn, atomic):
        assert resolved.relation.remat is False  # 2R-node relation graph
        assert resolved.relation.stack == "unroll"
