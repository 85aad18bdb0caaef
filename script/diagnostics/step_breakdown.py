"""Per-component timing breakdown of the train step.

TPU diagnostic harness (run directly on the TPU host; compiles are cached
in .jax_cache). See STATUS.md for the numbers these produced in round 1.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import time, dataclasses
import numpy as np, jax, jax.numpy as jnp

from ultra_torchdrug_tpu.data.datasets import synthetic_transductive
from ultra_torchdrug_tpu.tasks.task import TransductiveKGTask, TaskConfig
from ultra_torchdrug_tpu.models.ultra import (
    UltraConfig, ultra_train_scores, _mask_easy_edges, _rel_queries,
)
from ultra_torchdrug_tpu.ops.sampling import strict_negatives
from ultra_torchdrug_tpu.models.nbfnet import entity_nbfnet_score_all

ds = synthetic_transductive("fb", 14541, 272115, 237, seed=0)
cfg = UltraConfig.default(ds.num_relations, rspmm_impl="pallas")
cfg = dataclasses.replace(
    cfg,
    entity=dataclasses.replace(cfg.entity, remat=True),
    relation=dataclasses.replace(cfg.relation, remat=True),
)
task = TransductiveKGTask(ds, cfg, TaskConfig(num_negative=128))
fact, relg = task.fact_graph, task.rel_graph
fact_und, relg_p = task._prepare_graphs(fact, relg)
params = task.init_params(jax.random.PRNGKey(0))

B = 64
batch = jnp.asarray(task.train_triples[:B])
h, t, r = batch[:, 0], batch[:, 1], batch[:, 2]
key = jax.random.PRNGKey(1)

def timeit(name, fn, *args, n=4):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / n)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return best

timeit("strict_negatives", lambda k: strict_negatives(
    k, fact.edge_list, h, t, r, fact.num_nodes, 128), key)

neg = strict_negatives(key, fact.edge_list, h, t, r, fact.num_nodes, 128)
hi = jnp.broadcast_to(h[:, None], (B, 129))
ti = jnp.broadcast_to(t[:, None], (B, 129))
ri = jnp.broadcast_to(r[:, None], (B, 129))
timeit("easy_edge_mask", lambda: _mask_easy_edges(cfg, fact, hi, ti, ri).edge_weight)

timeit("rel_tower_fwd", lambda p: _rel_queries(p, cfg, relg_p, r), params)

rq = _rel_queries(params, cfg, relg_p, r)
timeit("entity_tower_fwd(all-V scores)", lambda p: entity_nbfnet_score_all(
    p["entity"], cfg.entity, fact_und, rq, h, r), params)

def full_loss(p, k):
    from ultra_torchdrug_tpu.tasks.kg import bce_self_adversarial
    n = strict_negatives(k, fact.edge_list, h, t, r, fact.num_nodes, 128)
    s = ultra_train_scores(p, cfg, fact, relg_p, h, t, r, n, fact_graph_und=fact_und)
    return bce_self_adversarial(s, 1.0)

timeit("full fwd loss", full_loss, params, key, n=2)
timeit("full fwd+bwd", lambda p, k: jax.grad(full_loss)(p, k), params, key, n=2)
