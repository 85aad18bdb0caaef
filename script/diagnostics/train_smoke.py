"""Full-integration training smoke at FB15k237 scale.

TPU diagnostic harness (run directly on the TPU host; compiles are cached
in .jax_cache). See STATUS.md for the numbers these produced in round 1.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import time
import numpy as np
import jax

from ultra_torchdrug_tpu.data.datasets import synthetic_transductive
from ultra_torchdrug_tpu.tasks.task import TransductiveKGTask, TaskConfig
from ultra_torchdrug_tpu.models.ultra import UltraConfig
from ultra_torchdrug_tpu.engine.engine import Engine

print("backend:", jax.default_backend(), flush=True)

ds = synthetic_transductive("synthFB", num_nodes=15000, num_edges=300000,
                            num_relations=237, seed=0)
t0 = time.time()
import dataclasses
cfg = UltraConfig.default(ds.num_relations, rspmm_impl="pallas")
cfg = dataclasses.replace(
    cfg,
    entity=dataclasses.replace(cfg.entity, remat=True),
    relation=dataclasses.replace(cfg.relation, remat=True),
)
task = TransductiveKGTask(ds, cfg, TaskConfig(num_negative=128))
print(f"task setup (rel graph + layouts): {time.time()-t0:.1f}s", flush=True)
print(f"graph: V={ds.num_entities} E={len(ds.train)} R={ds.num_relations} "
      f"rel_graph E={task.rel_graph.num_edges}", flush=True)

eng = Engine(task, batch_size=64, lr=5e-4, log_interval=5, work_dir="/tmp")
t0 = time.time()
eng.train(num_epoch=1, batch_per_epoch=2)
print(f"first 2 steps (incl compile): {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
eng.train(num_epoch=1, batch_per_epoch=10)
dt = (time.time() - t0) / 10
print(f"train step: {dt*1e3:.0f} ms -> {eng._edges_per_step()/dt/1e6:.1f}M edge-visits/s", flush=True)

t0 = time.time()
m = eng.evaluate("valid", fast_test=64)
print(f"eval 64 triples: {time.time()-t0:.1f}s metrics={ {k: round(v,4) for k,v in m.items()} }", flush=True)
