"""Flagship 3-graph pretraining workflow smoke.

TPU diagnostic harness (run directly on the TPU host; compiles are cached
in .jax_cache). See STATUS.md for the numbers these produced in round 1.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import time, dataclasses
import jax

from ultra_torchdrug_tpu.data.datasets import JointDataset, synthetic_transductive
from ultra_torchdrug_tpu.tasks.task import MultiGraphPretrainTask, TaskConfig
from ultra_torchdrug_tpu.models.ultra import UltraConfig
from ultra_torchdrug_tpu.engine.engine import Engine

print("backend:", jax.default_backend(), flush=True)

graphs = [
    synthetic_transductive("fb", 14541, 272115, 237, seed=0),
    synthetic_transductive("wn", 40943, 86835, 11, seed=1),
    synthetic_transductive("codex", 17050, 185584, 51, seed=2),
]
ds = JointDataset("3g", graphs)
t0 = time.time()
cfg = UltraConfig.default(max(g.num_relations for g in graphs), rspmm_impl="pallas")
# shipped default: remat/stack resolve per graph ("auto" -> full-save +
# unrolled where the backward peak fits HBM, measured fastest in round 4)
cfg = dataclasses.replace(
    cfg,
    entity=dataclasses.replace(cfg.entity, remat="auto"),
    relation=dataclasses.replace(cfg.relation, remat="auto"),
)
task = MultiGraphPretrainTask(ds, cfg, TaskConfig(num_negative=128))
print(f"task setup: {time.time()-t0:.1f}s", flush=True)
for i, g in enumerate(task.fact_graphs):
    print(f"  graph {i}: V={g.num_nodes} E={g.num_edges} "
          f"rel_graph E={task.rel_graphs[i].num_edges}", flush=True)

eng = Engine(task, batch_size=64, lr=5e-4, log_interval=5, work_dir="/tmp")
t0 = time.time()
eng.train(num_epoch=1, batch_per_epoch=6)  # compiles up to 3 graph variants
print(f"first 6 steps (incl compiles): {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
eng.train(num_epoch=1, batch_per_epoch=12)
print(f"12 steps: {(time.time()-t0)/12*1e3:.0f} ms/step", flush=True)
t0 = time.time()
m = eng.evaluate("valid", fast_test=32)
print(f"cross-graph eval (32/graph): {time.time()-t0:.1f}s", flush=True)
print({k: round(v, 4) for k, v in m.items() if not isinstance(v, dict)}, flush=True)
print("per-graph:", {k: round(v["mrr"], 4) for k, v in m["per_graph"].items()}, flush=True)
