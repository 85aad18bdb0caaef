"""Learning check on compositional-structure data.

TPU diagnostic harness (run directly on the TPU host; compiles are cached
in .jax_cache). See STATUS.md for the numbers these produced in round 1.
"""
import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import time, dataclasses
import numpy as np
import jax

ap = argparse.ArgumentParser()
ap.add_argument("--compute-dtype", default="float32",
                help="bfloat16 = kernel-streamed bf16 with f32 accumulation "
                     "(the opt-in production mode; fp32 is reference parity)")
args = ap.parse_args()

from ultra_torchdrug_tpu.data.datasets import TransductiveDataset
from ultra_torchdrug_tpu.data.graph import Graph
from ultra_torchdrug_tpu.tasks.task import TransductiveKGTask, TaskConfig
from ultra_torchdrug_tpu.models.ultra import UltraConfig
from ultra_torchdrug_tpu.engine.engine import Engine

print("backend:", jax.default_backend(), flush=True)

V = 1000
offsets = [1, 2, 3, 5, 8, 13, 21, 34]
rng = np.random.default_rng(0)
tri = []
for r, o in enumerate(offsets):
    heads = rng.choice(V, 2200, replace=False) if V >= 2200 else rng.integers(0, V, 2200)
    heads = rng.integers(0, V, 2200)
    for h in heads:
        tri.append((h, (h + o) % V, r))
tri = np.unique(np.asarray(tri, np.int32), axis=0)
rng.shuffle(tri)
n = len(tri)
valid, test, train = tri[: n // 10], tri[n // 10 : n // 5], tri[n // 5 :]
graph = Graph.from_triplets(tri, V, len(offsets))
ds = TransductiveDataset("offsets", graph, train, valid, test)

cfg = UltraConfig.default(ds.num_relations, rspmm_impl="pallas")
# shipped default: remat/stack resolve per graph ("auto" -> full-save +
# unrolled where the backward peak fits HBM, measured fastest in round 4)
cfg = dataclasses.replace(
    cfg,
    entity=dataclasses.replace(
        cfg.entity, remat="auto", compute_dtype=args.compute_dtype),
    relation=dataclasses.replace(
        cfg.relation, remat="auto", compute_dtype=args.compute_dtype),
)
task = TransductiveKGTask(ds, cfg, TaskConfig(num_negative=64))
eng = Engine(task, batch_size=64, lr=5e-4, log_interval=100, work_dir="/tmp")

m0 = eng.evaluate("valid", fast_test=200)
print("initial:", {k: round(v, 4) for k, v in m0.items()}, flush=True)
t0 = time.time()
eng.train(num_epoch=1, batch_per_epoch=400)
print(f"400 steps in {time.time()-t0:.1f}s", flush=True)
m1 = eng.evaluate("valid", fast_test=200)
print("after:", {k: round(v, 4) for k, v in m1.items()}, flush=True)
verdict = "LEARNING OK" if m1["mrr"] > max(10 * m0["mrr"], 0.05) else "SUSPECT"
print(f"MRR {m0['mrr']:.4f} -> {m1['mrr']:.4f}  [{verdict}]", flush=True)
