"""Eval-path (all-entity scoring) throughput.

TPU diagnostic harness (run directly on the TPU host; compiles are cached
in .jax_cache). See STATUS.md for the numbers these produced in round 1.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import time, dataclasses
import numpy as np, jax, jax.numpy as jnp
from ultra_torchdrug_tpu.data.datasets import synthetic_transductive
from ultra_torchdrug_tpu.tasks.task import TransductiveKGTask, TaskConfig
from ultra_torchdrug_tpu.models.ultra import UltraConfig

ds = synthetic_transductive("fb", 14541, 272115, 237, seed=0)
cfg = UltraConfig.default(ds.num_relations, rspmm_impl="pallas")
task = TransductiveKGTask(ds, cfg, TaskConfig(num_negative=128))
params = task.init_params(jax.random.PRNGKey(0))
batch = jnp.asarray(ds.valid[:16])
key = jax.random.PRNGKey(1)

f = task._eval_fn
out = f(params, batch, key); jax.block_until_ready(out)
best = 1e9
for _ in range(3):
    t0 = time.time()
    for _ in range(4):
        out = f(params, batch, key)
    jax.block_until_ready(out)
    best = min(best, (time.time()-t0)/4)
print(f"eval batch-16 (2x all-entity scoring + filtered ranks): {best*1e3:.0f} ms "
      f"-> {16/best:.1f} triples/s", flush=True)
