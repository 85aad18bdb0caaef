"""Multi-host runtime: coordinator-based initialization + cross-host
collectives for the engine.

Replaces the reference's torch.distributed/NCCL layer
(/root/reference/ultra/util.py:104-128 env:// rendezvous + shared-FS workdir
sync; engine.py:89-90,148-150 metric reduce / eval gather). JAX's distributed
runtime uses a coordinator address instead of a shared filesystem; collectives
ride the ICI/DCN fabric through jit-compiled psums and process-level
all-gathers.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize multi-host JAX. No-op when single-process (the common
    single-host case, mirroring the reference's lazy world_size>1 init)."""
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        # CPU cross-process collectives need the gloo transport (the TPU
        # path rides ICI/DCN natively); must be set before initialize()
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def reduce_metrics_mean(metrics: Dict[str, float]) -> Dict[str, float]:
    """Mean-allreduce a metric dict across processes (comm.reduce(op="mean"),
    engine.py:89-90). Uses a tiny jitted psum over all devices."""
    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vec = np.asarray([float(metrics[k]) for k in keys], np.float32)
    summed = multihost_utils.process_allgather(vec)
    mean = np.asarray(summed).mean(axis=0)
    return dict(zip(keys, mean.tolist()))


def gather_rankings(ranking: np.ndarray, total: Optional[int] = None) -> np.ndarray:
    """Gather per-process eval results and restore the ORIGINAL triple order
    (comm.cat, engine.py:148-150). process_allgather returns process-major
    [P, n_shard, ...]; the round-robin shard order is inverted so row i again
    corresponds to triple i (per-relation metric attribution depends on it).
    `total` truncates the padding added by shard_eval_triples."""
    if jax.process_count() == 1:
        return ranking
    from jax.experimental import multihost_utils

    gathered = np.asarray(multihost_utils.process_allgather(ranking))
    P = jax.process_count()
    flat = gathered.reshape(P * gathered.shape[1], *ranking.shape[1:])
    out = invert_round_robin(flat, P)
    return out[:total] if total is not None else out


def invert_round_robin(flat: np.ndarray, P: int) -> np.ndarray:
    """Reorder a process-major concatenation of round-robin shards back to the
    original element order: flat row p*n_shard + j held original index j*P + p."""
    n_pad = len(flat)
    order = np.concatenate([np.arange(p, n_pad, P) for p in range(P)])
    out = np.empty_like(flat)
    out[order] = flat
    return out


def shard_eval_triples(triples: np.ndarray) -> np.ndarray:
    """Round-robin shard of the eval set per process (DistributedSampler over
    eval triples, engine.py:130). Pads to a multiple of process_count so every
    shard has the same shape (process_allgather requires it); gather_rankings
    drops the padding and restores order."""
    P = jax.process_count()
    if P == 1:
        return triples
    pad = (-len(triples)) % P
    if pad:
        triples = np.concatenate([triples, np.repeat(triples[:1], pad, 0)], 0)
    return triples[jax.process_index() :: P]
