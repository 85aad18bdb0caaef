"""Device mesh management for multi-chip execution.

The reference's parallelism is NCCL DDP (data parallel only, full graph
replicated per rank — /root/reference/ultra/engine.py:55-60). Here the mesh has
two axes:

  * "data" — batch sharding; XLA inserts gradient psums (DDP parity)
  * "edge" — the north-star extension: the knowledge graph's edge list is
    partitioned across chips; each chip computes partial aggregations over its
    edge shard and results are combined with psum over ICI
    (parallel/sharded_rspmm.py)

A module-level mesh context makes the active mesh visible to model code at
trace time without threading it through every config dataclass.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_CURRENT_MESH: Optional[Mesh] = None


def make_mesh(data: int = 1, edge: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * edge
    if n > len(devices):
        raise ValueError(f"mesh {data}x{edge} needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, edge)
    return Mesh(dev, ("data", "edge"))


def current_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    global _CURRENT_MESH
    prev = _CURRENT_MESH
    _CURRENT_MESH = mesh
    try:
        yield mesh
    finally:
        _CURRENT_MESH = prev


def shard_batch(batch, mesh: Mesh):
    """Place a [B, ...] batch array sharded over the data axis."""
    return jax.device_put(batch, NamedSharding(mesh, P("data")))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


