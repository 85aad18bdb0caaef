"""ultra_torchdrug_tpu — a TPU-native relational message-passing framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
DeepGraphLearning/ultra_torchdrug (ULTRA: foundation models for knowledge-graph
reasoning, arXiv 2310.04562) plus the torchdrug machinery it depends on
(training engine, graph data structure, rspmm kernel, distributed runtime,
config registry).

Design stance (TPU-first, not a port):
  * static shapes everywhere — edge deletion becomes weight masking, wildcard
    `graph.match` becomes sort-merge joins, variadic ops become padded segment ops
  * a Graph is an immutable pytree of device arrays, not a mutable object
  * the hot op (relational SpMM, `ops.rspmm`) has an XLA segment-op reference
    implementation and a Pallas TPU kernel
  * parallelism is jax.sharding over a device Mesh (data + edge axes), not NCCL
"""

__version__ = "0.1.0"

from . import data, ops, nn, models, tasks, utils
