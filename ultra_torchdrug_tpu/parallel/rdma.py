"""Pallas remote-DMA boundary exchange for the ring rspmm schedules.

The ring paths (parallel/ring_rspmm.py) rotate the held node-state block to
the right neighbor once per ring step. The default transport is
`jax.lax.ppermute` — an XLA collective the scheduler overlaps with the
step's aggregation. This module provides the kernel-level alternative the
north star names (BASELINE.json "boundary exchange"): a Pallas kernel that
pushes the block over ICI itself with `pltpu.make_async_remote_copy`
(HBM→HBM RDMA, no XLA collective machinery in the path).

Semantics are identical to `ppermute(perm=[(i, (i+1) % n)])`: after the
call, shard s holds what shard s-1 held. Each kernel invocation:

  1. neighbor barrier (left+right) — guarantees the receiver has entered
     the kernel, so its destination buffer exists and its recv semaphore
     is live before any payload moves;
  2. one `make_async_remote_copy` of the full local ref to the right
     neighbor's output ref (LOGICAL device id on the shard_map axis);
  3. `wait()` — drains the local send semaphore AND the local recv
     semaphore (the left neighbor's copy landing here).

The payload stays in ANY/HBM memory space end to end: no VMEM staging, so
block size is bounded by HBM, not by the ~16 MB VMEM budget (entity blocks
at ATOMIC scale are hundreds of MB). This file is validated in Pallas TPU
interpret mode (`pltpu.InterpretParams`) on the virtual CPU mesh —
`tests/test_parallel.py` pins rdma == ppermute for the add and max ring
paths; real-ICI timing awaits >1 physical chip (parallel/DESIGN.md).

The production default stays `ppermute`: XLA already overlaps that
transfer with the current step's segment ops, while a fused
aggregate+exchange kernel (start send early / wait late inside one
pallas_call) is the step after this prototype.

Reference analogue: none — the reference replicates node states per GPU
(/root/reference/ultra/engine.py:55-60) and has no boundary exchange.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# Barrier-semaphore namespace base. Rotations across ring STEPS are
# data-dependent (step k+1 consumes step k's block) so they can share an
# id, but the leaves of one tree rotate independently (e.g. the minmax
# backward's (g, out) pair) and XLA may schedule them concurrently — each
# leaf index gets its own id so concurrent kernels never cross-signal.
_COLLECTIVE_ID = 13


def _rotate_kernel(axis: str, n: int):
    def kern(x_ref, out_ref, send_sem, recv_sem):
        my = jax.lax.axis_index(axis)
        right = jax.lax.select(my == n - 1, 0, my + 1)
        left = jax.lax.select(my == 0, n - 1, my - 1)
        bar = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(bar, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(bar, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(bar, 2)
        rdma = pltpu.make_async_remote_copy(
            src_ref=x_ref,
            dst_ref=out_ref,
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()

    return kern


def _rotate_leaf(arr, axis: str, n: int, interpret, leaf_idx: int):
    return pl.pallas_call(
        _rotate_kernel(axis, n),
        out_shape=jax.ShapeDtypeStruct(arr.shape, arr.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            collective_id=_COLLECTIVE_ID + leaf_idx, has_side_effects=True,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(arr)


def rdma_rotate(tree, *, axis: str, n_shards: int, interpret=None):
    """Rotate every array leaf of `tree` one shard rightward along the
    shard_map axis `axis` via remote DMA. Call INSIDE shard_map; leaves are
    the local shards. Drop-in for
    `jax.lax.ppermute(tree, axis, [(i, (i+1) % n)])`."""
    if n_shards == 1:
        return tree
    interpret = _interpret_default() if interpret is None else interpret
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    rotated = [
        _rotate_leaf(a, axis, n_shards, interpret, i)
        for i, a in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, rotated)
