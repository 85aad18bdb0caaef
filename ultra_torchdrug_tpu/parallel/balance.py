"""Degree-balanced node relabeling for the edge-partitioned rspmm paths.

The multi-chip partitions (parallel/sharded_rspmm.py, parallel/ring_rspmm.py)
split node rows into n contiguous equal-size blocks; a chip's kernel work is
proportional to the edge count touching its block. Real KGs are hub-dominated
(Zipf-like degree tails), so contiguous ID blocks can be badly edge-imbalanced
— the slowest chip gates every lockstep ring step (DESIGN.md roadmap #1).

Rather than variable block boundaries (which would break the uniform static
shapes the SPMD kernels need), the fix is a host-side RELABELING: a
permutation of node ids chosen so the contiguous equal blocks of the NEW id
space carry near-equal total degree. Every kernel, layout, and collective is
untouched; the op just gathers x into the new order on entry and the output
back on exit (two [V, F] gathers — noise next to the propagation itself).

On the undirected propagation graph ([directed; inverse] edge order) each
node's in-degree equals its out-degree, so ONE permutation balances both the
forward (dst-block) and backward (src-block) partitions.
"""

from __future__ import annotations

import heapq

import numpy as np


def degree_balanced_permutation(src, dst, num_nodes: int, n_blocks: int):
    """Greedy capacity-constrained LPT assignment of nodes to blocks.

    Nodes are taken in decreasing total-degree order; each goes to the
    currently lightest block that still has a free slot (every block holds
    exactly vb = ceil(V/n) new ids). LPT is within 4/3 of the optimal
    makespan; with Zipf tails the result is near-exact because the many
    degree-0/1 tail nodes level any residual gap.

    Returns (to_new, to_old):
      to_new: int32 [V] — new id of each original node
      to_old: int32 [n_blocks * vb] — original node for each new id; empty
        slots (when n*vb > V) point at row `num_nodes`, i.e. the zero pad row
        of a row-padded operand.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    vb = -(-num_nodes // n_blocks)
    deg = (np.bincount(src, minlength=num_nodes)
           + np.bincount(dst, minlength=num_nodes))

    from ..native import degree_balanced_lpt_native

    to_new = degree_balanced_lpt_native(deg, n_blocks, vb)
    if to_new is None:  # no toolchain: bit-identical Python fallback
        to_new = _lpt_python(deg, n_blocks, vb)

    v_pad = n_blocks * vb
    to_old = np.full(v_pad, num_nodes, np.int32)
    to_old[to_new] = np.arange(num_nodes, dtype=np.int32)
    return to_new, to_old


def _lpt_python(deg: np.ndarray, n_blocks: int, vb: int) -> np.ndarray:
    """Reference implementation of the LPT assignment (the native
    graphlib.cpp::degree_balanced_lpt must match it bit for bit)."""
    order = np.argsort(-deg, kind="stable")
    heap = [(0, s) for s in range(n_blocks)]
    heapq.heapify(heap)
    counts = np.zeros(n_blocks, np.int64)
    to_new = np.empty(len(deg), np.int32)
    for node in order:
        load, s = heapq.heappop(heap)
        to_new[node] = s * vb + counts[s]
        counts[s] += 1
        if counts[s] < vb:
            heapq.heappush(heap, (load + int(deg[node]), s))
    return to_new


def block_edge_counts(key, num_nodes: int, n_blocks: int) -> np.ndarray:
    """Edges per block when rows are split into contiguous ceil(V/n) blocks
    keyed by `key` (dst for the forward partition, src for the backward)."""
    vb = -(-num_nodes // n_blocks)
    return np.bincount(np.asarray(key, np.int64) // vb, minlength=n_blocks)


def imbalance(key, num_nodes: int, n_blocks: int) -> float:
    """max/mean per-block edge count (1.0 == perfectly balanced)."""
    counts = block_edge_counts(key, num_nodes, n_blocks)
    mean = counts.mean()
    return float(counts.max() / mean) if mean else 1.0


def resolve_balance(balance, src, dst, num_nodes: int, n_blocks: int) -> bool:
    """balance='auto': relabel only when the contiguous split is actually
    imbalanced (>25% above mean on either partition) — already-balanced
    graphs skip the permutation and its entry/exit gathers."""
    if balance != "auto":
        return bool(balance)
    return (imbalance(dst, num_nodes, n_blocks) > 1.25
            or imbalance(src, num_nodes, n_blocks) > 1.25)
