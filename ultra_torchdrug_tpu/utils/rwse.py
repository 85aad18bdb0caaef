"""Random-walk structural encodings (RWSE / RRPE).

Re-implements random_walk_se (/root/reference/ultra/util.py:156-230): diagonal
landing probabilities of the k-step random-walk matrices P^k with
P = D^-1 A (rows normalized), optionally returning the dense matrices as
relative positional features. Host-side preprocessing on scipy sparse — the
reference uses torch sparse COO power iteration on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

from ..data.graph import Graph


def random_walk_se(
    graph: Graph,
    ksteps: int,
    return_all: bool = False,
    remove_loops: bool = False,
):
    """Returns rw_landing [V, ksteps] (and rrpe [V, V, ksteps] if return_all)."""
    V = graph.num_nodes
    edges = np.unique(np.asarray(graph.edge_index), axis=0)
    if remove_loops:
        edges = edges[edges[:, 0] != edges[:, 1]]
    src, dst = edges[:, 0], edges[:, 1]
    adj = sp.csr_matrix(
        (np.ones(len(src)), (src, dst)), shape=(V, V), dtype=np.float64
    )
    deg = np.asarray(adj.sum(axis=1)).ravel()
    inv = np.divide(1.0, deg, out=np.zeros_like(deg), where=deg > 0)
    P = sp.diags(inv) @ adj

    steps = ksteps + 1 if remove_loops else ksteps
    rws, rrpes = [], []
    Pk = P.copy()
    for _ in range(steps):
        rws.append(Pk.diagonal())
        if return_all:
            rrpes.append(np.asarray(Pk.todense()))
        Pk = Pk @ P
    rw = np.stack(rws, axis=1)  # [V, steps]
    rrpe = np.stack(rrpes, axis=2) if return_all else None
    if remove_loops:
        # first power's diagonal is all zeros once self-loops are removed
        rw = rw[:, 1:]
        rrpe = rrpe[..., 1:] if rrpe is not None else None
    rw = rw.astype(np.float32)
    if return_all:
        return rw, rrpe.astype(np.float32)
    return rw
