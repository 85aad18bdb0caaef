"""Relation-graph construction vs brute force."""

import numpy as np

from ultra_torchdrug_tpu.data.graph import Graph
from ultra_torchdrug_tpu.data.relgraph import (
    ETYPE_HH, ETYPE_HT, ETYPE_TH, ETYPE_TT, build_relation_graph,
)


def test_relation_graph_matches_bruteforce(rng):
    V, E, R = 12, 50, 4
    triplets = np.stack(
        [rng.integers(0, V, E), rng.integers(0, V, E), rng.integers(0, R, E)], axis=1
    ).astype(np.int32)
    g = Graph.from_triplets(triplets, V, R)
    rg = build_relation_graph(g)
    assert rg.num_nodes == 2 * R and rg.num_relations == 4

    # brute force over the undirected+inverse graph
    und = [(h, t, r) for h, t, r in triplets.tolist()]
    und += [(t, h, r + R) for h, t, r in triplets.tolist()]
    heads = {}  # rel -> set of head entities
    tails = {}
    for h, t, r in und:
        heads.setdefault(r, set()).add(h)
        tails.setdefault(r, set()).add(t)
    want = set()
    for r1 in range(2 * R):
        for r2 in range(2 * R):
            if heads.get(r1, set()) & heads.get(r2, set()):
                want.add((r1, r2, ETYPE_HH))
            if tails.get(r1, set()) & tails.get(r2, set()):
                want.add((r1, r2, ETYPE_TT))
            if heads.get(r1, set()) & tails.get(r2, set()):
                want.add((r1, r2, ETYPE_HT))
            if tails.get(r1, set()) & heads.get(r2, set()):
                want.add((r1, r2, ETYPE_TH))
    got = {tuple(e) for e in np.asarray(rg.edge_list).tolist()}
    assert got == want
