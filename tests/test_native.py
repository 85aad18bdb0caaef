"""Native C++ preprocessing library vs the numpy reference paths."""

import numpy as np
import pytest

from ultra_torchdrug_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native graphlib unavailable (no g++?)")
    return True


def test_native_builds(lib_ok):
    assert native.available()


def test_csr_layout_native_matches_numpy(lib_ok, rng):
    from ultra_torchdrug_tpu.ops import csr

    E, V, R = 500, 40, 7
    rows = rng.integers(0, V, E).astype(np.int32)
    g1 = rng.integers(0, V, E).astype(np.int32)
    g2 = rng.integers(0, V, E).astype(np.int32)
    aux = rng.integers(0, R, E).astype(np.int32)

    lay_native = csr.build_layout(rows, g1, aux, V, gather2_ids=g2,
                                  tile_rows=16, tile_edges=32)

    # force numpy path
    import ultra_torchdrug_tpu.native as nat
    orig = nat.csr_layout_build_native
    nat.csr_layout_build_native = lambda *a, **k: None
    try:
        lay_np = csr.build_layout(rows, g1, aux, V, gather2_ids=g2,
                                  tile_rows=16, tile_edges=32)
    finally:
        nat.csr_layout_build_native = orig

    for field in ("gather1", "gather2", "aux", "row_local", "edge_id",
                  "valid", "cr_pairs"):
        np.testing.assert_array_equal(
            np.asarray(getattr(lay_native, field)),
            np.asarray(getattr(lay_np, field)),
            err_msg=field,
        )
    assert lay_native.num_chunks == lay_np.num_chunks


def test_relation_patterns_native_matches_scipy(lib_ok, rng):
    from ultra_torchdrug_tpu.data.graph import Graph
    from ultra_torchdrug_tpu.data import relgraph
    import ultra_torchdrug_tpu.native as nat

    V, E, R = 20, 100, 5
    tri = np.stack([
        rng.integers(0, V, E), rng.integers(0, V, E), rng.integers(0, R, E)
    ], 1).astype(np.int32)
    g = Graph.from_triplets(tri, V, R)

    rg_native = relgraph.build_relation_graph(g)
    orig = nat.relation_graph_patterns_native
    nat.relation_graph_patterns_native = lambda *a, **k: None
    try:
        rg_np = relgraph.build_relation_graph(g)
    finally:
        nat.relation_graph_patterns_native = orig

    got = {tuple(e) for e in np.asarray(rg_native.edge_list).tolist()}
    want = {tuple(e) for e in np.asarray(rg_np.edge_list).tolist()}
    assert got == want
    assert rg_native.num_nodes == rg_np.num_nodes


def test_degree_balanced_lpt_native_matches_python():
    """The C++ LPT must be bit-identical to the Python reference (same
    stable degree order, same lightest-block-smallest-id tie rule)."""
    import numpy as np

    from ultra_torchdrug_tpu import native
    from ultra_torchdrug_tpu.parallel.balance import _lpt_python

    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    for V, n in [(50, 8), (301, 4), (1000, 16)]:
        vb = -(-V // n)
        deg = rng.integers(0, 200, V).astype(np.int64)
        deg[rng.integers(0, V, 5)] += 5000  # hubs + ties both present
        got = native.degree_balanced_lpt_native(deg, n, vb)
        want = _lpt_python(deg, n, vb)
        np.testing.assert_array_equal(got, want)
