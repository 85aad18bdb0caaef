import jax
import jax.numpy as jnp
import numpy as np

from ultra_torchdrug_tpu.data.graph import Graph


def small_graph():
    triplets = np.array([[0, 1, 0], [1, 2, 1], [2, 0, 0], [0, 2, 1]], np.int32)
    return Graph.from_triplets(triplets, num_nodes=3, num_relations=2)


def test_basic_fields():
    g = small_graph()
    assert g.num_edges == 4 and g.num_nodes == 3 and g.num_relations == 2
    np.testing.assert_array_equal(np.asarray(g.heads), [0, 1, 2, 0])
    np.testing.assert_array_equal(np.asarray(g.edge_list)[:, 2], [0, 1, 0, 1])


def test_undirected_with_inverse():
    g = small_graph().undirected_with_inverse()
    assert g.num_edges == 8 and g.num_relations == 4
    el = np.asarray(g.edge_list)
    # inverse of (0,1,0) is (1,0,2)
    assert [1, 0, 2] in el.tolist()


def test_degree_out():
    g = small_graph()
    np.testing.assert_allclose(np.asarray(g.degree_out()), [1.0, 1.0, 2.0])


def test_graph_is_pytree():
    g = small_graph()
    leaves = jax.tree_util.tree_leaves(g)
    assert len(leaves) == 3
    g2 = jax.tree_util.tree_map(lambda x: x, g)
    assert g2.num_nodes == g.num_nodes

    @jax.jit
    def f(graph):
        return graph.degree_out()

    np.testing.assert_allclose(np.asarray(f(g)), [1.0, 1.0, 2.0])


def test_sorted_by_tail():
    g = small_graph().sorted_by_tail()
    tails = np.asarray(g.tails)
    assert (np.diff(tails) >= 0).all()
