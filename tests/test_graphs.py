"""Packing tests: PackedGraphs must reproduce the reference's cumsum-offset
batching semantics (chem/batch.py:16-52) under static shapes."""

import numpy as np
import pytest

from pretrain_gnns_tpu.core import graphs as G


def tri(feat0=0):
    """Triangle graph: 3 nodes, 3 undirected bonds -> 6 directed edges."""
    ei = np.array(
        [[0, 1, 1, 2, 2, 0], [1, 0, 2, 1, 0, 2]], np.int64
    )
    return G.Graph(
        node_feat=np.full((3, 2), feat0, np.int64),
        edge_index=ei,
        edge_feat=np.zeros((6, 2), np.int64),
        y=np.array([1.0, -1.0]),
    )


def pair():
    """2 nodes, 1 bond."""
    return G.Graph(
        node_feat=np.array([[5, 0], [6, 1]], np.int64),
        edge_index=np.array([[0, 1], [1, 0]], np.int64),
        edge_feat=np.ones((2, 2), np.int64),
        y=np.array([0.0, 1.0]),
    )


def test_pack_offsets_and_masks():
    p = G.pack_graphs([tri(), pair()], max_nodes=8, max_edges=12,
                      max_graphs=4, np_out=True)
    assert p.node_feat.shape == (8, 2)
    assert p.senders.shape == (12,)
    # second graph's edges offset by 3 nodes
    np.testing.assert_array_equal(p.receivers[6:8], [3, 4])
    np.testing.assert_array_equal(p.senders[6:8], [4, 3])
    np.testing.assert_array_equal(p.node_graph[:5], [0, 0, 0, 1, 1])
    assert p.node_mask.sum() == 5 and p.edge_mask.sum() == 8
    assert p.graph_mask.tolist() == [True, True, False, False]
    # padded indices stay in range
    assert p.senders.max() < 8 and p.receivers.max() < 8
    assert p.node_graph[5:].tolist() == [0, 0, 0]
    np.testing.assert_array_equal(p.y[:2], [[1, -1], [0, 1]])


def test_extras_node_and_edge_idx_offsets():
    g1, g2 = tri(), pair()
    g1.extras["masked_atom_indices"] = (np.array([2]), G.NODE_IDX)
    g2.extras["masked_atom_indices"] = (np.array([0, 1]), G.NODE_IDX)
    g1.extras["connected_edge_indices"] = (np.array([0, 4]), G.EDGE_IDX)
    g2.extras["connected_edge_indices"] = (np.array([0]), G.EDGE_IDX)
    p = G.pack_graphs(
        [g1, g2], 8, 12, 2,
        extra_pad={"masked_atom_indices": 4, "connected_edge_indices": 4},
        np_out=True,
    )
    np.testing.assert_array_equal(
        p.extras["masked_atom_indices"][:3], [2, 3, 4]
    )
    np.testing.assert_array_equal(
        p.extras["masked_atom_indices_mask"], [1, 1, 1, 0]
    )
    np.testing.assert_array_equal(
        p.extras["connected_edge_indices"][:3], [0, 4, 6]
    )


def test_degree_and_counts():
    import jax.numpy as jnp  # noqa: F401

    p = G.pack_graphs([tri(), pair()], 8, 12, 3)
    np.testing.assert_array_equal(
        np.asarray(p.nodes_per_graph()), [3, 2, 0]
    )
    np.testing.assert_array_equal(
        np.asarray(p.in_degree()), [2, 2, 2, 1, 1, 0, 0, 0]
    )
    np.testing.assert_array_equal(
        np.asarray(p.in_degree(include_self_loop=True)),
        [3, 3, 3, 2, 2, 0, 0, 0],
    )


def test_overflow_raises():
    with pytest.raises(ValueError):
        G.pack_graphs([tri(), tri()], max_nodes=5, max_edges=12)
    with pytest.raises(ValueError):
        G.pack_graphs([tri()], max_nodes=8, max_edges=5)


def test_bucket():
    assert G.pad_to_buckets(37, [32, 64, 128]) == 64
    with pytest.raises(ValueError):
        G.pad_to_buckets(300, [32, 64])
