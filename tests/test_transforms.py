"""Transform tests, following the reference's commented property specs
(chem/util.py:290-420): label copies, mask tokens, neighborhood identities."""

import numpy as np

from pretrain_gnns_tpu.core.graphs import Graph
from pretrain_gnns_tpu.data import transforms
from pretrain_gnns_tpu.data.synthetic import random_molecule


def _graph(rng, n=12):
    x, ei, ea = random_molecule(rng, n)
    return Graph(x, ei, ea)


def test_mask_atom_properties(rng):
    g = _graph(rng)
    t = transforms.MaskAtom(119, 5, 0.15, mask_edge=True)
    out = t(g, rng)
    idx = out.extras["masked_atom_indices"][0]
    labels = out.extras["mask_node_label"][0]
    # labels equal the original features; masked rows equal the mask token
    np.testing.assert_array_equal(labels, g.node_feat[idx])
    np.testing.assert_array_equal(
        out.node_feat[idx], np.tile([119, 0], (len(idx), 1))
    )
    # unmasked rows untouched; original graph not mutated
    untouched = np.setdiff1d(np.arange(g.num_nodes), idx)
    np.testing.assert_array_equal(out.node_feat[untouched],
                                  g.node_feat[untouched])
    assert not np.array_equal(out.node_feat, g.node_feat)
    # sample size = int(N * rate + 1)
    assert len(idx) == int(g.num_nodes * 0.15 + 1)
    # edge side: every edge incident to a masked atom is overwritten on
    # both directions; labels match originals of every-2nd index
    conn = out.extras["connected_edge_indices"][0]
    elabels = out.extras["mask_edge_label"][0]
    inc = np.where(
        np.isin(g.edge_index[0], idx) | np.isin(g.edge_index[1], idx)
    )[0]
    np.testing.assert_array_equal(conn, inc[::2])
    np.testing.assert_array_equal(elabels, g.edge_feat[inc[::2]])
    np.testing.assert_array_equal(
        out.edge_feat[inc], np.tile([5, 0], (len(inc), 1))
    )


def test_mask_atom_deterministic_indices(rng):
    g = _graph(rng)
    t = transforms.MaskAtom(119, 5, 0.15, mask_edge=False)
    out = t(g, rng, masked_atom_indices=np.array([0, 3]))
    np.testing.assert_array_equal(
        out.extras["masked_atom_indices"][0], [0, 3]
    )
    assert "connected_edge_indices" not in out.extras


def test_negative_edge(rng):
    g = _graph(rng, 16)
    out = transforms.NegativeEdge()(g, rng)
    neg = out.extras["negative_edges"][0]
    assert neg.shape[0] == g.num_edges // 2
    existing = set(zip(g.edge_index[0].tolist(), g.edge_index[1].tolist()))
    seen = set()
    for a, b in neg:
        assert a != b
        assert (a, b) not in existing
        assert (a, b) not in seen
        seen.add((int(a), int(b)))


def test_k_hop_nodes_chain():
    # path 0-1-2-3-4
    ei = np.array([[0, 1, 1, 2, 2, 3, 3, 4],
                   [1, 0, 2, 1, 3, 2, 4, 3]])
    ei = np.stack([ei[1], ei[0]])  # receiver/sender orientation irrelevant
    assert transforms.k_hop_nodes(ei, 5, 2, 0).tolist() == [2]
    assert transforms.k_hop_nodes(ei, 5, 2, 1).tolist() == [1, 2, 3]
    assert transforms.k_hop_nodes(ei, 5, 0, 2).tolist() == [0, 1, 2]
    assert transforms.k_hop_nodes(ei, 5, 0, -1).tolist() == []


def test_context_pair_chain():
    # path of 7 nodes, root 0, k=2, l1=1, l2=4:
    # substruct = {0,1,2}; context = dist in (1,4] = {2,3,4}; overlap = {2}
    n = 7
    pairs = [(i, i + 1) for i in range(n - 1)]
    ei = []
    for a, b in pairs:
        ei += [(a, b), (b, a)]
    ei = np.array(ei).T
    g = Graph(
        node_feat=np.stack([np.arange(n), np.zeros(n)], 1).astype(np.int64),
        edge_index=ei,
        edge_feat=np.zeros((ei.shape[1], 2), np.int64),
    )
    t = transforms.ExtractSubstructureContextPair(2, 1, 4)
    rng = np.random.default_rng(0)
    pair = t(g, rng, root_idx=0)
    assert pair is not None
    # substruct nodes {0,1,2} -> features 0,1,2
    np.testing.assert_array_equal(pair.substruct.node_feat[:, 0], [0, 1, 2])
    assert pair.substruct.extras["center_substruct_idx"][0].tolist() == [0]
    # context nodes {2,3,4}; overlap (={2}) is index 0 in context order
    np.testing.assert_array_equal(pair.context.node_feat[:, 0], [2, 3, 4])
    assert pair.context.extras[
        "overlap_context_substruct_idx"
    ][0].tolist() == [0]
    # context edges: only 2-3 and 3-4 survive induction (4 directed)
    assert pair.context.num_edges == 4


def test_context_pair_empty_returns_none():
    # single edge graph, l1=1 covers everything -> empty context
    g = Graph(
        node_feat=np.zeros((2, 2), np.int64),
        edge_index=np.array([[0, 1], [1, 0]]),
        edge_feat=np.zeros((2, 2), np.int64),
    )
    t = transforms.ExtractSubstructureContextPair(2, 1, 4)
    assert t(g, np.random.default_rng(0), root_idx=0) is None
