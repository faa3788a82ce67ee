"""Device-resident dataset: on-device batch materialization must be
semantically identical to host packing (same graphs, masks, labels and
loss), modulo the chunk-aligned slot layout it uses for wide-row gathers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pretrain_gnns_tpu.core import graphs as G
from pretrain_gnns_tpu.data import transforms
from pretrain_gnns_tpu.data.device_pack import CHUNK, DeviceBatchLoader
from pretrain_gnns_tpu.data.flat import FlatGraphs
from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.objectives.masking import MaskingObjective
from pretrain_gnns_tpu.train import pretrain


def _as_np(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _slot_runs(db, i):
    """(start, length) of graph slot i's node rows in the packed batch."""
    rows = np.nonzero((db.node_graph == i) & db.node_mask)[0]
    assert rows.size == 0 or (np.diff(rows) == 1).all(), "non-contiguous"
    return (int(rows[0]) if rows.size else 0), rows.size


@pytest.mark.parametrize("blocks", [None, (8, 128, 384)])
def test_materialize_semantics(blocks):
    graphs, _ = molecule_dataset(60, num_tasks=3, seed=1, mean_atoms=14)
    flat = FlatGraphs.from_graphs(graphs)
    dev = DeviceBatchLoader(flat, batch_size=16, max_nodes=512,
                            max_edges=1536, shuffle=True, seed=4,
                            blocks=blocks)
    descs = list(dev)
    total_graphs = 0
    for desc in descs:
        db = _as_np(dev.prepare(desc))
        k = int(db.graph_mask.sum())
        total_graphs += k
        for i in range(k):
            g = graphs[int(desc["gid"][i])]
            start, n = _slot_runs(db, i)
            assert start % CHUNK == 0  # chunk-aligned placement
            assert n == g.num_nodes
            np.testing.assert_array_equal(
                db.node_feat[start: start + n], g.node_feat
            )
            np.testing.assert_array_equal(db.y[i], g.y)
            # this graph's edges: senders/receivers = start + local
            em = db.edge_mask & (
                (db.senders >= start) & (db.senders < start + n)
            )
            rcv = db.receivers[em] - start
            snd = db.senders[em] - start
            order = np.lexsort((snd, rcv))
            ref_order = np.lexsort((g.edge_index[1], g.edge_index[0]))
            np.testing.assert_array_equal(rcv[order],
                                          g.edge_index[0][ref_order])
            np.testing.assert_array_equal(snd[order],
                                          g.edge_index[1][ref_order])
            np.testing.assert_array_equal(
                db.edge_feat[em][order], g.edge_feat[ref_order]
            )
        # padded rows/edges are zero and masked
        assert not db.node_feat[~db.node_mask].any()
        assert int(db.edge_mask.sum()) == sum(
            graphs[int(desc["gid"][i])].num_edges for i in range(k)
        )
    assert total_graphs == 60
    assert dev.last_epoch_stats["graphs"] == 60


def test_materialize_masking_matches_host_objective():
    """Feeding the SAME graphs with the SAME masked atoms through the host
    MaskAtom/pack path must give exactly the device pipeline's loss."""
    graphs, _ = molecule_dataset(40, num_tasks=1, seed=2, mean_atoms=14)
    flat = FlatGraphs.from_graphs(graphs)
    nb, eb = 128, 768
    dev = DeviceBatchLoader(
        flat, batch_size=16, max_nodes=512, max_edges=1536, shuffle=True,
        seed=9,
        mask_spec=dict(rate=0.15, mask_edge=True, node_budget=nb,
                       edge_budget=eb, atom_token=119, bond_token=5),
    )
    model = MaskingObjective(num_layer=2, emb_dim=16, mask_edge=True)
    variables = None
    for desc in dev:
        db = _as_np(dev.prepare(desc))
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), db, train=False)
        k = int(db.graph_mask.sum())
        t = transforms.MaskAtom(119, 5, 0.15, True)
        transformed = []
        for i in range(k):
            g = graphs[int(desc["gid"][i])]
            start, n = _slot_runs(db, i)
            local = np.nonzero(
                desc["masked_bool"][start: start + n]
            )[0]
            assert len(local) == int(n * 0.15) + 1  # reference count
            transformed.append(
                t(g, np.random.default_rng(0), masked_atom_indices=local)
            )
        host = G.pack_graphs(
            transformed, 512, 1536, 16,
            extra_pad={"masked_atom_indices": nb, "mask_node_label": nb,
                       "connected_edge_indices": eb,
                       "mask_edge_label": eb},
            np_out=True,
        )
        loss_d, met_d = model.apply(variables, db, train=False)
        loss_h, met_h = model.apply(variables, host, train=False)
        np.testing.assert_allclose(float(loss_d), float(loss_h), rtol=1e-5)
        for key in met_h:
            np.testing.assert_allclose(float(met_d[key]),
                                       float(met_h[key]), rtol=1e-5,
                                       err_msg=key)


def test_run_pretrain_device_dataset_end_to_end():
    """device_dataset='on' trains through descriptors end-to-end."""
    graphs, _ = molecule_dataset(48, num_tasks=1, seed=3, mean_atoms=12)
    cfg = pretrain.PretrainConfig(
        objective="masking", num_layer=2, emb_dim=16, batch_size=16,
        epochs=2, mask_edge=True, packing="standard",
        transform_device="batch", device_dataset="on", scan_steps=2,
    )
    res = pretrain.run_pretrain(cfg, graphs, log=None)
    assert isinstance(res["loader"], DeviceBatchLoader)
    assert len(res["history"]) == 2
    assert np.isfinite(res["history"][-1]["loss"])
    assert "acc_node" in res["history"][-1]
    assert "acc_edge" in res["history"][-1]
