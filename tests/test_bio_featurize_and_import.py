"""Bio real-data featurization (nx ego-graphs -> Graph) and the torch-free
importer for reference-processed PyG dataset files.

Oracle for the importer: fixture files are written with the REAL torch.save
(legacy and zip formats) against a stand-in ``torch_geometric.data.data.Data``
class injected into sys.modules — byte-identical pickle structure to what
PyG 1.0.3's InMemoryDataset persistence produces (class lookup in a pickle
is by module/name string; Data pickles as a plain ``__dict__`` bag).
"""

import os
import sys
import types

import networkx as nx
import numpy as np
import pytest

from pretrain_gnns_tpu.core.graphs import GRAPH, NODE_IDX
from pretrain_gnns_tpu.data import bio_featurize, datasets


def _ego(center="9606.P0"):
    g = nx.Graph()
    w = dict(w1=1, w2=0, w3=1, w4=0, w5=0, w6=1, w7=0)
    g.add_edge("9606.P0", "9606.P1", **w)
    g.add_edge("9606.P1", "9606.P2", **dict(w, w1=0, w7=1))
    g.add_edge("9606.P0", "9606.P3", **dict(w, w2=1))
    return g, center


def test_nx_to_graph_exact_semantics():
    g, center = _ego()
    out = bio_featurize.nx_to_graph(g, center)
    n = g.number_of_nodes()
    # dummy ones node features (bio/loader.py:47-48)
    np.testing.assert_array_equal(out.node_feat, np.ones((n, 1), np.float32))
    # both directions consecutive with identical 9-dim features
    assert out.edge_index.shape == (2, 2 * g.number_of_edges())
    for j in range(0, out.edge_index.shape[1], 2):
        assert out.edge_index[0, j] == out.edge_index[1, j + 1]
        assert out.edge_index[1, j] == out.edge_index[0, j + 1]
        np.testing.assert_array_equal(out.edge_feat[j], out.edge_feat[j + 1])
    # self-loop / mask flag dims stay zero at featurize time
    np.testing.assert_array_equal(out.edge_feat[:, 7:], 0)
    assert out.edge_feat.shape[1] == 9
    # species id parsed from "species.protein" node ids (bio/loader.py:77-85)
    sid, kind = out.extras["species_id"]
    assert kind == GRAPH and sid[0] == 9606
    cidx, kind = out.extras["center_node_idx"]
    assert kind == NODE_IDX
    assert list(g.nodes())[int(cidx[0])] == "9606.P0"


def test_nx_to_graph_go_labels_multi_hot():
    g, center = _ego()
    down = ["GO:1", "GO:2", "GO:3"]
    pre = ["GO:1", "GO:4"]
    labels = {center: ["GO:2", "GO:4"]}
    out = bio_featurize.nx_to_graph(g, center, down, pre, labels)
    np.testing.assert_array_equal(out.y, [0, 1, 0])
    np.testing.assert_array_equal(
        out.extras["go_target_pretrain"][0], [0, 1]
    )
    # center without labels -> all zeros (bio/loader.py:96-100)
    out2 = bio_featurize.nx_to_graph(g, center, down, pre, {"other": ["GO:1"]})
    np.testing.assert_array_equal(out2.y, [0, 0, 0])


def test_graph_to_nx_round_trip():
    g, center = _ego()
    arr = bio_featurize.nx_to_graph(g, center)
    back = bio_featurize.graph_to_nx(arr)
    assert back.number_of_edges() == g.number_of_edges()
    # evidence channels survive as booleans on the integer-relabelled graph
    ids = list(g.nodes())
    for u, v, attr in g.edges(data=True):
        a, b = ids.index(u), ids.index(v)
        assert back.has_edge(a, b)
        for k in ("w1", "w7"):
            assert back[a][b][k] == bool(attr[k])


def test_process_bio_dataset_writes_loadable_npz(tmp_path):
    egos, centers = [], []
    for i in range(4):
        g, c = _ego()
        egos.append(g)
        centers.append(c)
    down = [f"GO:{i}" for i in range(5)]
    pre = [f"GO:{i}" for i in range(8)]
    labels = {"9606.P0": ["GO:1", "GO:3"]}
    out = str(tmp_path / "bio_supervised")
    n = bio_featurize.process_bio_dataset(
        egos, centers, out, down, pre, labels, data_type="supervised"
    )
    assert n == 4
    graphs, _, meta = datasets.load_graphs(out)
    assert meta["num_tasks"] == 5 and meta["domain"] == "bio"
    assert graphs[0].y.shape == (5,)
    assert "go_target_pretrain" in graphs[0].extras
    assert "center_node_idx" in graphs[0].extras


def test_species_rosters_match_reference():
    # bio/loader.py:170-181
    assert len(bio_featurize.SUPERVISED_SPECIES) == 8
    assert len(bio_featurize.UNSUPERVISED_SPECIES) == 50
    assert 9606 in bio_featurize.SUPERVISED_SPECIES
    assert set(bio_featurize.SUPERVISED_SPECIES) <= set(
        bio_featurize.UNSUPERVISED_SPECIES
    )


# ---------------------------------------------------------------------------
# import_pyg: reference processed .pt -> npz
# ---------------------------------------------------------------------------


def _fake_pyg_data_cls():
    """Inject a torch_geometric.data.data.Data stand-in so torch.save
    produces the same pickle bytes PyG 1.0.3 would."""
    if "torch_geometric.data.data" in sys.modules:
        return sys.modules["torch_geometric.data.data"].Data
    root = types.ModuleType("torch_geometric")
    datam = types.ModuleType("torch_geometric.data")
    inner = types.ModuleType("torch_geometric.data.data")

    class Data:
        pass

    Data.__module__ = "torch_geometric.data.data"
    Data.__qualname__ = "Data"
    inner.Data = Data
    datam.data = inner
    root.data = datam
    sys.modules["torch_geometric"] = root
    sys.modules["torch_geometric.data"] = datam
    sys.modules["torch_geometric.data.data"] = inner
    return Data


def _chem_fixture(path, legacy):
    torch = pytest.importorskip("torch")
    Data = _fake_pyg_data_cls()
    d = Data()
    # graph0: 3 nodes / 2 bonds, graph1: 2 nodes / 1 bond (graph-local ids)
    d.x = torch.tensor(
        [[5, 0], [7, 1], [5, 0], [6, 0], [6, 2]], dtype=torch.long
    )
    d.edge_index = torch.tensor(
        [[0, 1, 1, 2, 0, 1], [1, 0, 2, 1, 1, 0]], dtype=torch.long
    )
    d.edge_attr = torch.tensor(
        [[0, 0]] * 4 + [[1, 0]] * 2, dtype=torch.long
    )
    d.y = torch.tensor([1.0, -1.0, 0.0, 1.0])  # 2 tasks, flattened [G*T]
    d.id = torch.tensor([0, 1])
    slices = {
        "x": torch.tensor([0, 3, 5]),
        "edge_index": torch.tensor([0, 4, 6]),
        "edge_attr": torch.tensor([0, 4, 6]),
        "y": torch.tensor([0, 2, 4]),
        "id": torch.tensor([0, 1, 2]),
    }
    torch.save((d, slices), path,
               _use_new_zipfile_serialization=not legacy)


@pytest.mark.parametrize("legacy", [True, False])
def test_import_chem_processed(tmp_path, legacy):
    from pretrain_gnns_tpu.compat import import_pyg

    pt = str(tmp_path / "geometric_data_processed.pt")
    _chem_fixture(pt, legacy)
    out = str(tmp_path / "processed_tpu")
    n = import_pyg.import_processed(pt, out, dataset_name="toy")
    assert n == 2
    graphs, _, meta = datasets.load_graphs(out)
    assert meta["num_tasks"] == 2 and meta["domain"] == "chem"
    np.testing.assert_array_equal(
        graphs[0].node_feat, [[5, 0], [7, 1], [5, 0]]
    )
    np.testing.assert_array_equal(
        graphs[0].edge_index, [[0, 1, 1, 2], [1, 0, 2, 1]]
    )
    np.testing.assert_array_equal(graphs[0].y, [1.0, -1.0])
    np.testing.assert_array_equal(graphs[1].node_feat, [[6, 0], [6, 2]])
    np.testing.assert_array_equal(graphs[1].edge_index, [[0, 1], [1, 0]])
    np.testing.assert_array_equal(graphs[1].y, [0.0, 1.0])
    np.testing.assert_array_equal(graphs[1].extras["mol_id"][0], [1])


def test_import_bio_processed(tmp_path):
    torch = pytest.importorskip("torch")
    from pretrain_gnns_tpu.compat import import_pyg

    Data = _fake_pyg_data_cls()
    d = Data()
    d.x = torch.ones(7, 1)
    d.edge_index = torch.tensor(
        [[0, 1, 1, 2, 0, 1, 2, 3], [1, 0, 2, 1, 1, 0, 3, 2]]
    )
    ea = torch.zeros(8, 9)
    ea[:, 0] = 1
    d.edge_attr = ea
    d.center_node_idx = torch.tensor([0, 1])
    d.species_id = torch.tensor([9606, 10090])
    d.go_target_downstream = torch.tensor([0.0, 1.0, 1.0, 0.0])
    d.go_target_pretrain = torch.tensor([1.0, 0.0, 0.0, 0.0, 0.0, 1.0])
    slices = {
        "x": torch.tensor([0, 3, 7]),
        "edge_index": torch.tensor([0, 4, 8]),
        "edge_attr": torch.tensor([0, 4, 8]),
        "center_node_idx": torch.tensor([0, 1, 2]),
        "species_id": torch.tensor([0, 1, 2]),
        "go_target_downstream": torch.tensor([0, 2, 4]),
        "go_target_pretrain": torch.tensor([0, 3, 6]),
    }
    pt = str(tmp_path / "geometric_data_processed.pt")
    torch.save((d, slices), pt, _use_new_zipfile_serialization=False)

    out = str(tmp_path / "processed_tpu")
    n = import_pyg.import_processed(pt, out, dataset_name="bio_supervised")
    assert n == 2
    graphs, _, meta = datasets.load_graphs(out)
    assert meta["domain"] == "bio" and meta["num_tasks"] == 2
    np.testing.assert_array_equal(graphs[0].y, [0.0, 1.0])
    np.testing.assert_array_equal(graphs[1].y, [1.0, 0.0])
    np.testing.assert_array_equal(graphs[0].extras["species_id"][0], [9606])
    np.testing.assert_array_equal(
        graphs[1].extras["center_node_idx"][0], [1]
    )
    np.testing.assert_array_equal(
        graphs[1].extras["go_target_pretrain"][0], [0.0, 0.0, 1.0]
    )
    # imported bio graphs drive the packed pipeline end to end
    from pretrain_gnns_tpu.data.packing import PackedLoader

    batch = next(iter(PackedLoader(
        graphs, 2, shuffle=False, extra_pad={"center_node_idx": 2}
    )))
    assert batch.node_feat.shape[-1] == 1


def test_smiles_csv_carry_over(tmp_path):
    from pretrain_gnns_tpu.compat import import_pyg

    pt = str(tmp_path / "p.pt")
    _chem_fixture(pt, legacy=True)
    csv = tmp_path / "smiles.csv"
    csv.write_text("CCO\nCC\n")
    out = str(tmp_path / "processed_tpu")
    import_pyg.import_processed(pt, out, smiles_csv=str(csv))
    assert open(os.path.join(out, "smiles.txt")).read().split() == [
        "CCO", "CC"
    ]
