"""Dataset storage & registry.

The reference persists processed datasets as torch-pickled PyG tensors
(``processed/geometric_data_processed.pt``, chem/loader.py:731-738). Here
processed datasets are flat npz shards: all per-node / per-edge / per-graph
arrays concatenated with offset vectors — directly memory-mappable, no
pickle, no torch. The offline featurizer (pretrain_gnns_tpu.data.featurize)
writes this format; loaders read it back into host ``Graph`` lists.

Layout of ``<root>/<name>/processed_tpu/data.npz``:
  node_feat [sumN, Fn], node_offsets [G+1]
  edge_index [2, sumE], edge_attr [sumE, Fe], edge_offsets [G+1]
  y [G, T] (optional)
  extra arrays as ``extra_<key>`` + ``extra_<key>_offsets`` (+ kind map in
  meta.json)
plus ``meta.json`` and optional ``scaffolds.txt`` (one per graph, for the
chem splitters) / ``smiles.txt`` (the reference's processed/smiles.csv).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from pretrain_gnns_tpu.core.graphs import GRAPH, Graph

# Reference downstream task counts (chem/finetune.py:125-144)
CHEM_NUM_TASKS = {
    "tox21": 12, "hiv": 1, "pcba": 128, "muv": 17, "bace": 1, "bbbp": 1,
    "toxcast": 617, "sider": 27, "clintox": 2, "mutag": 1, "ptc_mr": 1,
    "chembl_filtered": 1310,
}


def save_graphs(
    graphs: Sequence[Graph],
    directory: str,
    scaffolds: Optional[Sequence[str]] = None,
    smiles: Optional[Sequence[str]] = None,
    meta: Optional[Dict] = None,
) -> None:
    os.makedirs(directory, exist_ok=True)
    G = len(graphs)
    node_off = np.cumsum([0] + [g.num_nodes for g in graphs])
    edge_off = np.cumsum([0] + [g.num_edges for g in graphs])
    arrays = {
        "node_feat": np.concatenate([g.node_feat for g in graphs]),
        "node_offsets": node_off,
        "edge_index": np.concatenate(
            [g.edge_index for g in graphs], axis=1
        ),
        "edge_attr": np.concatenate([g.edge_feat for g in graphs]),
        "edge_offsets": edge_off,
    }
    if graphs[0].y is not None:
        arrays["y"] = np.stack([np.asarray(g.y) for g in graphs])

    extra_kinds: Dict[str, str] = {}
    keys = set()
    for g in graphs:
        keys.update(g.extras)
    for k in sorted(keys):
        vals = [np.asarray(g.extras[k][0]) for g in graphs]
        kind = graphs[0].extras[k][1]
        extra_kinds[k] = kind
        if kind == GRAPH:
            arrays[f"extra_{k}"] = np.stack(vals)
        else:
            arrays[f"extra_{k}"] = np.concatenate(vals)
            arrays[f"extra_{k}_offsets"] = np.cumsum(
                [0] + [len(v) for v in vals]
            )
    np.savez_compressed(os.path.join(directory, "data.npz"), **arrays)
    with open(os.path.join(directory, "meta.json"), "w") as f:
        json.dump(
            {"num_graphs": G, "extra_kinds": extra_kinds, **(meta or {})},
            f,
        )
    if scaffolds is not None:
        with open(os.path.join(directory, "scaffolds.txt"), "w") as f:
            f.write("\n".join(scaffolds))
    if smiles is not None:
        with open(os.path.join(directory, "smiles.txt"), "w") as f:
            f.write("\n".join(smiles))


def load_graphs(
    directory: str,
) -> Tuple[List[Graph], Optional[List[str]], Dict]:
    """Returns (graphs, scaffolds-or-None, meta)."""
    with open(os.path.join(directory, "meta.json")) as f:
        meta = json.load(f)
    z = np.load(os.path.join(directory, "data.npz"), allow_pickle=False)
    no, eo = z["node_offsets"], z["edge_offsets"]
    G = meta["num_graphs"]
    y = z["y"] if "y" in z else None
    kinds = meta.get("extra_kinds", {})
    graphs = []
    for i in range(G):
        g = Graph(
            node_feat=z["node_feat"][no[i]: no[i + 1]],
            edge_index=z["edge_index"][:, eo[i]: eo[i + 1]],
            edge_feat=z["edge_attr"][eo[i]: eo[i + 1]],
            y=y[i] if y is not None else None,
        )
        graphs.append(g)
    for k, kind in kinds.items():
        arr = z[f"extra_{k}"]
        if kind == GRAPH:
            for i, g in enumerate(graphs):
                g.extras[k] = (arr[i], kind)
        else:
            off = z[f"extra_{k}_offsets"]
            for i, g in enumerate(graphs):
                v = arr[off[i]: off[i + 1]]
                # node/edge index extras were stored graph-local already
                g.extras[k] = (v, kind)
    scaffolds = None
    spath = os.path.join(directory, "scaffolds.txt")
    if os.path.exists(spath):
        scaffolds = open(spath).read().split("\n")
    return graphs, scaffolds, meta


def merge_graph_datasets(
    graphs_1: Sequence[Graph], graphs_2: Sequence[Graph]
) -> List[Graph]:
    """Naively merge two labelled graph lists by zero-padding task vectors
    (reference ``merge_dataset_objs``, chem/loader.py:741-780: used to join
    chembl_with_labels [1310 tasks] with pcba_pretrain [128 tasks] into a
    1438-task supervised pretraining set). Keeps only the structural
    arrays + padded y, like the reference."""
    t1 = len(np.asarray(graphs_1[0].y).ravel())
    t2 = len(np.asarray(graphs_2[0].y).ravel())
    out: List[Graph] = []
    for g in graphs_1:
        y = np.concatenate(
            [np.asarray(g.y, np.float32).ravel(), np.zeros(t2, np.float32)]
        )
        out.append(Graph(g.node_feat, g.edge_index, g.edge_feat, y=y))
    for g in graphs_2:
        y = np.concatenate(
            [np.zeros(t1, np.float32), np.asarray(g.y, np.float32).ravel()]
        )
        out.append(Graph(g.node_feat, g.edge_index, g.edge_feat, y=y))
    return out


def processed_dir(root: str, name: str) -> str:
    return os.path.join(root, name, "processed_tpu")


def load_dataset(
    name: str,
    root: str = "dataset",
    n_synthetic: int = 2000,
    seed: int = 0,
) -> Tuple[List[Graph], Optional[List[str]], Dict]:
    """Dataset registry: real processed datasets from disk, or synthetic
    stand-ins (``synthetic`` / ``synthetic_bio``) when raw data + RDKit are
    unavailable in the environment."""
    if name == "synthetic":
        from pretrain_gnns_tpu.data.synthetic import molecule_dataset

        graphs, scaffolds = molecule_dataset(
            n_synthetic, num_tasks=2, seed=seed
        )
        return graphs, scaffolds, {"num_tasks": 2}
    if name == "synthetic_bio":
        from pretrain_gnns_tpu.data.synthetic import bio_dataset

        graphs = bio_dataset(max(n_synthetic // 4, 64), seed=seed)
        return graphs, None, {"num_tasks": 40}
    d = processed_dir(root, name)
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"{d} not found — run the offline featurizer first: "
            f"python -m pretrain_gnns_tpu.cli.featurize --dataset {name} "
            f"--root {root} (requires RDKit + raw downloads)"
        )
    graphs, scaffolds, meta = load_graphs(d)
    meta.setdefault("num_tasks", CHEM_NUM_TASKS.get(name))
    return graphs, scaffolds, meta
