"""Torch-free importer for the reference's processed PyG dataset files.

The reference persists every dataset as
``processed/geometric_data_processed.pt`` — a ``torch.save`` of
``(data, slices)`` where ``data`` is one ``torch_geometric.data.Data`` with
all graphs' tensors concatenated and ``slices`` maps each key to a
``[G+1]`` boundary vector (chem/loader.py:731-738; PyG 1.0.3
``InMemoryDataset.collate``). For the bio domain this file is the ONLY
ingestion path — ``BioDataset.process()`` raises by design
(bio/loader.py:193-194) and the data ships pre-processed.

This module parses that file with the allow-list unpickler from
``torch_reader`` (PyG's ``Data`` class is replaced by an inert attribute
bag — none of its code runs) and converts it into this framework's npz
shard format, so a user migrating from the reference can reuse their
existing processed datasets directly:

    python -m pretrain_gnns_tpu.cli.featurize \
        --import_pyg dataset/tox21/processed/geometric_data_processed.pt \
        --dataset tox21

Key facts about the stored layout this relies on (verified against PyG
1.0.3 semantics): tensors are concatenated WITHOUT index offsetting
(offsets are a ``Batch.from_data_list``-time concern only); ``edge_index``
is concatenated along dim -1, everything else along dim 0; per-graph 1-D
labels (``y``, ``go_target_*``) therefore land flattened as ``[G*T]``.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from pretrain_gnns_tpu.compat.torch_reader import (
    ObjStub,
    load_torch_checkpoint,
)
from pretrain_gnns_tpu.core.graphs import GRAPH, NODE_IDX, Graph

# PyG class paths that may appear in processed files across the 1.x line.
PYG_STUBS = {
    ("torch_geometric.data.data", "Data"): ObjStub,
    ("torch_geometric.data", "Data"): ObjStub,
    ("torch_geometric.data.in_memory_dataset", "InMemoryDataset"): ObjStub,
}


def load_pyg_processed(
    path: str,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """-> (key -> concatenated array, key -> [G+1] slice boundaries)."""
    obj = load_torch_checkpoint(path, extra_classes=PYG_STUBS)
    data, slices = obj
    arrays = {
        k: v for k, v in data.__dict__.items()
        if isinstance(v, np.ndarray)
    }
    bounds = {k: np.asarray(v).ravel() for k, v in slices.items()}
    return arrays, bounds


def _per_graph(arrays, bounds, key, i):
    s, e = int(bounds[key][i]), int(bounds[key][i + 1])
    if key == "edge_index":  # cat_dim=-1 (PyG Data.cat_dim for indices)
        return arrays[key][:, s:e]
    return arrays[key][s:e]


def pyg_to_graphs(
    arrays: Dict[str, np.ndarray],
    bounds: Dict[str, np.ndarray],
) -> Tuple[list, int, str]:
    """Slice the collated tensors back into per-graph ``Graph`` objects.

    Returns (graphs, num_tasks, domain) with domain inferred from the keys:
    ``center_node_idx`` present -> bio (bio/loader.py:50-51), else chem.
    """
    G = len(next(iter(bounds.values()))) - 1
    domain = "bio" if "center_node_idx" in arrays else "chem"
    label_key = "go_target_downstream" if domain == "bio" else "y"

    graphs = []
    num_tasks = 0
    for i in range(G):
        g = Graph(
            node_feat=_per_graph(arrays, bounds, "x", i),
            edge_index=_per_graph(arrays, bounds, "edge_index", i).astype(
                np.int64
            ),
            edge_feat=_per_graph(arrays, bounds, "edge_attr", i),
        )
        if label_key in arrays:
            y = _per_graph(arrays, bounds, label_key, i)
            g.y = np.asarray(y, np.float32)
            num_tasks = max(num_tasks, len(g.y))
        if "center_node_idx" in arrays:
            g.extras["center_node_idx"] = (
                _per_graph(arrays, bounds, "center_node_idx", i).astype(
                    np.int64
                ),
                NODE_IDX,
            )
        if "species_id" in arrays:
            g.extras["species_id"] = (
                _per_graph(arrays, bounds, "species_id", i).astype(np.int64),
                GRAPH,
            )
        if "go_target_pretrain" in arrays:
            g.extras["go_target_pretrain"] = (
                np.asarray(
                    _per_graph(arrays, bounds, "go_target_pretrain", i),
                    np.float32,
                ),
                GRAPH,
            )
        if "id" in arrays:
            g.extras["mol_id"] = (
                _per_graph(arrays, bounds, "id", i).astype(np.int64), GRAPH
            )
        graphs.append(g)
    return graphs, num_tasks, domain


def import_processed(
    path: str,
    out_dir: str,
    dataset_name: str = "imported",
    smiles_csv: Optional[str] = None,
) -> int:
    """Convert a reference processed ``.pt`` into ``<out_dir>/data.npz``.

    ``smiles_csv``: the reference's sibling ``processed/smiles.csv``
    (chem/loader.py:734-738) — when given, smiles (and Murcko scaffolds if
    RDKit is available) are carried over so scaffold splits work.
    """
    from pretrain_gnns_tpu.data import datasets

    arrays, bounds = load_pyg_processed(path)
    graphs, num_tasks, domain = pyg_to_graphs(arrays, bounds)

    smiles = scaffolds = None
    if smiles_csv is not None:
        with open(smiles_csv) as f:
            smiles = [ln.strip() for ln in f if ln.strip()]
        if len(smiles) != len(graphs):
            raise ValueError(
                f"smiles.csv has {len(smiles)} rows for {len(graphs)} graphs"
            )
        try:
            from pretrain_gnns_tpu.data.featurize import generate_scaffold

            scaffolds = [generate_scaffold(s) for s in smiles]
        except ImportError:  # RDKit absent: import still works, random/
            scaffolds = None  # species splits remain available

    os.makedirs(out_dir, exist_ok=True)
    datasets.save_graphs(
        graphs, out_dir, scaffolds=scaffolds, smiles=smiles,
        meta={
            "num_tasks": num_tasks,
            "dataset": dataset_name,
            "domain": domain,
            "imported_from": os.path.abspath(path),
        },
    )
    return len(graphs)
