"""Synthetic molecule-like datasets.

Real MoleculeNet/ZINC data requires the offline RDKit featurizer
(pretrain_gnns_tpu.data.featurize) plus raw downloads that this environment
does not ship. These generators produce graphs with the exact tensor schema
of the reference featurization (chem/loader.py:53-100: int64 ``x[N,2]`` with
atom-type/chirality indices, both-direction edge pairs, int64
``edge_attr[E,2]`` bond-type/direction) and learnable labels, so every
training path can be exercised end-to-end and benchmarked at realistic
shapes (ZINC molecules average ~23 heavy atoms).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from pretrain_gnns_tpu.core.graphs import Graph


def random_molecule(
    rng: np.random.Generator, n_atoms: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random connected chain-plus-chords graph in reference schema."""
    bonds = [(i, i + 1) for i in range(n_atoms - 1)]
    seen = set(bonds)
    for _ in range(max(0, n_atoms // 3 - 1)):
        a, b = (int(v) for v in rng.integers(0, n_atoms, 2))
        if a != b and (a, b) not in seen and (b, a) not in seen:
            bonds.append((a, b))
            seen.add((a, b))
    ei, ea = [], []
    for a, b in bonds:
        t, d = int(rng.integers(0, 4)), int(rng.integers(0, 3))
        ei += [(a, b), (b, a)]
        ea += [(t, d), (t, d)]
    x = np.stack(
        [rng.integers(0, 119, n_atoms), rng.integers(0, 3, n_atoms)], axis=1
    ).astype(np.int64)
    edge_index = (
        np.array(ei, np.int64).T if ei else np.zeros((2, 0), np.int64)
    )
    edge_attr = np.array(ea, np.int64) if ea else np.zeros((0, 2), np.int64)
    return x, edge_index, edge_attr


def random_ego_network(
    rng: np.random.Generator, n_nodes: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Random ego-network in the bio schema (bio/loader.py:15-142):
    x = ones(N, 1) float; 9-dim float edge features
    [w1..w7 binary evidence, self_loop=0, mask=0]; node 0 is the center and
    every node is reachable from it (ego ball)."""
    center = 0
    edges = set()
    for v in range(1, n_nodes):
        # attach to a random earlier node: connected, scale-free-ish
        u = int(rng.integers(0, v))
        edges.add((u, v))
    extra = n_nodes // 2
    for _ in range(extra):
        a, b = (int(z) for z in rng.integers(0, n_nodes, 2))
        if a != b and (a, b) not in edges and (b, a) not in edges:
            edges.add((a, b))
    ei, ea = [], []
    for a, b in sorted(edges):
        w = (rng.random(7) < 0.3).astype(np.float32)
        feat = np.concatenate([w, [0.0, 0.0]]).astype(np.float32)
        ei += [(a, b), (b, a)]
        ea += [feat, feat]
    x = np.ones((n_nodes, 1), np.float32)
    return (
        x,
        np.array(ei, np.int64).T,
        np.stack(ea),
        center,
    )


def bio_dataset(
    n_graphs: int,
    num_downstream: int = 40,
    num_pretrain: int = 60,
    seed: int = 0,
    mean_nodes: int = 60,
    species_pool=(3702, 6239, 511145, 7227, 10090, 4932, 7955, 9606),
) -> List[Graph]:
    """Synthetic PPI ego-networks with center_node_idx, species_id,
    go_target_downstream ({0,1}, the ``y``) and go_target_pretrain extras
    (bio/loader.py:92-115). Downstream labels carry signal from evidence-
    channel counts so bio fine-tuning is learnable."""
    from pretrain_gnns_tpu.core.graphs import GRAPH, NODE_IDX

    rng = np.random.default_rng(seed)
    raw = []
    for i in range(n_graphs):
        n = max(8, int(rng.normal(mean_nodes, mean_nodes // 4)))
        raw.append(random_ego_network(rng, min(n, 400)))

    ev_counts = np.stack(
        [
            [ea[:, t % 7].sum() / max(ea.shape[0], 1)
             for t in range(num_downstream)]
            for (_, _, ea, _) in raw
        ]
    )
    med = np.median(ev_counts, axis=0)
    y_down = (ev_counts > med).astype(np.float32)

    graphs = []
    for i, (x, ei, ea, center) in enumerate(raw):
        g = Graph(x, ei, ea, y=y_down[i])
        g.extras["center_node_idx"] = (
            np.array([center], np.int64), NODE_IDX
        )
        g.extras["species_id"] = (
            np.array([species_pool[i % len(species_pool)]], np.int64), GRAPH
        )
        g.extras["go_target_pretrain"] = (
            (rng.random(num_pretrain) < 0.1).astype(np.float32), GRAPH
        )
        graphs.append(g)
    return graphs


def molecule_dataset(
    n_graphs: int,
    num_tasks: int = 1,
    seed: int = 0,
    mean_atoms: int = 23,
    missing_frac: float = 0.0,
) -> Tuple[List[Graph], List[str]]:
    """Labeled synthetic dataset in the reference's {-1, 0, +1} label coding
    (0 = missing, chem/loader.py:941-944). Labels carry real signal: task t
    is positive iff the count of atoms with (atom_type %% 7 == t %% 7)
    exceeds its median, so a GNN can learn it. Returns (graphs,
    pseudo-scaffold strings) — scaffold = coarse size/ring fingerprint, so
    scaffold splits exercise grouping logic without RDKit."""
    rng = np.random.default_rng(seed)
    raw = []
    for _ in range(n_graphs):
        n = max(4, int(rng.normal(mean_atoms, 6)))
        raw.append(random_molecule(rng, min(n, 60)))

    counts = np.stack(
        [
            [(x[:, 0] % 7 == t % 7).sum() for t in range(num_tasks)]
            for (x, _, _) in raw
        ]
    )  # [G, T]
    med = np.median(counts, axis=0)
    labels = np.where(counts > med, 1.0, -1.0)
    if missing_frac > 0:
        drop = rng.random(labels.shape) < missing_frac
        labels = np.where(drop, 0.0, labels)

    graphs, scaffolds = [], []
    for (x, ei, ea), y in zip(raw, labels):
        graphs.append(Graph(x, ei, ea, y=y.astype(np.float32)))
        n_extra = ei.shape[1] // 2 - (x.shape[0] - 1)
        scaffolds.append(f"s{x.shape[0] // 6}_{n_extra // 2}")
    return graphs, scaffolds
