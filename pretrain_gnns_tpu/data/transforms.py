"""Per-sample SSL transforms (reference L1 layer) as numpy ops on host graphs.

Re-implements chem/util.py (and the bio analogues in bio/util.py) without
networkx: k-hop balls come from CSR frontier expansion. Transforms run inside
``PackedLoader`` at iteration time, mirroring the reference's
dataset.transform-in-DataLoader-worker placement (SURVEY.md §1).

Each transform takes (Graph, np.random.Generator) and returns a new Graph
(inputs are never mutated — the reference mutates shared Data objects
in-place, a bug-prone behavior we deliberately drop).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from pretrain_gnns_tpu.core.graphs import (
    EDGE_IDX, Graph, NODE_IDX, RAW,
)


class MaskAtom:
    """chem/util.py:189-277. Samples int(N * rate + 1) distinct atoms,
    records original features as labels, overwrites x with the mask token
    [num_atom_type, 0]; optionally masks all incident bonds (labels from
    every 2nd index = undirected dedup; both directions overwritten with
    [num_edge_type, 0])."""

    def __init__(self, num_atom_type: int = 119, num_edge_type: int = 5,
                 mask_rate: float = 0.15, mask_edge: bool = True):
        self.num_atom_type = num_atom_type
        self.num_edge_type = num_edge_type
        self.mask_rate = mask_rate
        self.mask_edge = mask_edge

    def __call__(self, g: Graph, rng: np.random.Generator,
                 masked_atom_indices: Optional[np.ndarray] = None) -> Graph:
        n = g.num_nodes
        if masked_atom_indices is None:
            k = int(n * self.mask_rate + 1)
            masked_atom_indices = rng.choice(n, size=min(k, n),
                                             replace=False)
        masked_atom_indices = np.asarray(masked_atom_indices, np.int64)

        x = g.node_feat.copy()
        labels = x[masked_atom_indices].copy()
        x[masked_atom_indices] = [self.num_atom_type, 0]

        extras = dict(g.extras)
        extras["masked_atom_indices"] = (masked_atom_indices, NODE_IDX)
        extras["mask_node_label"] = (labels, RAW)

        ea = g.edge_feat
        if self.mask_edge:
            ea = ea.copy()
            inc = np.isin(g.edge_index[0], masked_atom_indices) | np.isin(
                g.edge_index[1], masked_atom_indices
            )
            connected = np.where(inc)[0]  # edge order preserved
            extras["mask_edge_label"] = (ea[connected[::2]].copy(), RAW)
            ea[connected] = [self.num_edge_type, 0]
            extras["connected_edge_indices"] = (
                connected[::2].astype(np.int64), EDGE_IDX
            )
        return dataclasses.replace(g, node_feat=x, edge_feat=ea,
                                   extras=extras)


class NegativeEdge:
    """chem/util.py:22-52 == bio/util.py:16-44: draw 5E uniform node pairs,
    keep the first E/2 that are not existing directed edges, duplicates, or
    self-loops. Stored as ``negative_edges`` [K, 2] (row-per-edge so packing
    offsets apply)."""

    def __call__(self, g: Graph, rng: np.random.Generator) -> Graph:
        n, e = g.num_nodes, g.num_edges
        existing = set(
            zip(g.edge_index[0].tolist(), g.edge_index[1].tolist())
        )
        cand = rng.integers(0, n, size=(5 * e, 2))
        picked: List[Tuple[int, int]] = []
        seen = set()
        want = e // 2
        for a, b in cand:
            a, b = int(a), int(b)
            if a == b or (a, b) in existing or (a, b) in seen:
                continue
            seen.add((a, b))
            picked.append((a, b))
            if len(picked) == want:
                break
        neg = (
            np.array(picked, np.int64)
            if picked
            else np.zeros((0, 2), np.int64)
        )
        extras = dict(g.extras)
        extras["negative_edges"] = (neg, NODE_IDX)
        return dataclasses.replace(g, extras=extras)


def k_hop_nodes(edge_index: np.ndarray, num_nodes: int, root: int,
                k: int) -> np.ndarray:
    """Nodes within k hops of root (inclusive), via CSR frontier expansion —
    replaces nx.single_source_shortest_path_length (chem/util.py:103-105).
    k < 0 returns empty (the reference's k=0 -> -1 quirk, chem/util.py:73-78).
    """
    if k < 0:
        return np.zeros(0, np.int64)
    visited = np.zeros(num_nodes, bool)
    visited[root] = True
    frontier = np.array([root], np.int64)
    recv, send = edge_index[0], edge_index[1]
    for _ in range(k):
        if frontier.size == 0:
            break
        sel = np.isin(send, frontier)
        nxt = np.unique(recv[sel])
        nxt = nxt[~visited[nxt]]
        visited[nxt] = True
        frontier = nxt
    return np.where(visited)[0]


def induced_subgraph(g: Graph, nodes: np.ndarray) -> Tuple[Graph, np.ndarray]:
    """Induced subgraph on ``nodes`` (kept in ascending order, matching the
    reference's nx subgraph + reset_idxes relabeling, chem/util.py:175-185).
    Returns (subgraph, old->new map array with -1 for absent)."""
    nodes = np.sort(np.asarray(nodes, np.int64))
    remap = np.full(g.num_nodes, -1, np.int64)
    remap[nodes] = np.arange(nodes.size)
    keep = (remap[g.edge_index[0]] >= 0) & (remap[g.edge_index[1]] >= 0)
    ei = remap[g.edge_index[:, keep]]
    return (
        Graph(
            node_feat=g.node_feat[nodes].copy(),
            edge_index=ei,
            edge_feat=g.edge_feat[keep].copy(),
        ),
        remap,
    )


@dataclasses.dataclass
class SubstructContextPair:
    """Output of context extraction: two independent graphs plus alignment
    indices (reference attributes, chem/util.py:86-94)."""

    substruct: Graph  # with extras["center_substruct_idx"]
    context: Graph  # with extras["overlap_context_substruct_idx"]


class MaskEdge:
    """bio/util.py:46-104: sample int(E_undirected * rate + 1) undirected
    edges (even indices = first direction of each pair); record original
    9-dim features; overwrite BOTH directions with the mask feature
    [0,...,0,1] (mask flag at dim 8)."""

    def __init__(self, mask_rate: float = 0.15):
        self.mask_rate = mask_rate

    def __call__(self, g: Graph, rng: np.random.Generator,
                 masked_edge_indices: Optional[np.ndarray] = None) -> Graph:
        if masked_edge_indices is None:
            num_undirected = g.num_edges // 2
            k = int(num_undirected * self.mask_rate + 1)
            picks = rng.choice(num_undirected, size=min(k, num_undirected),
                               replace=False)
            masked_edge_indices = 2 * picks
        masked_edge_indices = np.asarray(masked_edge_indices, np.int64)

        ea = g.edge_feat.copy()
        labels = ea[masked_edge_indices].copy()
        both = np.concatenate([masked_edge_indices,
                               masked_edge_indices + 1])
        mask_feat = np.zeros(ea.shape[1], ea.dtype)
        mask_feat[-1] = 1
        ea[both] = mask_feat

        extras = dict(g.extras)
        extras["masked_edge_idx"] = (masked_edge_indices, EDGE_IDX)
        extras["mask_edge_label"] = (labels, RAW)
        return dataclasses.replace(g, edge_feat=ea, extras=extras)


class ExtractSubstructureContextPair:
    """chem/util.py:55-172: substruct = k-hop ball around a random root;
    context = annulus between l1 and l2 hops; overlap = substruct ∩ context
    in context-local indices. Returns None when either region is empty
    (such samples are skipped at batch time, chem/batch.py:167-169)."""

    def __init__(self, k: int, l1: int, l2: int):
        self.k, self.l1, self.l2 = k, l1, l2

    def __call__(self, g: Graph,
                 rng: np.random.Generator,
                 root_idx: Optional[int] = None
                 ) -> Optional[SubstructContextPair]:
        n = g.num_nodes
        if root_idx is None:
            root_idx = int(rng.integers(0, n))

        sub_nodes = k_hop_nodes(g.edge_index, n, root_idx, self.k)
        l1_nodes = k_hop_nodes(g.edge_index, n, root_idx, self.l1)
        l2_nodes = k_hop_nodes(g.edge_index, n, root_idx, self.l2)
        ctx_nodes = np.setdiff1d(
            np.union1d(l1_nodes, l2_nodes),
            np.intersect1d(l1_nodes, l2_nodes),
        )  # symmetric difference (chem/util.py:125-126)
        if sub_nodes.size == 0 or ctx_nodes.size == 0:
            return None

        substruct, sub_map = induced_subgraph(g, sub_nodes)
        substruct.extras["center_substruct_idx"] = (
            np.array([sub_map[root_idx]], np.int64), NODE_IDX,
        )

        overlap = np.intersect1d(ctx_nodes, sub_nodes)
        if overlap.size == 0:
            return None
        context, ctx_map = induced_subgraph(g, ctx_nodes)
        context.extras["overlap_context_substruct_idx"] = (
            ctx_map[overlap].astype(np.int64), NODE_IDX,
        )
        return SubstructContextPair(substruct, context)


class BioExtractSubstructureContextPair:
    """bio/util.py:123-209: substruct = the WHOLE ego-network (center node =
    the graph's ``center_node_idx`` extra, or random when center=False);
    context = nodes strictly outside the l1-ball around the root; overlap =
    the whole context set (substruct is everything)."""

    def __init__(self, l1: int, center: bool = True):
        self.l1 = -1 if l1 == 0 else l1
        self.center = center

    def __call__(self, g: Graph, rng: np.random.Generator,
                 root_idx: Optional[int] = None
                 ) -> Optional[SubstructContextPair]:
        n = g.num_nodes
        if root_idx is None:
            if self.center:
                root_idx = int(np.asarray(g.extras["center_node_idx"][0])[0])
            else:
                root_idx = int(rng.integers(0, n))

        substruct = Graph(
            node_feat=g.node_feat.copy(),
            edge_index=g.edge_index.copy(),
            edge_feat=g.edge_feat.copy(),
        )
        substruct.extras["center_substruct_idx"] = (
            np.asarray(g.extras["center_node_idx"][0], np.int64).reshape(1),
            NODE_IDX,
        )

        l1_nodes = k_hop_nodes(g.edge_index, n, root_idx, self.l1)
        ctx_nodes = np.setdiff1d(np.arange(n), l1_nodes)
        if ctx_nodes.size == 0:
            return None
        context, ctx_map = induced_subgraph(g, ctx_nodes)
        context.extras["overlap_context_substruct_idx"] = (
            ctx_map[ctx_nodes].astype(np.int64), NODE_IDX,
        )
        return SubstructContextPair(substruct, context)
