"""Static-shape packed graph batches — the TPU-native replacement for PyG batching.

The reference (snap-stanford/pretrain-gnns) batches variable-size graphs by
concatenating them into one dynamically-shaped "disconnected mega-graph" with
cumulative index offsets (reference: chem/batch.py:4-228, bio/batch.py:4-283).
Dynamic shapes force XLA recompiles, so here a batch is packed into fixed-size
padded buffers:

- nodes of all graphs are concatenated into ``[max_nodes]`` rows,
- edges into ``[max_edges]`` rows of (sender, receiver) index pairs,
- a ``node_graph`` segment-id vector maps nodes to their graph slot
  (the reference's ``batch`` vector, chem/batch.py:39-41),
- boolean validity masks mark live nodes/edges/graphs.

Padding convention (load-bearing for every kernel downstream):
- padded node rows have ``node_graph == 0`` and ``node_mask == False``;
- padded edge rows have ``senders == receivers == 0`` and
  ``edge_mask == False``;
- all indices are therefore always in-range — kernels mask *contributions*
  (multiply by 0, or use -inf for max/softmax) instead of relying on
  out-of-bounds scatter-drop semantics.

Edge direction convention matches the reference: a message flows from
``senders`` (= reference ``edge_index[1]``, PyG's ``x_j``) and is aggregated
into ``receivers`` (= reference ``edge_index[0]``); reference graphs store
each undirected bond as two consecutive directed edges (chem/loader.py:81-96),
which the offline featurizer here reproduces.

Self-loops are NOT materialized: the reference appends (i, i) edges with a
synthetic feature inside every conv layer (chem/model.py:39-45); our conv
layers compute the self-loop contribution analytically (pure elementwise work,
no scatter), which is both exactly equivalent for sum/mean/softmax
aggregation and much cheaper on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# ---------------------------------------------------------------------------
# Extra-field kinds: how packing must treat auxiliary per-graph arrays
# (the reference's cumsum bookkeeping, chem/batch.py:27-33).
# ---------------------------------------------------------------------------
NODE_IDX = "node_idx"  # values are node indices -> offset by node cumsum
EDGE_IDX = "edge_idx"  # values are edge indices -> offset by edge cumsum
NODE_ROW = "node_row"  # one row per node -> concatenated alongside node_feat
EDGE_ROW = "edge_row"  # one row per edge -> concatenated alongside edge_feat
GRAPH = "graph"  # one row per graph -> stacked at graph slots
RAW = "raw"  # concatenated without offsetting


@dataclasses.dataclass
class Graph:
    """Host-side (numpy) single graph, the analogue of a PyG ``Data`` object.

    ``edge_index`` is ``[2, E]`` with row 0 = aggregation target (receiver)
    and row 1 = message source (sender), matching the reference convention
    (see module docstring).
    """

    node_feat: np.ndarray  # [N, Fn]
    edge_index: np.ndarray  # [2, E] int
    edge_feat: np.ndarray  # [E, Fe]
    y: Optional[np.ndarray] = None  # [T] graph-level labels
    extras: Dict[str, Tuple[np.ndarray, str]] = dataclasses.field(
        default_factory=dict
    )  # name -> (array, kind)

    @property
    def num_nodes(self) -> int:
        return int(self.node_feat.shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])


@struct.dataclass
class PackedGraphs:
    """Fixed-shape batch of graphs (a JAX pytree; all leaves are arrays)."""

    node_feat: jnp.ndarray  # [N_pad, Fn]
    edge_feat: jnp.ndarray  # [E_pad, Fe]
    senders: jnp.ndarray  # [E_pad] int32 — message source (x_j)
    receivers: jnp.ndarray  # [E_pad] int32 — aggregation target
    node_graph: jnp.ndarray  # [N_pad] int32 — graph slot per node
    node_mask: jnp.ndarray  # [N_pad] bool
    edge_mask: jnp.ndarray  # [E_pad] bool
    graph_mask: jnp.ndarray  # [G_pad] bool
    y: Optional[jnp.ndarray] = None  # [G_pad, T]
    extras: Dict[str, jnp.ndarray] = struct.field(default_factory=dict)
    # Block-diagonal layout metadata (static, set by pack_graphs_blocked):
    # when block_nodes > 0, node rows are partitioned into blocks of
    # ``block_nodes`` and edge slots into blocks of ``block_edges`` such
    # that every edge in edge-block b has BOTH endpoints in node-block b
    # (graphs never straddle blocks). This is the layout the Pallas
    # one-hot-matmul SpMM kernel requires (ops/pallas_spmm.py).
    block_nodes: int = struct.field(pytree_node=False, default=0)
    block_edges: int = struct.field(pytree_node=False, default=0)

    # -- static shape helpers (python ints, safe under jit) -----------------
    @property
    def max_nodes(self) -> int:
        return self.node_feat.shape[0]

    @property
    def max_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def max_graphs(self) -> int:
        return self.graph_mask.shape[0]

    # -- traced helpers -----------------------------------------------------
    def nodes_per_graph(self) -> jnp.ndarray:
        """[G_pad] number of valid nodes per graph slot."""
        return jax.ops.segment_sum(
            self.node_mask.astype(jnp.int32), self.node_graph,
            num_segments=self.max_graphs,
        )

    def in_degree(self, include_self_loop: bool = False) -> jnp.ndarray:
        """[N_pad] count of valid incoming edges per node (receiver side)."""
        deg = jax.ops.segment_sum(
            self.edge_mask.astype(jnp.int32), self.receivers,
            num_segments=self.max_nodes,
        )
        if include_self_loop:
            deg = deg + self.node_mask.astype(jnp.int32)
        return deg


def _pad_rows(a: np.ndarray, n: int, fill=0) -> np.ndarray:
    """Pad/truncate-check array ``a`` to ``n`` rows along axis 0."""
    if a.shape[0] > n:
        raise ValueError(f"cannot pack {a.shape[0]} rows into {n}")
    pad = np.full((n - a.shape[0],) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


def pack_graphs(
    graphs: Sequence[Graph],
    max_nodes: int,
    max_edges: int,
    max_graphs: Optional[int] = None,
    extra_pad: Optional[Mapping[str, int]] = None,
    np_out: bool = False,
) -> PackedGraphs:
    """Pack a list of host graphs into one fixed-shape :class:`PackedGraphs`.

    This subsumes the reference's ``Batch*.from_data_list`` family
    (chem/batch.py:16-52 and siblings): cumulative node/edge offsets are
    applied to ``edge_index`` and to every extra field whose kind is
    ``NODE_IDX``/``EDGE_IDX``. Each extra key ``k`` yields ``extras[k]``
    plus a companion mask ``extras[k + "_mask"]``.

    Args:
      graphs: host graphs; total nodes/edges must fit the padded sizes.
      max_nodes/max_edges: static buffer sizes.
      max_graphs: static batch size (default ``len(graphs)``).
      extra_pad: padded length per extra key (required for keys whose length
        is not per-node/per-edge/per-graph).
      np_out: return numpy leaves (for host pipelines) instead of jnp.
    """
    if max_graphs is None:
        max_graphs = len(graphs)
    if len(graphs) > max_graphs:
        raise ValueError(f"{len(graphs)} graphs > max_graphs={max_graphs}")
    if not graphs:
        raise ValueError("cannot pack an empty list of graphs")

    n_tot = sum(g.num_nodes for g in graphs)
    e_tot = sum(g.num_edges for g in graphs)
    if n_tot > max_nodes or e_tot > max_edges:
        raise ValueError(
            f"batch has {n_tot} nodes / {e_tot} edges; buffers are "
            f"{max_nodes} / {max_edges}"
        )

    node_feat = _pad_rows(
        np.concatenate([g.node_feat for g in graphs], axis=0), max_nodes
    )
    edge_feat = _pad_rows(
        np.concatenate([g.edge_feat for g in graphs], axis=0), max_edges
    )

    node_off = np.cumsum([0] + [g.num_nodes for g in graphs])
    edge_off = np.cumsum([0] + [g.num_edges for g in graphs])

    ei = np.concatenate(
        [g.edge_index + node_off[i] for i, g in enumerate(graphs)], axis=1
    ).astype(np.int32)
    receivers = _pad_rows(ei[0], max_edges)
    senders = _pad_rows(ei[1], max_edges)

    node_graph = _pad_rows(
        np.concatenate(
            [np.full(g.num_nodes, i, np.int32) for i, g in enumerate(graphs)]
        ),
        max_nodes,
    )
    node_mask = np.zeros(max_nodes, bool)
    node_mask[:n_tot] = True
    edge_mask = np.zeros(max_edges, bool)
    edge_mask[:e_tot] = True
    graph_mask = np.zeros(max_graphs, bool)
    graph_mask[: len(graphs)] = True

    y = None
    if graphs[0].y is not None:
        ys = np.stack([np.asarray(g.y) for g in graphs], axis=0)
        y = _pad_rows(ys, max_graphs)

    extras: Dict[str, np.ndarray] = {}
    keys = set()
    for g in graphs:
        keys.update(g.extras.keys())
    for k in sorted(keys):
        kinds = {g.extras[k][1] for g in graphs if k in g.extras}
        if len(kinds) != 1:
            raise ValueError(f"extra {k!r} has inconsistent kinds {kinds}")
        kind = kinds.pop()
        parts = []
        for i, g in enumerate(graphs):
            if k not in g.extras:
                continue
            a = np.asarray(g.extras[k][0])
            if kind == NODE_IDX:
                a = a.astype(np.int32) + node_off[i]
            elif kind == EDGE_IDX:
                a = a.astype(np.int32) + edge_off[i]
            parts.append(a)
        cat = (
            np.stack(parts, axis=0)
            if kind == GRAPH
            else np.concatenate(parts, axis=0)
        )
        if kind == NODE_ROW:
            pad_n = max_nodes
        elif kind == EDGE_ROW:
            pad_n = max_edges
        elif kind == GRAPH:
            pad_n = max_graphs
        elif extra_pad is not None and k in extra_pad:
            pad_n = extra_pad[k]
        else:
            raise ValueError(
                f"extra {k!r} of kind {kind!r} needs an extra_pad entry"
            )
        mask = np.zeros(pad_n, bool)
        mask[: cat.shape[0]] = True
        extras[k] = _pad_rows(cat, pad_n)
        extras[k + "_mask"] = mask

    out = PackedGraphs(
        node_feat=node_feat,
        edge_feat=edge_feat,
        senders=senders,
        receivers=receivers,
        node_graph=node_graph,
        node_mask=node_mask,
        edge_mask=edge_mask,
        graph_mask=graph_mask,
        y=y,
        extras=extras,
    )
    if np_out:
        return out
    return jax.tree_util.tree_map(jnp.asarray, out)


def pack_graphs_blocked(
    graphs: Sequence[Graph],
    n_blocks: int,
    block_nodes: int = 256,
    block_edges: int = 768,
    max_graphs: Optional[int] = None,
    extra_pad: Optional[Mapping[str, int]] = None,
    np_out: bool = False,
) -> PackedGraphs:
    """Pack graphs into a block-diagonal layout (see PackedGraphs fields).

    Graphs are first-fit into ``n_blocks`` blocks of (block_nodes,
    block_edges) capacity; within a block, node rows and edge slots are
    contiguous and padded to the block boundary, so every edge slot in
    block b references node rows in [b*block_nodes, (b+1)*block_nodes).
    Semantically identical to :func:`pack_graphs` (same masks/ids), just a
    different row ordering with per-block padding.
    """
    if max_graphs is None:
        max_graphs = len(graphs)
    # first-fit into blocks; graph SLOTS stay in input order (same contract
    # as pack_graphs and the C++ packer: y[i] belongs to graphs[i])
    n_cursor = np.zeros(len(graphs), int)
    e_cursor = np.zeros(len(graphs), int)
    fill_n = np.zeros(n_blocks, int)
    fill_e = np.zeros(n_blocks, int)
    for i, g in enumerate(graphs):
        if g.num_nodes > block_nodes or g.num_edges > block_edges:
            raise ValueError(
                f"graph ({g.num_nodes}n/{g.num_edges}e) exceeds block "
                f"capacity ({block_nodes}/{block_edges})"
            )
        for b in range(n_blocks):
            if (
                fill_n[b] + g.num_nodes <= block_nodes
                and fill_e[b] + g.num_edges <= block_edges
            ):
                n_cursor[i] = b * block_nodes + fill_n[b]
                e_cursor[i] = b * block_edges + fill_e[b]
                fill_n[b] += g.num_nodes
                fill_e[b] += g.num_edges
                break
        else:
            raise ValueError("graphs do not fit the requested blocks")

    max_nodes = n_blocks * block_nodes
    max_edges = n_blocks * block_edges
    fn = graphs[0].node_feat.shape[1:]
    fe = graphs[0].edge_feat.shape[1:]
    node_feat = np.zeros((max_nodes,) + fn, graphs[0].node_feat.dtype)
    edge_feat = np.zeros((max_edges,) + fe, graphs[0].edge_feat.dtype)
    senders = np.zeros(max_edges, np.int32)
    receivers = np.zeros(max_edges, np.int32)
    node_graph = np.zeros(max_nodes, np.int32)
    node_mask = np.zeros(max_nodes, bool)
    edge_mask = np.zeros(max_edges, bool)
    graph_mask = np.zeros(max_graphs, bool)
    ys = None

    extras_parts: Dict[str, list] = {}
    kinds: Dict[str, str] = {}
    for gid, g in enumerate(graphs):
        n_off = int(n_cursor[gid])
        e_off = int(e_cursor[gid])
        nn, ne = g.num_nodes, g.num_edges
        node_feat[n_off: n_off + nn] = g.node_feat
        edge_feat[e_off: e_off + ne] = g.edge_feat
        receivers[e_off: e_off + ne] = g.edge_index[0] + n_off
        senders[e_off: e_off + ne] = g.edge_index[1] + n_off
        node_graph[n_off: n_off + nn] = gid
        node_mask[n_off: n_off + nn] = True
        edge_mask[e_off: e_off + ne] = True
        graph_mask[gid] = True
        if g.y is not None:
            if ys is None:
                ys = np.zeros(
                    (max_graphs,) + np.asarray(g.y).shape,
                    np.asarray(g.y).dtype,
                )
            ys[gid] = g.y
        for k, (arr, kind) in g.extras.items():
            arr = np.asarray(arr)
            if kind == NODE_IDX:
                arr = arr.astype(np.int32) + n_off
            elif kind == EDGE_IDX:
                arr = arr.astype(np.int32) + e_off
            extras_parts.setdefault(k, []).append(arr)
            kinds[k] = kind
    # padded rows inside each block keep mask False / index 0 defaults

    extras: Dict[str, np.ndarray] = {}
    for k, parts in extras_parts.items():
        kind = kinds[k]
        cat = (
            np.stack(parts, axis=0) if kind == GRAPH
            else np.concatenate(parts, axis=0)
        )
        if kind == NODE_ROW or kind == EDGE_ROW:
            raise NotImplementedError(
                "row-kind extras unsupported in blocked packing"
            )
        pad_n = max_graphs if kind == GRAPH else (extra_pad or {}).get(k)
        if pad_n is None:
            raise ValueError(f"extra {k!r} needs an extra_pad entry")
        mask = np.zeros(pad_n, bool)
        mask[: cat.shape[0]] = True
        extras[k] = _pad_rows(cat, pad_n)
        extras[k + "_mask"] = mask

    out = PackedGraphs(
        node_feat=node_feat,
        edge_feat=edge_feat,
        senders=senders,
        receivers=receivers,
        node_graph=node_graph,
        node_mask=node_mask,
        edge_mask=edge_mask,
        graph_mask=graph_mask,
        y=ys,
        extras=extras,
        block_nodes=block_nodes,
        block_edges=block_edges,
    )
    if np_out:
        return out
    return jax.tree_util.tree_map(jnp.asarray, out)


def pad_to_buckets(num: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= num; keeps the set of XLA-compiled shapes bounded."""
    for b in sorted(buckets):
        if num <= b:
            return b
    raise ValueError(f"{num} exceeds largest bucket {max(buckets)}")
