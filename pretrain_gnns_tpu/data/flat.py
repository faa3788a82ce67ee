"""Flat (structure-of-arrays) dataset representation + native fast packing.

Stores an entire dataset as concatenated arrays with offsets — the same
layout as the npz shards — and packs batches via the C++ packer
(pretrain_gnns_tpu.native), falling back to numpy. This is the zero-copy
hot path for transform-free pipelines (fine-tune, infomax, supervised);
transform-bearing objectives go through the per-graph ``PackedLoader``.

Supports both batch layouts: contiguous padded packing and the
block-diagonal layout consumed by the Pallas SpMM kernel (the C++ side
implements both; the Python wrapper computes the first-fit block placement
and the per-graph cursors, which it reuses to pack fixed-shape per-graph
extras — e.g. bio ``center_node_idx`` — without touching the native code).
"""

from __future__ import annotations

import ctypes
import math
from typing import Dict, Iterator, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from pretrain_gnns_tpu.core.graphs import (
    GRAPH, NODE_IDX, Graph, PackedGraphs, _pad_rows,
)
from pretrain_gnns_tpu.native import load as load_native


def _as_c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class FlatGraphs:
    """Dataset as flat arrays. Node/edge features keep their dtype; edge
    endpoints are int32 graph-local. ``extras`` holds fixed-shape per-graph
    auxiliary arrays as ``name -> (array [G, ...], kind)`` with kinds
    ``NODE_IDX`` (offset by the graph's packed node cursor) or ``GRAPH``."""

    def __init__(self, node_feat, node_off, recv, send, edge_feat,
                 edge_off, y=None, extras=None):
        # int64 features halve to int32: jit coerces to int32 anyway (x64
        # off) and the host->device copy is half the bytes
        def _shrink(a):
            a = np.asarray(a)
            if a.dtype == np.int64:
                return a.astype(np.int32)
            return a

        node_feat = _shrink(node_feat)
        edge_feat = _shrink(edge_feat)
        self.node_feat = np.ascontiguousarray(node_feat)
        self.node_off = np.ascontiguousarray(node_off, dtype=np.int64)
        self.recv = np.ascontiguousarray(recv, dtype=np.int32)
        self.send = np.ascontiguousarray(send, dtype=np.int32)
        self.edge_feat = np.ascontiguousarray(edge_feat)
        self.edge_off = np.ascontiguousarray(edge_off, dtype=np.int64)
        self.y = None if y is None else np.ascontiguousarray(y)
        self.extras: Dict[str, Tuple[np.ndarray, str]] = extras or {}

    @classmethod
    def from_graphs(cls, graphs: Sequence[Graph]) -> "FlatGraphs":
        """Flatten host graphs; fixed-shape NODE_IDX/GRAPH extras shared by
        every graph are captured, anything else raises ValueError (callers
        fall back to the per-graph packer)."""
        node_off = np.cumsum([0] + [g.num_nodes for g in graphs])
        edge_off = np.cumsum([0] + [g.num_edges for g in graphs])
        ei = np.concatenate([g.edge_index for g in graphs], axis=1)
        y = (
            np.stack([np.asarray(g.y) for g in graphs])
            if graphs[0].y is not None
            else None
        )
        extras: Dict[str, Tuple[np.ndarray, str]] = {}
        keys = set()
        for g in graphs:
            keys.update(g.extras.keys())
        for k in sorted(keys):
            vals, kinds = [], set()
            for g in graphs:
                if k not in g.extras:
                    raise ValueError(f"extra {k!r} missing on some graphs")
                a, kind = g.extras[k]
                vals.append(np.asarray(a))
                kinds.add(kind)
            if len(kinds) != 1 or kinds.pop() not in (NODE_IDX, GRAPH):
                raise ValueError(f"extra {k!r} not flat-compatible")
            if len({v.shape for v in vals}) != 1:
                raise ValueError(f"extra {k!r} has varying shapes")
            extras[k] = (np.stack(vals, axis=0), g.extras[k][1])
        return cls(
            np.concatenate([g.node_feat for g in graphs]),
            node_off,
            ei[0], ei[1],
            np.concatenate([g.edge_feat for g in graphs]),
            edge_off,
            y,
            extras,
        )

    def __len__(self) -> int:
        return len(self.node_off) - 1

    def num_nodes(self, i: int) -> int:
        return int(self.node_off[i + 1] - self.node_off[i])

    def num_edges(self, i: int) -> int:
        return int(self.edge_off[i + 1] - self.edge_off[i])

    # -----------------------------------------------------------------
    def _first_fit(self, graph_ids, n_blocks, block_nodes, block_edges):
        """Block placement + per-graph node/edge cursors (same first-fit as
        core.graphs.pack_graphs_blocked)."""
        G = len(graph_ids)
        block_of = np.empty(G, np.int64)
        n_cur = np.empty(G, np.int64)
        e_cur = np.empty(G, np.int64)
        fill_n = np.zeros(n_blocks, np.int64)
        fill_e = np.zeros(n_blocks, np.int64)
        for g, gi in enumerate(graph_ids):
            nn, ne = self.num_nodes(gi), self.num_edges(gi)
            for b in range(n_blocks):
                if (fill_n[b] + nn <= block_nodes
                        and fill_e[b] + ne <= block_edges):
                    block_of[g] = b
                    n_cur[g] = b * block_nodes + fill_n[b]
                    e_cur[g] = b * block_edges + fill_e[b]
                    fill_n[b] += nn
                    fill_e[b] += ne
                    break
            else:
                raise ValueError("batch exceeds packed buffers")
        return block_of, n_cur, e_cur

    def pack(
        self,
        graph_ids: np.ndarray,
        max_nodes: int,
        max_edges: int,
        max_graphs: int,
        blocks: Optional[Tuple[int, int, int]] = None,
        extra_pad: Optional[Mapping[str, int]] = None,
    ) -> PackedGraphs:
        """Pack the selected graphs (native C++ when available). With
        ``blocks`` = (n_blocks, block_nodes, block_edges) the batch uses the
        block-diagonal layout; buffers are then n_blocks*block sizes."""
        graph_ids = np.ascontiguousarray(graph_ids, np.int64)
        G = len(graph_ids)
        if blocks is not None:
            n_blocks, bn, be = blocks
            max_nodes, max_edges = n_blocks * bn, n_blocks * be
        fn = self.node_feat.shape[1:]
        fe = self.edge_feat.shape[1:]
        out_nf = np.empty((max_nodes,) + fn, self.node_feat.dtype)
        out_ef = np.empty((max_edges,) + fe, self.edge_feat.dtype)
        out_snd = np.empty(max_edges, np.int32)
        out_rcv = np.empty(max_edges, np.int32)
        out_ng = np.empty(max_nodes, np.int32)
        out_nm = np.empty(max_nodes, np.uint8)
        out_em = np.empty(max_edges, np.uint8)
        out_gm = np.empty(max_graphs, np.uint8)

        block_of = n_cur = e_cur = None
        if blocks is not None:
            block_of, n_cur, e_cur = self._first_fit(graph_ids, *blocks)

        lib = load_native()
        if lib is not None:
            fnb = ctypes.c_int64(int(np.prod(fn, initial=1))
                                 * self.node_feat.dtype.itemsize)
            feb = ctypes.c_int64(int(np.prod(fe, initial=1))
                                 * self.edge_feat.dtype.itemsize)
            common = (
                _as_c(self.node_feat), _as_c(self.node_off),
                _as_c(self.recv), _as_c(self.send),
                _as_c(self.edge_feat), _as_c(self.edge_off),
            )
            outs = (
                _as_c(out_nf), _as_c(out_ef), _as_c(out_snd),
                _as_c(out_rcv), _as_c(out_ng), _as_c(out_nm),
                _as_c(out_em), _as_c(out_gm),
            )
            if blocks is None:
                rc = lib.pack_batch(
                    *common, _as_c(graph_ids), ctypes.c_int64(G), fnb, feb,
                    ctypes.c_int64(max_nodes), ctypes.c_int64(max_edges),
                    ctypes.c_int64(max_graphs), *outs,
                )
            else:
                n_blocks, bn, be = blocks
                fill_n = np.empty(n_blocks, np.int64)
                fill_e = np.empty(n_blocks, np.int64)
                rc = lib.pack_batch_blocked(
                    *common, _as_c(graph_ids), _as_c(block_of),
                    ctypes.c_int64(G), fnb, feb,
                    ctypes.c_int64(n_blocks), ctypes.c_int64(bn),
                    ctypes.c_int64(be), ctypes.c_int64(max_graphs), *outs,
                    _as_c(fill_n), _as_c(fill_e),
                )
            if rc != 0:
                raise ValueError("batch exceeds packed buffers")
        else:  # numpy fallback
            out_nf[:] = 0; out_ef[:] = 0; out_snd[:] = 0; out_rcv[:] = 0
            out_ng[:] = 0; out_nm[:] = 0; out_em[:] = 0; out_gm[:] = 0
            nc = ec = 0
            for g, gi in enumerate(graph_ids):
                n0, n1 = self.node_off[gi], self.node_off[gi + 1]
                e0, e1 = self.edge_off[gi], self.edge_off[gi + 1]
                nn, ne = n1 - n0, e1 - e0
                if blocks is not None:
                    nc, ec = int(n_cur[g]), int(e_cur[g])
                if nc + nn > max_nodes or ec + ne > max_edges:
                    raise ValueError("batch exceeds packed buffers")
                out_nf[nc: nc + nn] = self.node_feat[n0:n1]
                out_ef[ec: ec + ne] = self.edge_feat[e0:e1]
                out_rcv[ec: ec + ne] = self.recv[e0:e1] + nc
                out_snd[ec: ec + ne] = self.send[e0:e1] + nc
                out_ng[nc: nc + nn] = g
                out_nm[nc: nc + nn] = 1
                out_em[ec: ec + ne] = 1
                out_gm[g] = 1
                nc += nn
                ec += ne

        y = None
        if self.y is not None:
            y = np.zeros((max_graphs,) + self.y.shape[1:], self.y.dtype)
            y[:G] = self.y[graph_ids]

        extras: Dict[str, np.ndarray] = {}
        if self.extras:
            if blocks is None:
                offs = np.concatenate(
                    [[0], np.cumsum(np.diff(self.node_off)[graph_ids])[:-1]]
                )
            else:
                offs = n_cur
            for k, (vals, kind) in self.extras.items():
                sel = vals[graph_ids]
                if kind == NODE_IDX:
                    sel = sel.astype(np.int32) + offs.reshape(
                        (G,) + (1,) * (sel.ndim - 1)
                    ).astype(np.int32)
                pad_n = max_graphs if kind == GRAPH else (
                    (extra_pad or {}).get(k, max_graphs)
                )
                if kind == GRAPH:
                    cat = sel
                else:
                    cat = sel.reshape((-1,) + sel.shape[2:])
                mask = np.zeros(pad_n, bool)
                mask[: cat.shape[0]] = True
                extras[k] = _pad_rows(cat, pad_n)
                extras[k + "_mask"] = mask

        return PackedGraphs(
            node_feat=out_nf, edge_feat=out_ef, senders=out_snd,
            receivers=out_rcv, node_graph=out_ng,
            node_mask=out_nm.astype(bool), edge_mask=out_em.astype(bool),
            graph_mask=out_gm.astype(bool), y=y, extras=extras,
            block_nodes=blocks[1] if blocks else 0,
            block_edges=blocks[2] if blocks else 0,
        )


class FlatLoader:
    """Shuffled batch iterator over a FlatGraphs via the native packer.
    Mirrors ``PackedLoader`` semantics (seeded epoch shuffle, early flush on
    buffer overflow with fragmentation-aware fit simulation for the blocked
    layout, drop_last) so the two are interchangeable."""

    def __init__(self, flat: FlatGraphs, batch_size: int,
                 max_nodes: int = 0, max_edges: int = 0, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = False,
                 blocks: Optional[Tuple[int, int, int]] = None,
                 extra_pad: Optional[Mapping[str, int]] = None,
                 post_transform=None):
        self.flat = flat
        # batch-level transform (data/batch_transforms.py), applied to each
        # packed batch with the epoch rng — runs in the prefetch thread
        self.post_transform = post_transform
        self.batch_size = batch_size
        self.blocks = blocks
        if blocks is not None:
            n_blocks, bn, be = blocks
            max_nodes, max_edges = n_blocks * bn, n_blocks * be
        self.max_nodes, self.max_edges = max_nodes, max_edges
        self.shuffle, self.seed, self.drop_last = shuffle, seed, drop_last
        self.extra_pad = extra_pad
        self._epoch = 0
        self.last_epoch_stats: Dict[str, float] = {}

    def __len__(self) -> int:
        n = len(self.flat)
        return n // self.batch_size if self.drop_last else math.ceil(
            n / self.batch_size
        )

    def _fits(self, gi, state) -> bool:
        nn, ne = self.flat.num_nodes(gi), self.flat.num_edges(gi)
        if self.blocks is None:
            if (state["n"] + nn <= self.max_nodes
                    and state["e"] + ne <= self.max_edges):
                state["n"] += nn
                state["e"] += ne
                return True
            return False
        n_blocks, bn, be = self.blocks
        for b in range(n_blocks):
            if state["fn"][b] + nn <= bn and state["fe"][b] + ne <= be:
                state["fn"][b] += nn
                state["fe"][b] += ne
                return True
        return False

    def _new_state(self):
        if self.blocks is None:
            return {"n": 0, "e": 0}
        return {"fn": [0] * self.blocks[0], "fe": [0] * self.blocks[0]}

    def __iter__(self) -> Iterator[PackedGraphs]:
        order = np.arange(len(self.flat))
        rng = np.random.default_rng((self.seed, self._epoch))
        if self.shuffle:
            rng.shuffle(order)
        self._epoch += 1

        def _pack(ids: List[int]) -> PackedGraphs:
            out = self.flat.pack(
                np.array(ids), self.max_nodes, self.max_edges,
                self.batch_size, blocks=self.blocks,
                extra_pad=self.extra_pad,
            )
            if self.post_transform is not None:
                out = self.post_transform(out, rng)
            return out

        def _edges(ids):
            return sum(self.flat.num_edges(i) for i in ids)

        n_batches = n_graphs = n_edges = 0
        batch: List[int] = []
        state = self._new_state()
        for gi in order:
            if batch and not self._fits(gi, state):
                yield _pack(batch)  # buffer overflow: flush early
                n_batches += 1
                n_graphs += len(batch)
                n_edges += _edges(batch)
                batch = []
                state = self._new_state()
                self._fits(gi, state)
            elif not batch:
                self._fits(gi, state)
            batch.append(int(gi))
            if len(batch) == self.batch_size:
                yield _pack(batch)
                n_batches += 1
                n_graphs += len(batch)
                n_edges += _edges(batch)
                batch = []
                state = self._new_state()
        if batch and not self.drop_last:
            yield _pack(batch)
            n_batches += 1
            n_graphs += len(batch)
            n_edges += _edges(batch)
        self.last_epoch_stats = {
            "batches": n_batches, "graphs": n_graphs, "edges": n_edges,
            "graphs_per_batch": n_graphs / max(n_batches, 1),
        }
