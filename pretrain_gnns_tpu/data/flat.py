"""Flat (structure-of-arrays) dataset representation + native fast packing.

Stores an entire dataset as concatenated arrays with offsets — the same
layout as the npz shards — and packs batches via the C++ packer
(pretrain_gnns_tpu.native), falling back to numpy. This is the zero-copy
hot path for transform-free pipelines (fine-tune, infomax, supervised);
transform-bearing objectives go through the per-graph ``PackedLoader``.
"""

from __future__ import annotations

import ctypes
import math
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from pretrain_gnns_tpu.core.graphs import Graph, PackedGraphs
from pretrain_gnns_tpu.native import load as load_native


def _as_c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class FlatGraphs:
    """Dataset as flat arrays. Node/edge features keep their dtype; edge
    endpoints are int32 graph-local."""

    def __init__(self, node_feat, node_off, recv, send, edge_feat,
                 edge_off, y=None):
        self.node_feat = np.ascontiguousarray(node_feat)
        self.node_off = np.ascontiguousarray(node_off, dtype=np.int64)
        self.recv = np.ascontiguousarray(recv, dtype=np.int32)
        self.send = np.ascontiguousarray(send, dtype=np.int32)
        self.edge_feat = np.ascontiguousarray(edge_feat)
        self.edge_off = np.ascontiguousarray(edge_off, dtype=np.int64)
        self.y = None if y is None else np.ascontiguousarray(y)

    @classmethod
    def from_graphs(cls, graphs: Sequence[Graph]) -> "FlatGraphs":
        node_off = np.cumsum([0] + [g.num_nodes for g in graphs])
        edge_off = np.cumsum([0] + [g.num_edges for g in graphs])
        ei = np.concatenate([g.edge_index for g in graphs], axis=1)
        y = (
            np.stack([np.asarray(g.y) for g in graphs])
            if graphs[0].y is not None
            else None
        )
        return cls(
            np.concatenate([g.node_feat for g in graphs]),
            node_off,
            ei[0], ei[1],
            np.concatenate([g.edge_feat for g in graphs]),
            edge_off,
            y,
        )

    def __len__(self) -> int:
        return len(self.node_off) - 1

    def num_nodes(self, i: int) -> int:
        return int(self.node_off[i + 1] - self.node_off[i])

    def num_edges(self, i: int) -> int:
        return int(self.edge_off[i + 1] - self.edge_off[i])

    # -----------------------------------------------------------------
    def pack(
        self,
        graph_ids: np.ndarray,
        max_nodes: int,
        max_edges: int,
        max_graphs: int,
    ) -> PackedGraphs:
        """Pack the selected graphs (native C++ when available)."""
        graph_ids = np.ascontiguousarray(graph_ids, np.int64)
        G = len(graph_ids)
        fn = self.node_feat.shape[1:]
        fe = self.edge_feat.shape[1:]
        out_nf = np.empty((max_nodes,) + fn, self.node_feat.dtype)
        out_ef = np.empty((max_edges,) + fe, self.edge_feat.dtype)
        out_snd = np.empty(max_nodes * 0 + max_edges, np.int32)
        out_rcv = np.empty(max_edges, np.int32)
        out_ng = np.empty(max_nodes, np.int32)
        out_nm = np.empty(max_nodes, np.uint8)
        out_em = np.empty(max_edges, np.uint8)
        out_gm = np.empty(max_graphs, np.uint8)

        lib = load_native()
        if lib is not None:
            rc = lib.pack_batch(
                _as_c(self.node_feat), _as_c(self.node_off),
                _as_c(self.recv), _as_c(self.send),
                _as_c(self.edge_feat), _as_c(self.edge_off),
                _as_c(graph_ids), ctypes.c_int64(G),
                ctypes.c_int64(int(np.prod(fn, initial=1))
                               * self.node_feat.dtype.itemsize),
                ctypes.c_int64(int(np.prod(fe, initial=1))
                               * self.edge_feat.dtype.itemsize),
                ctypes.c_int64(max_nodes), ctypes.c_int64(max_edges),
                ctypes.c_int64(max_graphs),
                _as_c(out_nf), _as_c(out_ef), _as_c(out_snd),
                _as_c(out_rcv), _as_c(out_ng), _as_c(out_nm),
                _as_c(out_em), _as_c(out_gm),
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
        return PackedGraphs(
            node_feat=out_nf, edge_feat=out_ef, senders=out_snd,
            receivers=out_rcv, node_graph=out_ng,
            node_mask=out_nm.astype(bool), edge_mask=out_em.astype(bool),
            graph_mask=out_gm.astype(bool), y=y, extras={},
        )


class FlatLoader:
    """Shuffled batch iterator over a FlatGraphs via the native packer."""

    def __init__(self, flat: FlatGraphs, batch_size: int,
                 max_nodes: int, max_edges: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = False):
        self.flat = flat
        self.batch_size = batch_size
        self.max_nodes, self.max_edges = max_nodes, max_edges
        self.shuffle, self.seed, self.drop_last = shuffle, seed, drop_last
        self._epoch = 0

    def __iter__(self) -> Iterator[PackedGraphs]:
        order = np.arange(len(self.flat))
        rng = np.random.default_rng((self.seed, self._epoch))
        if self.shuffle:
            rng.shuffle(order)
        self._epoch += 1
        batch: List[int] = []
        n = e = 0
        for gi in order:
            nn, ne = self.flat.num_nodes(gi), self.flat.num_edges(gi)
            if batch and (
                n + nn > self.max_nodes or e + ne > self.max_edges
            ):
                yield self.flat.pack(np.array(batch), self.max_nodes,
                                     self.max_edges, self.batch_size)
                batch, n, e = [], 0, 0
            batch.append(int(gi))
            n += nn
            e += ne
            if len(batch) == self.batch_size:
                yield self.flat.pack(np.array(batch), self.max_nodes,
                                     self.max_edges, self.batch_size)
                batch, n, e = [], 0, 0
        if batch and not self.drop_last:
            yield self.flat.pack(np.array(batch), self.max_nodes,
                                 self.max_edges, self.batch_size)
