"""Batch-level (vectorized) SSL transforms over PACKED batches.

The reference applies per-graph transforms inside DataLoader workers
(chem/pretrain_masking.py:122, chem/util.py:189-282). Per-graph python is
the host-side throughput ceiling at TPU speeds, so the default masking
pipeline here works on the packed batch instead: one numpy pass over the
whole batch (argsort + searchsorted, ~0.5 ms for 8K nodes) samples each
graph's ``int(n * rate) + 1`` distinct atoms, overwrites features, and
emits the same compact extras the per-graph path produces
(``masked_atom_indices`` / ``mask_node_label`` / ``connected_edge_indices``
/ ``mask_edge_label``), so the device-side objective is IDENTICAL
(objectives.masking.MaskingObjective). Runs inside the prefetch thread —
fully overlapped with device compute.

Sampling distribution matches the reference's ``random.sample`` exactly
(uniform distinct subsets per graph); RNG stream parity is out of scope
per SURVEY.md §7f.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from pretrain_gnns_tpu.core.graphs import PackedGraphs


def sample_masked_nodes_np(
    rng: np.random.Generator,
    node_graph: np.ndarray,
    node_mask: np.ndarray,
    num_graphs: int,
    mask_rate: float,
) -> np.ndarray:
    """Vectorized per-graph distinct sampling (numpy twin of
    objectives.masking.sample_masked_nodes): rank nodes within their graph
    by an iid uniform draw, keep the ``int(n*rate)+1`` lowest."""
    N = node_graph.shape[0]
    u = rng.random(N)
    sg = np.where(node_mask, node_graph, num_graphs)
    order = np.argsort(sg * 2.0 + u)
    sgs = sg[order]
    seg_start = np.searchsorted(sgs, np.arange(num_graphs))
    rank = np.arange(N) - seg_start[np.minimum(sgs, num_graphs - 1)]
    nper = np.bincount(node_graph[node_mask], minlength=num_graphs)
    k = (nper * mask_rate).astype(np.int64) + 1  # int(n*rate + 1)
    sel = (rank < k[np.minimum(sgs, num_graphs - 1)]) & (sgs < num_graphs)
    masked = np.zeros(N, bool)
    masked[order[sel]] = True
    return masked


@dataclasses.dataclass
class BatchMaskAtom:
    """chem MaskAtom (chem/util.py:189-282) as a packed-batch transform.

    Produces a NEW PackedGraphs whose node/edge features carry the mask
    tokens and whose extras are exactly what ``MaskingObjective`` reads.
    ``node_budget``/``edge_budget`` are the static padded extras lengths
    (must be identical across batches for the scan trainer)."""

    num_atom_type: int = 119
    num_edge_type: int = 5
    mask_rate: float = 0.15
    mask_edge: bool = False
    node_budget: int = 0
    edge_budget: int = 0

    def __call__(self, p: PackedGraphs,
                 rng: np.random.Generator) -> PackedGraphs:
        node_graph = np.asarray(p.node_graph)
        node_mask = np.asarray(p.node_mask)
        masked = sample_masked_nodes_np(
            rng, node_graph, node_mask, p.max_graphs, self.mask_rate
        )
        idx = np.nonzero(masked)[0].astype(np.int32)
        nb = self.node_budget or (
            int(p.max_nodes * self.mask_rate) + p.max_graphs + 8
        )
        if len(idx) > nb:
            raise ValueError(f"{len(idx)} masked nodes exceed budget {nb}")

        node_feat = np.array(p.node_feat)
        labels = node_feat[idx].copy()
        node_feat[idx] = [self.num_atom_type, 0]

        extras = dict(p.extras or {})
        pad_i = np.zeros(nb, np.int32)
        pad_i[: len(idx)] = idx
        pad_l = np.zeros((nb,) + labels.shape[1:], labels.dtype)
        pad_l[: len(idx)] = labels
        m = np.zeros(nb, bool)
        m[: len(idx)] = True
        extras["masked_atom_indices"] = pad_i
        extras["masked_atom_indices_mask"] = m
        extras["mask_node_label"] = pad_l
        extras["mask_node_label_mask"] = m

        edge_feat = p.edge_feat
        if self.mask_edge:
            snd = np.asarray(p.senders)
            rcv = np.asarray(p.receivers)
            emask = np.asarray(p.edge_mask)
            edge_masked = (masked[snd] | masked[rcv]) & emask
            # direction pairs are consecutive (chem/loader.py:81-96; the
            # packers preserve even alignment), so even slots are the
            # per-bond representatives (the reference's every-2nd dedup)
            conn = np.nonzero(edge_masked[::2])[0].astype(np.int32) * 2
            eb = self.edge_budget or p.max_edges // 2
            if len(conn) > eb:
                raise ValueError(
                    f"{len(conn)} masked bonds exceed budget {eb}"
                )
            edge_feat = np.array(p.edge_feat)
            elabels = edge_feat[conn].copy()
            edge_feat[edge_masked] = [self.num_edge_type, 0]
            pe = np.zeros(eb, np.int32)
            pe[: len(conn)] = conn
            pl = np.zeros((eb,) + elabels.shape[1:], elabels.dtype)
            pl[: len(conn)] = elabels
            em = np.zeros(eb, bool)
            em[: len(conn)] = True
            extras["connected_edge_indices"] = pe
            extras["connected_edge_indices_mask"] = em
            extras["mask_edge_label"] = pl
            extras["mask_edge_label_mask"] = em

        return p.replace(node_feat=node_feat, edge_feat=edge_feat,
                         extras=extras)
