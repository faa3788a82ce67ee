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


def sample_per_group_np(
    rng: np.random.Generator,
    group_ids: np.ndarray,
    valid: np.ndarray,
    num_groups: int,
    rate: float,
) -> np.ndarray:
    """Vectorized uniform distinct sampling of ``int(cnt * rate) + 1``
    items per group (the reference's ``random.sample`` semantics): rank
    items within their group by an iid uniform draw, keep the lowest."""
    N = group_ids.shape[0]
    u = rng.random(N)
    sg = np.where(valid, group_ids, num_groups)
    order = np.argsort(sg * 2.0 + u)
    sgs = sg[order]
    seg_start = np.searchsorted(sgs, np.arange(num_groups))
    rank = np.arange(N) - seg_start[np.minimum(sgs, num_groups - 1)]
    nper = np.bincount(group_ids[valid], minlength=num_groups)
    k = (nper * rate).astype(np.int64) + 1  # int(cnt*rate + 1)
    sel = (rank < k[np.minimum(sgs, num_groups - 1)]) & (sgs < num_groups)
    out = np.zeros(N, bool)
    out[order[sel]] = True
    return out


def sample_masked_nodes_np(
    rng: np.random.Generator,
    node_graph: np.ndarray,
    node_mask: np.ndarray,
    num_graphs: int,
    mask_rate: float,
) -> np.ndarray:
    """Per-graph distinct atom sampling (numpy twin of
    objectives.masking.sample_masked_nodes)."""
    return sample_per_group_np(rng, node_graph, node_mask, num_graphs,
                               mask_rate)


def negative_candidates_np(rng: np.random.Generator,
                           n_per_group: np.ndarray,
                           e_per_group: np.ndarray):
    """Candidate pool for NegativeEdge-style rejection sampling: per group
    draw ``5 * E_g`` uniform (a, b) local-node pairs. Returns
    (group_id, a_local, b_local, cand_per)."""
    cand_per = 5 * e_per_group
    C = int(cand_per.sum())
    gid = np.repeat(np.arange(len(e_per_group)), cand_per)
    u = rng.random((C, 2))
    n = n_per_group[gid]
    a = (u[:, 0] * n).astype(np.int64)
    b = (u[:, 1] * n).astype(np.int64)
    return gid, a, b, cand_per


# dense fast-path budget: bool exists-table (1 B) + int32 first-index
# table (4 B) per key slot -> worst case ~80 MB at the cap; typical chem
# batches are ~0.5 M keys (~2.5 MB)
_DENSE_KEYSPACE_CAP = 1 << 24


def select_first_valid_np(key: np.ndarray, exist_keys: np.ndarray,
                          keyspace: int, selfloop: np.ndarray,
                          cand_per: np.ndarray, want: np.ndarray,
                          gid: np.ndarray) -> np.ndarray:
    """Shared core of the reference's NegativeEdge acceptance loop
    (chem/util.py:22-52), vectorized: reject self-loops, existing
    directed edges, and duplicates (first-occurrence — an identical
    earlier candidate that was itself invalid implies the later copy is
    invalid too, so dedup-over-all equals the reference's
    dedup-over-accepted); then keep each group's first ``want``
    survivors in candidate order. Returns the take mask.

    ``key`` must be compact (< ``keyspace``); small keyspaces use dense
    tables — membership is one indexed load, and first-occurrence is a
    REVERSED duplicate-index write (the last write wins, so writing in
    reverse candidate order leaves each key's FIRST index) — which is
    ~5x cheaper than the searchsorted + argsort-based fallback."""
    C = len(key)
    if C == 0:
        return np.zeros(0, bool)
    if keyspace <= _DENSE_KEYSPACE_CAP:
        table = np.zeros(keyspace, bool)
        table[exist_keys] = True
        exists = table[key]
        first = np.empty(keyspace, np.int32)  # only written slots read
        idx = np.arange(C, dtype=np.int32)
        first[key[::-1]] = idx[::-1]
        is_first = first[key] == idx
    else:
        exist_sorted = np.sort(exist_keys)
        pos = np.minimum(np.searchsorted(exist_sorted, key),
                         max(len(exist_sorted) - 1, 0))
        exists = (
            (exist_sorted[pos] == key) if len(exist_sorted)
            else np.zeros(C, bool)
        )
        first_idx = np.unique(key, return_index=True)[1]
        is_first = np.zeros(C, bool)
        is_first[first_idx] = True
    ok = ~selfloop & ~exists & is_first

    csum = np.cumsum(ok)
    run_start = np.concatenate([[0], np.cumsum(cand_per)[:-1]])
    cum_before = np.where(run_start > 0,
                          csum[np.maximum(run_start - 1, 0)], 0)
    rank = csum - np.repeat(cum_before, cand_per) - 1
    return ok & (rank < want[gid])


def select_negatives_np(key: np.ndarray, exist_keys: np.ndarray,
                        keyspace: int, selfloop: np.ndarray,
                        cand_per: np.ndarray, want: np.ndarray,
                        gid: np.ndarray) -> np.ndarray:
    """``select_first_valid_np`` with prefix escalation: acceptance is
    ~90%+, so evaluating each group's first ``3*want + 8`` candidates
    almost always yields the full quota — and because keys embed the
    group id, a group's take mask depends only on its own candidates, so
    the prefix result equals the full result whenever the quota is met.
    Falls back to the full 5E pool for the (rare) batch where any group
    comes up short."""
    prefix = np.minimum(cand_per, 3 * want + 8)
    if int(prefix.sum()) < len(key):
        run_start = np.concatenate([[0], np.cumsum(cand_per)[:-1]])
        tot = int(prefix.sum())
        within = np.arange(tot) - np.repeat(
            np.cumsum(prefix) - prefix, prefix
        )
        pos = np.repeat(run_start, prefix) + within
        gid_p = np.repeat(np.arange(len(want)), prefix)
        take_p = select_first_valid_np(
            key[pos], exist_keys, keyspace, selfloop[pos], prefix,
            want, gid_p,
        )
        got = np.bincount(gid_p[take_p], minlength=len(want))
        if (got >= want).all():
            take = np.zeros(len(key), bool)
            take[pos[take_p]] = True
            return take
    return select_first_valid_np(key, exist_keys, keyspace, selfloop,
                                 cand_per, want, gid)


def _graph_slot_ranges(p: PackedGraphs):
    """(start, count) of each graph's contiguous node-slot run. Both
    packers place a graph's nodes contiguously (within one block for the
    blocked layout), so the run is [start, start + count)."""
    node_graph = np.asarray(p.node_graph)
    node_mask = np.asarray(p.node_mask)
    G = p.max_graphs
    idx = np.flatnonzero(node_mask)
    gids = node_graph[idx]
    counts = np.bincount(gids, minlength=G)
    starts = np.zeros(G, np.int64)
    order = np.argsort(gids, kind="stable")
    first = np.searchsorted(gids[order], np.arange(G))
    has = counts > 0
    starts[has] = idx[order[first[has]]]
    return starts, counts


def _pad1(vals: np.ndarray, budget: int, name: str):
    if len(vals) > budget:
        raise ValueError(f"{len(vals)} {name} exceed budget {budget}")
    out = np.zeros((budget,) + vals.shape[1:], vals.dtype)
    out[: len(vals)] = vals
    m = np.zeros(budget, bool)
    m[: len(vals)] = True
    return out, m


@dataclasses.dataclass
class BatchNegativeEdge:
    """``NegativeEdge`` (chem/util.py:22-52 == bio/util.py:16-44) as ONE
    vectorized pass over the packed batch: per graph, draw ``5 * E_g``
    uniform node pairs and keep the first ``E_g // 2`` that are not
    self-loops, existing directed edges, or earlier picks. Membership is a
    searchsorted over the batch's sorted (receiver, sender) keys; dedup is
    ``np.unique``'s first-occurrence index (an identical earlier candidate
    that was itself invalid implies the later copy is invalid too, so
    dedup-over-all equals the reference's dedup-over-accepted). Emits the
    slot-space ``negative_edges`` [budget, 2] + mask that
    ``EdgePredObjective`` reads."""

    edge_budget: int = 0

    def __call__(self, p: PackedGraphs,
                 rng: np.random.Generator) -> PackedGraphs:
        G, Np = p.max_graphs, p.max_nodes
        snd = np.asarray(p.senders)
        rcv = np.asarray(p.receivers)
        emask = np.asarray(p.edge_mask)
        node_graph = np.asarray(p.node_graph)
        starts, counts_n = _graph_slot_ranges(p)

        e_counts = np.bincount(node_graph[rcv[emask]], minlength=G)
        gid_c, a_loc, b_loc, cand_per = negative_candidates_np(
            rng, counts_n, e_counts
        )
        a = starts[gid_c] + a_loc
        b = starts[gid_c] + b_loc
        # compact graph-local keys (slot-space keys would force the
        # sorted fallback: Np^2 is far past the dense-table budget)
        M = int(counts_n.max(initial=1))
        er, es = rcv[emask], snd[emask]
        eg = node_graph[er]
        keys_exist = (
            eg.astype(np.int64) * (M * M)
            + (er - starts[eg]).astype(np.int64) * M + (es - starts[eg])
        )
        take = select_negatives_np(
            gid_c * (M * M) + a_loc * M + b_loc, keys_exist,
            G * M * M, a_loc == b_loc, cand_per, e_counts // 2, gid_c,
        )

        pairs = np.stack([a[take], b[take]], axis=1).astype(np.int32)
        budget = self.edge_budget or p.max_edges // 2
        vals, m = _pad1(pairs, budget, "negative edges")
        extras = dict(p.extras or {})
        extras["negative_edges"] = vals
        extras["negative_edges_mask"] = m
        return p.replace(extras=extras)


@dataclasses.dataclass
class BatchMaskEdge:
    """bio ``MaskEdge`` (bio/util.py:46-104) as one vectorized pass:
    per graph, sample ``int(E_undirected * rate) + 1`` distinct bonds
    (even slots = per-bond representatives), record the original 9-dim
    features as labels, overwrite BOTH directions with the mask feature
    [0,...,0,1]. Emits slot-space ``masked_edge_idx`` + labels read by
    ``BioMaskEdgeObjective``."""

    mask_rate: float = 0.15
    budget: int = 0

    def __call__(self, p: PackedGraphs,
                 rng: np.random.Generator) -> PackedGraphs:
        G = p.max_graphs
        emask = np.asarray(p.edge_mask)
        rcv = np.asarray(p.receivers)
        node_graph = np.asarray(p.node_graph)
        bond_valid = emask[::2]
        bond_gid = node_graph[rcv[::2]]
        sel = sample_per_group_np(rng, bond_gid, bond_valid, G,
                                  self.mask_rate)
        eidx = (np.flatnonzero(sel) * 2).astype(np.int32)

        edge_feat = np.array(p.edge_feat)
        labels = edge_feat[eidx].copy()
        mask_feat = np.zeros(edge_feat.shape[1], edge_feat.dtype)
        mask_feat[-1] = 1
        edge_feat[eidx] = mask_feat
        edge_feat[eidx + 1] = mask_feat

        budget = self.budget or (
            int(p.max_edges // 2 * self.mask_rate) + G + 8
        )
        vals, m = _pad1(eidx, budget, "masked bonds")
        lab, _ = _pad1(labels, budget, "masked bond labels")
        extras = dict(p.extras or {})
        extras["masked_edge_idx"] = vals
        extras["masked_edge_idx_mask"] = m
        extras["mask_edge_label"] = lab
        extras["mask_edge_label_mask"] = m
        return p.replace(edge_feat=edge_feat, extras=extras)


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
