"""Edge-prediction pretraining (chem/pretrain_edgepred.py:25-47,
bio/pretrain_edgepred.py — identical math).

Positive pairs: every 2nd directed edge (= unique undirected bonds, since
featurization stores direction pairs consecutively); score =
``h[receiver] · h[sender]``. Negative pairs from the ``NegativeEdge``
transform — host-sampled into the descriptors, or sampled ON DEVICE
inside the jitted step (:func:`sample_negative_edges`, engaged whenever
the batch carries no ``negative_edges`` extra). Loss = mean BCE(pos, 1)
+ mean BCE(neg, 0).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pretrain_gnns_tpu.core.graphs import PackedGraphs
from pretrain_gnns_tpu.models.chem import GNN
from pretrain_gnns_tpu.objectives import losses


def _masked_bce_mean(scores, target, mask):
    l = losses.bce_with_logits(scores, jnp.full_like(scores, target))
    m = mask.astype(l.dtype)
    return jnp.sum(l * m) / jnp.maximum(jnp.sum(m), 1.0)


def sample_negative_edges(
    key: jax.Array, g: PackedGraphs, budget: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side ``NegativeEdge`` (chem/util.py:22-52): per graph,
    uniform random node pairs that are not self-loops, not existing
    directed edges, and not duplicates, quota ``E_directed // 2``.

    TPU-native formulation — sorts, binary searches and gathers only (no
    scatters): one candidate pair is drawn per EDGE SLOT inside its own
    graph (up to e_g candidates for a quota of e_g/2, i.e. 2x
    oversampling vs the reference's 5x over a 10% take — acceptance is
    >~95% on molecular densities, so quota shortfall is rare; when it
    happens the batch simply carries fewer negatives, reflected in the
    returned mask). Existing-edge membership is a searchsorted against
    the batch's sorted edge keys; order-preserving dedup and the
    per-graph quota rank both ride the keyed-sort trick of
    ``sample_masked_nodes`` (objectives/masking.py:92-132).

    Returns (pairs [budget, 2] int32, mask [budget] bool).
    """
    from pretrain_gnns_tpu.ops import segment as seg

    N = g.node_feat.shape[0]
    E = g.senders.shape[0]
    G = g.max_graphs
    snd = g.senders.astype(jnp.int32)
    rcv = g.receivers.astype(jnp.int32)
    emask = g.edge_mask

    # per-graph node ranges (slots are contiguous per graph by packing)
    nper = seg.segment_count(g.node_graph, G, mask=g.node_mask) \
        .astype(jnp.int32)
    idx = jnp.where(g.node_mask, jnp.arange(N, dtype=jnp.int32), N)
    nstart = jax.ops.segment_min(idx, g.node_graph, num_segments=G)
    nstart = jnp.where(nper > 0, nstart, 0)

    eg = jnp.where(emask, jnp.take(g.node_graph, snd), G - 1) \
        .astype(jnp.int32)
    n_e = jnp.take(nper, eg)
    s_e = jnp.take(nstart, eg)
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (E,))
    u2 = jax.random.uniform(k2, (E,))
    a = s_e + jnp.minimum((u1 * n_e).astype(jnp.int32),
                          jnp.maximum(n_e - 1, 0))
    b = s_e + jnp.minimum((u2 * n_e).astype(jnp.int32),
                          jnp.maximum(n_e - 1, 0))

    # reject existing directed edges (binary search on sorted edge keys).
    # pair keys a*N + b must fit int32 (x64 is globally off): node
    # buffers beyond 46K slots would need a two-level key
    if N > 46340:
        raise ValueError(f"node buffer {N} overflows int32 pair keys")
    ekeys = jnp.where(emask, snd * N + rcv, -1)
    sorted_keys = jnp.sort(ekeys)
    ckey = a * N + b
    pos = jnp.searchsorted(sorted_keys, ckey)
    hit = jnp.take(sorted_keys, jnp.minimum(pos, E - 1)) == ckey
    valid = emask & (a != b) & ~hit

    # order-preserving dedup: stable sort by key keeps each key group in
    # slot order; the first slot of each group survives
    slot = jnp.arange(E, dtype=jnp.int32)
    dkey = jnp.where(valid, ckey, N * N)
    order = jnp.argsort(dkey)  # jnp.argsort is stable
    dk_s = jnp.take(dkey, order)
    first = jnp.concatenate(
        [jnp.ones(1, bool), dk_s[1:] != dk_s[:-1]]
    ) & (dk_s < N * N)
    valid = valid & jnp.take(first, jnp.argsort(order))

    # per-graph quota e_g // 2, taken in slot order among valid
    e_per = seg.segment_count(eg, G, mask=emask)
    quota = (e_per // 2).astype(jnp.int32)
    sg = jnp.where(valid, eg, G).astype(jnp.int32)
    order2 = jnp.argsort(sg)  # stable: slot order within each graph
    sg_s = jnp.take(sg, order2)
    seg_start = jnp.searchsorted(sg_s, jnp.arange(G, dtype=jnp.int32))
    rank = jnp.arange(E, dtype=jnp.int32) - jnp.take(
        seg_start, jnp.minimum(sg_s, G - 1)
    )
    take = (rank < jnp.take(quota, jnp.minimum(sg_s, G - 1))) & (sg_s < G)
    sel = jnp.take(take, jnp.argsort(order2))

    # compact the selected pairs into the static [budget] layout
    # (stable argsort: selected slots first, in slot order)
    comp = jnp.argsort(~sel)[:budget]
    pairs = jnp.stack(
        [jnp.take(a, comp), jnp.take(b, comp)], axis=1
    ).astype(jnp.int32)
    return pairs, jnp.take(sel, comp)


class EdgePredObjective(nn.Module):
    num_layer: int = 5
    emb_dim: int = 300
    jk: str = "last"
    drop_ratio: float = 0.0
    gnn_type: str = "gin"
    trunk: type = GNN  # swapped for the bio trunk by the bio profile

    @nn.compact
    def __call__(
        self, g: PackedGraphs, train: bool = False
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        h = self.trunk(self.num_layer, self.emb_dim, self.jk,
                       self.drop_ratio, self.gnn_type, name="gnn")(
            g, train=train
        )
        from pretrain_gnns_tpu.ops import spmm

        # positives: every other directed edge (undirected dedup). On
        # blocked batches the scores are computed for ALL edge slots
        # through the Pallas edge_dot head (block-aligned; the odd-slot
        # scores get zero cotangent from the [::2] slice, so the
        # gradient equals the reference's even-edges-only loss exactly)
        # — the take/scatter fallback's backward serializes on TPU
        # (~1.4 ms/step measured, docs/PERFORMANCE.md r5).
        if g.block_nodes > 0:
            all_pos = spmm.edge_dot(
                h, g.receivers, g.senders, g.edge_mask,
                g.block_nodes, g.block_edges,
            )
            pos_score = all_pos[::2]
        else:
            pos_score = spmm.edge_dot(
                h, g.receivers[::2], g.senders[::2], g.edge_mask[::2]
            )
        pos_mask = g.edge_mask[::2]
        extras = g.extras or {}
        if "negative_edges_blocked" in extras:
            # block-aligned negative layout (block_edges // 2 slots per
            # block, native/packer.cpp::sample_negatives_blocked)
            neg = extras["negative_edges_blocked"]
            neg_mask = extras["negative_edges_blocked_mask"]
            neg_score = spmm.edge_dot(
                h, neg[:, 0], neg[:, 1], neg_mask,
                g.block_nodes, g.block_edges // 2,
            )
        else:
            if "negative_edges" in extras:
                neg = extras["negative_edges"]  # [K, 2]
                neg_mask = extras["negative_edges_mask"]
            else:
                # on-device sampling inside the jitted step (loaders
                # with transform_device="device" ship no negatives)
                neg, neg_mask = sample_negative_edges(
                    self.make_rng("mask"), g, g.senders.shape[0] // 2
                )
            neg_score = spmm.edge_dot(h, neg[:, 0], neg[:, 1], neg_mask)
        loss = _masked_bce_mean(pos_score, 1.0, pos_mask) + _masked_bce_mean(
            neg_score, 0.0, neg_mask
        )
        acc = losses.sign_accuracy(pos_score, neg_score, pos_mask, neg_mask)
        return loss, {"acc": acc}
