"""Context-prediction pretraining (chem/pretrain_contextpred.py:43-102).

Two independent trunks: a substructure encoder (num_layer layers) and a
context encoder (csize layers, :156-157). Per sample, ``substruct_rep`` is
the center node's representation in the k-hop substructure;
``overlapped_node_rep`` are the context encoder's representations of the
substruct∩context overlap nodes.

cbow mode (:60-67): overlap reps pooled per graph -> context_rep; negatives
= cyclic shifts of context_rep; score = substruct_rep · context_rep.
skipgram mode (:69-81): per-overlap-node scores against the (repeated)
substruct rep; negatives shift the substruct reps.
Loss = BCE(pos, 1) + neg_samples * BCE(neg, 0) — computed in f32
(documented deviation: the reference upcasts to float64, :86-87; TPUs have
no f64 units and the loss is a scalar mean of well-scaled terms).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pretrain_gnns_tpu.core.graphs import PackedGraphs
from pretrain_gnns_tpu.models.chem import GNN
from pretrain_gnns_tpu.objectives import losses
from pretrain_gnns_tpu.objectives.infomax import cycle_shift
from pretrain_gnns_tpu.ops import segment as seg


def _masked_bce_mean(scores, target, mask):
    l = losses.bce_with_logits(scores, jnp.full_like(scores, target))
    m = mask.astype(l.dtype)
    return jnp.sum(l * m) / jnp.maximum(jnp.sum(m), 1.0)


class ContextPredObjective(nn.Module):
    num_layer: int = 5
    csize: int = 3
    emb_dim: int = 300
    jk: str = "last"
    drop_ratio: float = 0.0
    gnn_type: str = "gin"
    mode: str = "cbow"  # cbow | skipgram
    neg_samples: int = 1
    context_pooling: str = "mean"
    trunk: type = GNN

    @nn.compact
    def __call__(
        self,
        substruct: PackedGraphs,
        context: PackedGraphs,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        # context encoder depth = l2 - l1 = csize (chem/pretrain_contextpred.py:157)
        h_sub = self.trunk(self.num_layer, self.emb_dim, self.jk,
                           self.drop_ratio, self.gnn_type,
                           name="gnn_substruct")(substruct, train=train)
        h_ctx = self.trunk(self.csize, self.emb_dim, self.jk,
                           self.drop_ratio, self.gnn_type,
                           name="gnn_context")(context, train=train)

        center = substruct.extras["center_substruct_idx"][:, 0] if (
            substruct.extras["center_substruct_idx"].ndim == 2
        ) else substruct.extras["center_substruct_idx"]
        substruct_rep = jnp.take(h_sub, center, axis=0)  # [G, D]
        graph_mask = substruct.graph_mask
        n_valid = jnp.sum(graph_mask)

        ov_idx = context.extras["overlap_context_substruct_idx"]
        ov_mask = context.extras["overlap_context_substruct_idx_mask"]
        ov_rep = jnp.take(h_ctx, ov_idx, axis=0)  # [K, D]
        ov_graph = jnp.take(context.node_graph, ov_idx)  # [K]
        G = context.max_graphs

        metrics: Dict[str, jnp.ndarray] = {}
        if self.mode == "cbow":
            pool = {
                "sum": seg.segment_sum, "mean": seg.segment_mean,
            }[self.context_pooling]
            context_rep = pool(ov_rep, ov_graph, G, mask=ov_mask)  # [G, D]
            pred_pos = jnp.sum(substruct_rep * context_rep, axis=1)
            negs = []
            for i in range(self.neg_samples):
                shifted = cycle_shift(G, n_valid, i + 1)
                neg_rep = jnp.take(context_rep, shifted, axis=0)
                negs.append(jnp.sum(substruct_rep * neg_rep, axis=1))
            pred_neg = jnp.concatenate(negs)
            pos_mask = graph_mask
            neg_mask = jnp.tile(graph_mask, self.neg_samples)
        elif self.mode == "skipgram":
            expanded = jnp.take(substruct_rep, ov_graph, axis=0)  # [K, D]
            pred_pos = jnp.sum(expanded * ov_rep, axis=1)
            negs = []
            for i in range(self.neg_samples):
                shifted = cycle_shift(G, n_valid, i + 1)
                s_shift = jnp.take(substruct_rep, shifted, axis=0)
                negs.append(
                    jnp.sum(jnp.take(s_shift, ov_graph, axis=0) * ov_rep,
                            axis=1)
                )
            pred_neg = jnp.concatenate(negs)
            pos_mask = ov_mask
            neg_mask = jnp.tile(ov_mask, self.neg_samples)
        else:
            raise ValueError("Invalid mode!")

        loss_pos = _masked_bce_mean(pred_pos, 1.0, pos_mask)
        loss_neg = _masked_bce_mean(pred_neg, 0.0, neg_mask)
        loss = loss_pos + self.neg_samples * loss_neg
        metrics["balanced_loss"] = loss_pos + loss_neg
        metrics["acc"] = losses.sign_accuracy(
            pred_pos, pred_neg, pos_mask, neg_mask
        )
        return loss, metrics
