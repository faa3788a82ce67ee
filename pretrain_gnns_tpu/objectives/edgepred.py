"""Edge-prediction pretraining (chem/pretrain_edgepred.py:25-47,
bio/pretrain_edgepred.py — identical math).

Positive pairs: every 2nd directed edge (= unique undirected bonds, since
featurization stores direction pairs consecutively); score =
``h[receiver] · h[sender]``. Negative pairs from the ``NegativeEdge``
transform. Loss = mean BCE(pos, 1) + mean BCE(neg, 0).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pretrain_gnns_tpu.core.graphs import PackedGraphs
from pretrain_gnns_tpu.models.chem import GNN
from pretrain_gnns_tpu.objectives import losses


def _masked_bce_mean(scores, target, mask):
    l = losses.bce_with_logits(scores, jnp.full_like(scores, target))
    m = mask.astype(l.dtype)
    return jnp.sum(l * m) / jnp.maximum(jnp.sum(m), 1.0)


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
        # positives: every other directed edge (undirected dedup)
        pos_r = g.receivers[::2]
        pos_s = g.senders[::2]
        pos_mask = g.edge_mask[::2]
        pos_score = jnp.sum(
            jnp.take(h, pos_r, axis=0) * jnp.take(h, pos_s, axis=0), axis=1
        )
        neg = g.extras["negative_edges"]  # [K, 2]
        neg_mask = g.extras["negative_edges_mask"]
        neg_score = jnp.sum(
            jnp.take(h, neg[:, 0], axis=0) * jnp.take(h, neg[:, 1], axis=0),
            axis=1,
        )
        loss = _masked_bce_mean(pos_score, 1.0, pos_mask) + _masked_bce_mean(
            neg_score, 0.0, neg_mask
        )
        acc = losses.sign_accuracy(pos_score, neg_score, pos_mask, neg_mask)
        return loss, {"acc": acc}
