"""Deep Graph Infomax pretraining (chem/pretrain_deepgraphinfomax.py:30-82,
bio analogue identical).

``summary = sigmoid(mean_pool(h))`` per graph; bilinear discriminator
``score(v, s) = h_v · (s W)`` with W ~ U(-1/sqrt(D), 1/sqrt(D)) (PyG
``uniform`` init, :36-37). Positive pairs match nodes to their own graph's
summary; negatives pair nodes with the *next* valid graph's summary via the
cyclic shift ``cycle_index(n, 1)`` (:63-64) — over valid graph slots only.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import random as jrandom

from pretrain_gnns_tpu.core.graphs import PackedGraphs
from pretrain_gnns_tpu.models import pools
from pretrain_gnns_tpu.models.chem import GNN
from pretrain_gnns_tpu.objectives import losses


def cycle_shift(num_slots: int, n_valid: jnp.ndarray, shift: int):
    """Reference ``cycle_index`` (chem/pretrain_deepgraphinfomax.py:25-28)
    over a dynamic count of valid slots: slot i -> (i + shift) mod n_valid
    for i < n_valid; padded slots map to themselves."""
    i = jnp.arange(num_slots)
    shifted = jnp.where(n_valid > 0, (i + shift) % jnp.maximum(n_valid, 1), i)
    return jnp.where(i < n_valid, shifted, i)


def _masked_bce_mean(scores, target, mask):
    l = losses.bce_with_logits(scores, jnp.full_like(scores, target))
    m = mask.astype(l.dtype)
    return jnp.sum(l * m) / jnp.maximum(jnp.sum(m), 1.0)


class InfomaxObjective(nn.Module):
    num_layer: int = 5
    emb_dim: int = 300
    jk: str = "last"
    drop_ratio: float = 0.0
    gnn_type: str = "gin"
    trunk: type = GNN

    @nn.compact
    def __call__(
        self, g: PackedGraphs, train: bool = False
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        h = self.trunk(self.num_layer, self.emb_dim, self.jk,
                       self.drop_ratio, self.gnn_type, name="gnn")(
            g, train=train
        )
        summary = nn.sigmoid(pools.mean_pool(h, g))  # [G, D]

        bound = 1.0 / math.sqrt(self.emb_dim)
        w = self.param(
            "discriminator_weight",
            lambda key, shape: jrandom.uniform(
                key, shape, jnp.float32, -bound, bound
            ),
            (self.emb_dim, self.emb_dim),
        )
        proj = summary @ w  # [G, D]

        n_valid = jnp.sum(g.graph_mask)
        shifted = cycle_shift(g.max_graphs, n_valid, 1)
        pos = jnp.sum(h * jnp.take(proj, g.node_graph, axis=0), axis=1)
        neg_proj = jnp.take(proj, shifted, axis=0)
        neg = jnp.sum(h * jnp.take(neg_proj, g.node_graph, axis=0), axis=1)

        loss = _masked_bce_mean(pos, 1.0, g.node_mask) + _masked_bce_mean(
            neg, 0.0, g.node_mask
        )
        acc = losses.sign_accuracy(pos, neg, g.node_mask, g.node_mask)
        return loss, {"acc": acc}
