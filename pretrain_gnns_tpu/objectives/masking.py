"""Attribute-masking pretraining (chem/pretrain_masking.py) — the north-star
SSL objective.

Node side (chem/pretrain_masking.py:48-52): predict the original atom type
(119 classes) of masked atoms from their node representation. Edge side
(:57-64, ``--mask_edge``): predict the bond type (4 classes) of masked bonds
from ``h[src] + h[dst]``.

The reference steps 3 separate Adams with identical hyperparameters over
trunk/node-head/edge-head (:134-138); since Adam is coordinate-wise, that is
exactly one Adam over the union — we use one.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pretrain_gnns_tpu.core.graphs import PackedGraphs
from pretrain_gnns_tpu.models import inits
from pretrain_gnns_tpu.models.chem import GNN
from pretrain_gnns_tpu.objectives import losses


def _masked_accuracy(logits, labels, mask):
    hit = (jnp.argmax(logits, -1) == labels) & mask
    return jnp.sum(hit) / jnp.maximum(jnp.sum(mask), 1)


class MaskingObjective(nn.Module):
    num_layer: int = 5
    emb_dim: int = 300
    jk: str = "last"
    drop_ratio: float = 0.0
    gnn_type: str = "gin"
    mask_edge: bool = True
    num_atom_classes: int = 119
    num_bond_classes: int = 4

    @nn.compact
    def __call__(
        self, g: PackedGraphs, train: bool = False
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        h = GNN(self.num_layer, self.emb_dim, self.jk, self.drop_ratio,
                self.gnn_type, name="gnn")(g, train=train)

        idx = g.extras["masked_atom_indices"]
        idx_mask = g.extras["masked_atom_indices_mask"]
        node_labels = g.extras["mask_node_label"][:, 0]
        pred_node = inits.dense(
            self.num_atom_classes, self.emb_dim, "linear_pred_atoms"
        )(jnp.take(h, idx, axis=0))
        loss = losses.masked_softmax_xent(pred_node, node_labels, idx_mask)
        metrics = {
            "acc_node": _masked_accuracy(pred_node, node_labels, idx_mask)
        }

        if self.mask_edge:
            eidx = g.extras["connected_edge_indices"]
            emask = g.extras["connected_edge_indices_mask"]
            edge_labels = g.extras["mask_edge_label"][:, 0]
            src = jnp.take(g.receivers, eidx)
            dst = jnp.take(g.senders, eidx)
            edge_rep = jnp.take(h, src, axis=0) + jnp.take(h, dst, axis=0)
            pred_edge = inits.dense(
                self.num_bond_classes, self.emb_dim, "linear_pred_bonds"
            )(edge_rep)
            loss = loss + losses.masked_softmax_xent(
                pred_edge, edge_labels, emask
            )
            metrics["acc_edge"] = _masked_accuracy(
                pred_edge, edge_labels, emask
            )
        return loss, metrics


class BioMaskEdgeObjective(nn.Module):
    """bio attribute masking (bio/pretrain_masking.py:29-66): predict the
    dominant STRING evidence channel (argmax of the 7-dim multi-hot label,
    :52-54) of each masked edge from ``h[src] + h[dst]`` via Linear(D, 7)."""

    num_layer: int = 5
    emb_dim: int = 300
    jk: str = "last"
    drop_ratio: float = 0.0
    gnn_type: str = "gin"
    num_edge_classes: int = 7

    @nn.compact
    def __call__(
        self, g: PackedGraphs, train: bool = False
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        from pretrain_gnns_tpu.models import bio as bio_models

        h = bio_models.GNN(self.num_layer, self.emb_dim, self.jk,
                           self.drop_ratio, self.gnn_type, name="gnn")(
            g, train=train
        )
        eidx = g.extras["masked_edge_idx"]
        emask = g.extras["masked_edge_idx_mask"]
        labels = jnp.argmax(
            g.extras["mask_edge_label"][:, : self.num_edge_classes], axis=1
        )
        src = jnp.take(g.receivers, eidx)
        dst = jnp.take(g.senders, eidx)
        edge_rep = jnp.take(h, src, axis=0) + jnp.take(h, dst, axis=0)
        pred = inits.dense(
            self.num_edge_classes, self.emb_dim, "linear_pred_edges"
        )(edge_rep)
        loss = losses.masked_softmax_xent(pred, labels, emask)
        return loss, {"acc_edge": _masked_accuracy(pred, labels, emask)}
