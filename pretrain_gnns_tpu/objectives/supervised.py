"""Supervised pretraining as a run_pretrain objective.

The reference's supervised stage (chem/pretrain_supervised.py:24-43 on
1310 ChEMBL tasks; bio/pretrain_supervised.py:25-42 on coarse GO terms)
is a GNNGraphPred trained with the domain's BCE. Wrapping it in the
(loss, metrics) objective contract lets the supervised stage ride the
SAME production pipeline as the SSL objectives — device-resident dataset
(labels ship in the resident ``y`` table), whole-epoch scan, DP
composition — instead of the per-batch host-packed loop.

The GraphPred lives under submodule name ``pred`` (trunk at
``params["pred"]["gnn"]``); ``TRUNK_PATH`` is the contract the CLI and
``run_pretrain``'s trunk grafting use.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pretrain_gnns_tpu.core.graphs import PackedGraphs
from pretrain_gnns_tpu.objectives import losses

TRUNK_PATH = ("pred", "gnn")


class SupervisedObjective(nn.Module):
    num_tasks: int = 1
    num_layer: int = 5
    emb_dim: int = 300
    jk: str = "last"
    drop_ratio: float = 0.0
    gnn_type: str = "gin"
    graph_pooling: str = "mean"
    domain: str = "chem"  # chem: masked multi-task BCE | bio: plain BCE

    @nn.compact
    def __call__(
        self, g: PackedGraphs, train: bool = False
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        if self.domain == "bio":
            from pretrain_gnns_tpu.models import bio as bio_models

            pred_cls = bio_models.GNNGraphPred
        else:
            from pretrain_gnns_tpu.models.chem import GNNGraphPred

            pred_cls = GNNGraphPred
        out = pred_cls(
            num_layer=self.num_layer, emb_dim=self.emb_dim,
            num_tasks=self.num_tasks, jk=self.jk,
            drop_ratio=self.drop_ratio,
            graph_pooling=self.graph_pooling, gnn_type=self.gnn_type,
            name="pred",
        )(g, train=train)
        loss_of = (losses.plain_bce if self.domain == "bio"
                   else losses.masked_task_bce)
        return loss_of(out, g.y, g.graph_mask), {}
