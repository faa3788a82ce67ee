"""Chem-domain GNN model family (molecular graphs).

Re-implements the numerics of the reference chem models
(/root/reference/chem/model.py) on packed static-shape batches:

- ``GINConv``   — chem/model.py:15-55   (msg = x_j + e, sum aggr, MLP update)
- ``GCNConv``   — chem/model.py:58-104  (sym-norm with self-loops in degree)
- ``GATConv``   — chem/model.py:107-165 (2 heads, segment softmax, head mean)
- ``SAGEConv``  — chem/model.py:168-202 (mean aggr, L2-normalize update)
- ``GNN``       — chem/model.py:206-290 (atom embeddings, BN, JK modes)
- ``GNNGraphPred`` — chem/model.py:293-369 (pool + linear head)

TPU-first deviation: the reference appends explicit self-loop edges with a
synthetic bond feature (type 4, dir 0) inside every conv
(chem/model.py:39-45). Here the self-loop contribution is computed
analytically as an elementwise term — exactly equivalent for sum/mean
aggregation and for the GAT softmax (the self edge enters the normalizer as
one extra logit) — so the scatter only ever runs over real edges.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pretrain_gnns_tpu.core.graphs import PackedGraphs
from pretrain_gnns_tpu.models import inits
from pretrain_gnns_tpu.models.norm import MaskedBatchNorm
from pretrain_gnns_tpu.models import pools
from pretrain_gnns_tpu.ops import attention
from pretrain_gnns_tpu.ops import segment as seg
from pretrain_gnns_tpu.ops import spmm

NUM_ATOM_TYPE = 120  # incl. mask token 119 (chem/model.py:9)
NUM_CHIRALITY_TAG = 3
NUM_BOND_TYPE = 6  # incl. self-loop 4 and mask token 5 (chem/model.py:12)
NUM_BOND_DIRECTION = 3
SELF_LOOP_BOND_TYPE = 4  # chem/model.py:43


def _edge_embed(mod: nn.Module, edge_feat: jnp.ndarray, dim: int):
    """Shared conv preamble: embed integer bond features and produce the
    synthetic self-loop embedding (bond type 4, direction 0)."""
    e1 = mod.param(
        "edge_embedding1", inits.xavier_uniform, (NUM_BOND_TYPE, dim)
    )
    e2 = mod.param(
        "edge_embedding2", inits.xavier_uniform, (NUM_BOND_DIRECTION, dim)
    )
    e = inits.embed(e1, edge_feat[:, 0]) + inits.embed(
        e2, edge_feat[:, 1]
    )
    e_self = e1[SELF_LOOP_BOND_TYPE] + e2[0]
    return e, e_self


def _edge_embed_fused(mod: nn.Module, edge_feat: jnp.ndarray, dim: int):
    """Same embeddings in fused form for the Pallas SpMM: per-edge one-hot
    bond features ``ein`` [E, 9] and the stacked tables ``W = [e1; e2]``,
    so that ``ein @ W == Embed(bond_type) + Embed(bond_dir)`` exactly."""
    e1 = mod.param(
        "edge_embedding1", inits.xavier_uniform, (NUM_BOND_TYPE, dim)
    )
    e2 = mod.param(
        "edge_embedding2", inits.xavier_uniform, (NUM_BOND_DIRECTION, dim)
    )
    ein = jnp.concatenate(
        [
            jax.nn.one_hot(edge_feat[:, 0], NUM_BOND_TYPE, dtype=e1.dtype),
            jax.nn.one_hot(
                edge_feat[:, 1], NUM_BOND_DIRECTION, dtype=e1.dtype
            ),
        ],
        axis=1,
    )
    W = jnp.concatenate([e1, e2], axis=0)
    e_self = e1[SELF_LOOP_BOND_TYPE] + e2[0]
    return ein, W, e_self


_DenseParams = inits.DenseParams


class GINConv(nn.Module):
    """chem/model.py:15-55."""

    emb_dim: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, g: PackedGraphs) -> jnp.ndarray:
        ein, W, e_self = _edge_embed_fused(self, g.edge_feat, self.emb_dim)
        blocked = g.block_nodes > 0 and g.block_edges > 0
        from pretrain_gnns_tpu.ops import pallas_gin

        if pallas_gin.use_fused_conv(blocked):
            # whole-conv fused kernel: aggregation + self term + the GIN
            # MLP in one pallas_call (docs/PERFORMANCE.md §1 — the step
            # is op-count-bound, not kernel-bound)
            k0, b0 = _DenseParams(2 * self.emb_dim, self.emb_dim,
                                  name="mlp_0")()
            k2, b2 = _DenseParams(self.emb_dim, 2 * self.emb_dim,
                                  name="mlp_2")()
            cdt = (jnp.float32 if spmm._DTYPE == "float32"
                   else jnp.bfloat16)
            return pallas_gin.fused_gin_conv(
                h, ein, W, e_self, k0, b0, k2, b2, g.senders,
                g.receivers, g.edge_mask.astype(jnp.float32),
                g.node_mask, g.block_nodes, g.block_edges, cdt,
                not spmm._on_tpu(),
            )
        aggr = spmm.gather_scatter(
            h, None, g.senders, g.receivers, g.edge_mask, g.max_nodes,
            block_nodes=g.block_nodes, block_edges=g.block_edges,
            edge_in=ein, edge_kernel=W,
        )
        aggr = aggr + (h + e_self.astype(h.dtype)) * g.node_mask[:, None]
        # mlp.{0,2} naming mirrors the torch Sequential (chem/model.py:29)
        z = inits.dense(2 * self.emb_dim, self.emb_dim, "mlp_0")(aggr)
        z = nn.relu(z)
        return inits.dense(self.emb_dim, 2 * self.emb_dim, "mlp_2")(z)


class GCNConv(nn.Module):
    """chem/model.py:58-104. Degree includes the self-loop; isolated padded
    nodes get deg 0 -> inv-sqrt 0 (the reference's inf->0 clamp)."""

    emb_dim: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, g: PackedGraphs) -> jnp.ndarray:
        ein, W, e_self = _edge_embed_fused(self, g.edge_feat, self.emb_dim)
        deg = g.in_degree(include_self_loop=True).astype(jnp.float32)
        dis = jnp.where(deg > 0, jnp.where(deg > 0, deg, 1.0) ** -0.5, 0.0)
        norm = jnp.take(dis, g.receivers) * jnp.take(dis, g.senders)
        x = inits.dense(self.emb_dim, self.emb_dim, "linear")(h)
        aggr = spmm.gather_scatter(
            x, None, g.senders, g.receivers, g.edge_mask, g.max_nodes,
            edge_weight=norm,
            block_nodes=g.block_nodes, block_edges=g.block_edges,
            edge_in=ein, edge_kernel=W,
        )
        self_w = (dis * dis)[:, None] * g.node_mask[:, None]
        self_term = self_w * (x.astype(jnp.float32) + e_self)
        return aggr + self_term.astype(aggr.dtype)


class GATConv(nn.Module):
    """chem/model.py:107-165. The self-loop participates in the attention
    softmax as an extra per-node logit."""

    emb_dim: int
    heads: int = 2
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, h: jnp.ndarray, g: PackedGraphs) -> jnp.ndarray:
        H, D = self.heads, self.emb_dim
        blocked = g.block_nodes > 0 and g.block_edges > 0
        from pretrain_gnns_tpu.ops import pallas_gat_conv, pallas_gin

        if pallas_gin.use_fused_conv(blocked):
            # whole-conv fused kernel: projection, in-kernel edge
            # embeds, softmax, aggregation, head mean — no [E, H, D]
            # HBM tensors (docs/PERFORMANCE.md §3 r5)
            ein, We, e_self_flat = _edge_embed_fused(
                self, g.edge_feat, H * D
            )
            att = self.param("att", inits.pyg_glorot, (1, H, 2 * D))
            bias = self.param("bias", nn.initializers.zeros, (D,))
            Wl, bl = _DenseParams(H * D, D, name="weight_linear")()
            cdt = (jnp.float32 if spmm._DTYPE == "float32"
                   else jnp.bfloat16)
            return pallas_gat_conv.fused_gat_conv(
                h.astype(jnp.float32), Wl, bl, ein, We,
                e_self_flat.reshape(H, D),
                att[0, :, :D], att[0, :, D:], bias,
                g.senders, g.receivers,
                g.edge_mask.astype(jnp.float32),
                (H, D), (g.block_nodes, g.block_edges), cdt,
                not spmm._on_tpu(),
            )

        e_flat, e_self_flat = _edge_embed(self, g.edge_feat, H * D)
        e = e_flat.reshape(-1, H, D)
        e_self = e_self_flat.reshape(H, D)
        att = self.param("att", inits.pyg_glorot, (1, H, 2 * D))
        bias = self.param("bias", nn.initializers.zeros, (D,))

        # attention runs in f32 (logit stability); mixed precision applies
        # to the message-passing convs, not the 2-head attention path
        x = inits.dense(H * D, D, "weight_linear")(h)
        x = x.astype(jnp.float32).reshape(-1, H, D)
        a_i, a_j = att[..., :D], att[..., D:]  # [1, H, D] each

        out = attention.gat_attention(
            x, e, e_self, a_i, a_j, g.senders, g.receivers, g.edge_mask,
            g.max_nodes, self.negative_slope,
            block_nodes=g.block_nodes, block_edges=g.block_edges,
        )
        return jnp.mean(out, axis=1) + bias  # head mean (chem/model.py:162)


class SAGEConv(nn.Module):
    """chem/model.py:168-202: mean aggregation (self-loop included in the
    denominator), then L2 normalization."""

    emb_dim: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, g: PackedGraphs) -> jnp.ndarray:
        ein, W, e_self = _edge_embed_fused(self, g.edge_feat, self.emb_dim)
        x = inits.dense(self.emb_dim, self.emb_dim, "linear")(h)
        s = spmm.gather_scatter(
            x, None, g.senders, g.receivers, g.edge_mask, g.max_nodes,
            block_nodes=g.block_nodes, block_edges=g.block_edges,
            edge_in=ein, edge_kernel=W,
        )
        s = s + (x + e_self.astype(x.dtype)) * g.node_mask[:, None]
        deg = g.in_degree(include_self_loop=True).astype(jnp.float32)
        mean = s.astype(jnp.float32) / jnp.maximum(deg, 1.0)[:, None]
        # torch F.normalize eps; computed in f32, returned in compute
        # dtype. The double-where guards sqrt'(0)=inf on all-zero padded
        # rows — their ZERO cotangent would otherwise become NaN
        # (0 * inf) and poison the whole gradient.
        sq = jnp.sum(jnp.square(mean), axis=-1, keepdims=True)
        norm = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
        out = jnp.where(sq > 0, mean / jnp.maximum(norm, 1e-12), 0.0)
        return out.astype(s.dtype)


_CONVS = {"gin": GINConv, "gcn": GCNConv, "gat": GATConv,
          "graphsage": SAGEConv}


class GNN(nn.Module):
    """Node-representation trunk (chem/model.py:206-290)."""

    num_layer: int = 5
    emb_dim: int = 300
    jk: str = "last"  # last | concat | max | sum
    drop_ratio: float = 0.0
    gnn_type: str = "gin"

    @nn.compact
    def __call__(
        self, g: PackedGraphs, train: bool = False
    ) -> jnp.ndarray:
        if self.num_layer < 2:
            raise ValueError("Number of GNN layers must be greater than 1.")
        emb1 = self.param(
            "x_embedding1", inits.xavier_uniform,
            (NUM_ATOM_TYPE, self.emb_dim),
        )
        emb2 = self.param(
            "x_embedding2", inits.xavier_uniform,
            (NUM_CHIRALITY_TAG, self.emb_dim),
        )
        x = inits.embed(emb1, g.node_feat[:, 0]) + inits.embed(
            emb2, g.node_feat[:, 1]
        )
        x = x * g.node_mask[:, None]  # keep padded rows exactly zero
        x = inits.downcast(x)  # activations flow in the compute dtype

        conv_cls = _CONVS[self.gnn_type]
        h_list = [x]
        h = x
        for layer in range(self.num_layer):
            h = conv_cls(self.emb_dim, name=f"gnns_{layer}")(h, g)
            h = MaskedBatchNorm(self.emb_dim, name=f"batch_norms_{layer}")(
                h, g.node_mask, use_running_average=not train
            )
            if layer != self.num_layer - 1:
                h = nn.relu(h)
            h = nn.Dropout(self.drop_ratio, deterministic=not train)(h)
            h = h * g.node_mask[:, None]
            h_list.append(h)

        if self.jk == "last":
            return h_list[-1]
        if self.jk == "concat":
            return jnp.concatenate(h_list, axis=1)
        stack = jnp.stack(h_list, axis=0)
        if self.jk == "max":
            return jnp.max(stack, axis=0)
        if self.jk == "sum":
            return jnp.sum(stack, axis=0)
        raise ValueError(f"unknown JK mode {self.jk!r}")


class GNNGraphPred(nn.Module):
    """Graph-level prediction head (chem/model.py:293-369)."""

    num_layer: int = 5
    emb_dim: int = 300
    num_tasks: int = 1
    jk: str = "last"
    drop_ratio: float = 0.0
    graph_pooling: str = "mean"
    gnn_type: str = "gin"

    def jk_dim(self) -> int:
        mult = self.num_layer + 1 if self.jk == "concat" else 1
        return mult * self.emb_dim

    @nn.compact
    def __call__(
        self, g: PackedGraphs, train: bool = False
    ) -> jnp.ndarray:
        h = GNN(
            self.num_layer, self.emb_dim, self.jk, self.drop_ratio,
            self.gnn_type, name="gnn",
        )(g, train=train)

        d = self.jk_dim()
        gp = self.graph_pooling
        if gp == "sum":
            pooled = pools.sum_pool(h, g)
        elif gp == "mean":
            pooled = pools.mean_pool(h, g)
        elif gp == "max":
            pooled = pools.max_pool(h, g)
        elif gp == "attention":
            pooled = pools.GlobalAttentionPool(d, name="pool")(h, g)
        elif gp[:-1] == "set2set":
            pooled = pools.Set2SetPool(d, int(gp[-1]), name="pool")(h, g)
            d = 2 * d
        else:
            raise ValueError("Invalid graph pooling type.")

        return inits.dense(self.num_tasks, d, "graph_pred_linear")(pooled)
