"""Bio-domain GNN model family (protein ego-networks).

Re-implements /root/reference/bio/model.py on packed batches:

- ``GINConv``  — bio/model.py:11-58  (msg = concat(x_j, e); MLP has an
  internal BatchNorm: Linear(2D,2D) -> BN -> ReLU -> Linear(2D,D))
- ``GCNConv``  — bio/model.py:61-114
- ``GATConv``  — bio/model.py:117-180
- ``SAGEConv`` — bio/model.py:183-224
- ``GNN``      — bio/model.py:227-290 (no trunk-level embeddings or BN;
  layer 0 embeds the uniform input labels inside the conv)
- ``GNNGraphPred`` — bio/model.py:293-347 (pool ++ center-node rep ->
  Linear(2D, num_tasks))

Edge features are 9-dim float ``[w1..w7, self_loop, mask]``
(bio/loader.py:56-68); every conv encodes them with Linear(9, D) and the
synthetic self-loop feature is one-hot at dim 7 (bio/model.py:42-43), whose
embedding is computed analytically (encoder column 7 + bias) instead of
materializing self-loop edges.

Deviation note: the reference's JK="sum" is broken by a copy-paste ``[0]``
(bio/model.py:288 indexes the summed tensor, yielding one row); we implement
the intended layer-sum. JK="last" (the protocol default) is unaffected.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pretrain_gnns_tpu.core.graphs import PackedGraphs
from pretrain_gnns_tpu.models import inits
from pretrain_gnns_tpu.models.norm import MaskedBatchNorm
from pretrain_gnns_tpu.models import pools
from pretrain_gnns_tpu.ops import attention
from pretrain_gnns_tpu.ops import segment as seg
from pretrain_gnns_tpu.ops import spmm

EDGE_FEAT_DIM = 9
SELF_LOOP_DIM = 7  # bio/model.py:43


def _input_embed(mod: nn.Module, x: jnp.ndarray, dim: int):
    """Layer-0 input embedding of the uniform node labels
    (bio/model.py:30-33, 49-51): Embed(2, dim) over x.long()."""
    emb = mod.param(
        "input_node_embeddings", inits.xavier_uniform, (2, dim)
    )
    return inits.downcast(inits.embed(emb, x[:, 0].astype(jnp.int32)))


class GINConv(nn.Module):
    """bio/model.py:11-58."""

    emb_dim: int
    input_layer: bool = False

    @nn.compact
    def __call__(self, h, g: PackedGraphs, train: bool = False):
        D = self.emb_dim
        ein, W, e_self = _edge_encode_fused(self, g.edge_feat, D)
        if self.input_layer:
            h = _input_embed(self, h, D)
            h = h * g.node_mask[:, None]
        aggr = spmm.gather_scatter(
            h, None, g.senders, g.receivers, g.edge_mask, g.max_nodes,
            combine="concat",
            block_nodes=g.block_nodes, block_edges=g.block_edges,
            edge_in=ein, edge_kernel=W,
        )
        self_msg = jnp.concatenate(
            [h, jnp.broadcast_to(e_self.astype(h.dtype), h.shape)], axis=-1
        )
        aggr = aggr + self_msg * g.node_mask[:, None]
        z = inits.dense(2 * D, 2 * D, "mlp_0")(aggr)
        z = MaskedBatchNorm(2 * D, name="mlp_1")(
            z, g.node_mask, use_running_average=not train
        )
        z = nn.relu(z)
        return inits.dense(D, 2 * D, "mlp_3")(z)


def _edge_encode_lazy(mod, edge_feat, dim):
    """Linear(9 -> dim) edge encoder; the self-loop embedding is computed
    analytically as encoder-weight column SELF_LOOP_DIM + bias."""
    enc = inits.dense(dim, EDGE_FEAT_DIM, "edge_encoder")
    e = enc(edge_feat)
    kernel = mod.get_variable("params", "edge_encoder")["kernel"]
    bias = mod.get_variable("params", "edge_encoder")["bias"]
    return e, kernel[SELF_LOOP_DIM] + bias


_DenseParams = inits.DenseParams


def _edge_encode_fused(mod, edge_feat, dim):
    """The same Linear(9 -> dim) encoder in fused form for the Pallas SpMM:
    ``ein = [edge_feat | 1]`` and ``W = [kernel; bias]`` so that
    ``ein @ W == edge_feat @ kernel + bias`` exactly; the embedding never
    materializes in HBM on the kernel path."""
    kernel, bias = _DenseParams(dim, EDGE_FEAT_DIM, name="edge_encoder")()
    ein = jnp.concatenate(
        [edge_feat.astype(kernel.dtype),
         jnp.ones((edge_feat.shape[0], 1), kernel.dtype)], axis=1
    )
    W = jnp.concatenate([kernel, bias[None, :]], axis=0)
    return ein, W, kernel[SELF_LOOP_DIM] + bias


class GCNConv(nn.Module):
    """bio/model.py:61-114."""

    emb_dim: int
    input_layer: bool = False

    @nn.compact
    def __call__(self, h, g: PackedGraphs, train: bool = False):
        ein, W, e_self = _edge_encode_fused(self, g.edge_feat, self.emb_dim)
        if self.input_layer:
            h = _input_embed(self, h, self.emb_dim)
            h = h * g.node_mask[:, None]
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
    """bio/model.py:117-180."""

    emb_dim: int
    input_layer: bool = False
    heads: int = 2
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, h, g: PackedGraphs, train: bool = False):
        H, D = self.heads, self.emb_dim
        if self.input_layer:
            h = _input_embed(self, h, D)
            h = h * g.node_mask[:, None]
        blocked = g.block_nodes > 0 and g.block_edges > 0
        from pretrain_gnns_tpu.ops import pallas_gat_conv, pallas_gin
        from pretrain_gnns_tpu.ops import spmm as spmm_mod

        if pallas_gin.use_fused_conv(blocked):
            # whole-conv fused GAT kernel (ops/pallas_gat_conv.py): the
            # Linear(9->H*D) encoder rides the kernel as [feat | 1] @
            # [kernel; bias]
            ein, We, e_self_flat = _edge_encode_fused(
                self, g.edge_feat, H * D
            )
            att = self.param("att", inits.pyg_glorot, (1, H, 2 * D))
            bias = self.param("bias", nn.initializers.zeros, (D,))
            Wl, bl = _DenseParams(H * D, D, name="weight_linear")()
            cdt = (jnp.float32 if spmm_mod._DTYPE == "float32"
                   else jnp.bfloat16)
            return pallas_gat_conv.fused_gat_conv(
                h.astype(jnp.float32), Wl, bl, ein, We,
                e_self_flat.reshape(H, D), att[0, :, :D], att[0, :, D:],
                bias, g.senders, g.receivers,
                g.edge_mask.astype(jnp.float32),
                (H, D), (g.block_nodes, g.block_edges), cdt,
                not spmm_mod._on_tpu(),
            )
        e_flat, e_self_flat = _edge_encode_lazy(self, g.edge_feat, H * D)
        e = e_flat.reshape(-1, H, D)
        e_self = e_self_flat.reshape(H, D)
        att = self.param("att", inits.pyg_glorot, (1, H, 2 * D))
        bias = self.param("bias", nn.initializers.zeros, (D,))
        # attention runs in f32 (logit stability), as in chem
        x = inits.dense(H * D, D, "weight_linear")(h)
        x = x.astype(jnp.float32).reshape(-1, H, D)
        a_i, a_j = att[..., :D], att[..., D:]

        out = attention.gat_attention(
            x, e, e_self, a_i, a_j, g.senders, g.receivers, g.edge_mask,
            g.max_nodes, self.negative_slope,
            block_nodes=g.block_nodes, block_edges=g.block_edges,
        )
        return jnp.mean(out, axis=1) + bias


class SAGEConv(nn.Module):
    """bio/model.py:183-224."""

    emb_dim: int
    input_layer: bool = False

    @nn.compact
    def __call__(self, h, g: PackedGraphs, train: bool = False):
        ein, W, e_self = _edge_encode_fused(self, g.edge_feat, self.emb_dim)
        if self.input_layer:
            h = _input_embed(self, h, self.emb_dim)
            h = h * g.node_mask[:, None]
        x = inits.dense(self.emb_dim, self.emb_dim, "linear")(h)
        s = spmm.gather_scatter(
            x, None, g.senders, g.receivers, g.edge_mask, g.max_nodes,
            block_nodes=g.block_nodes, block_edges=g.block_edges,
            edge_in=ein, edge_kernel=W,
        )
        s = s + (x + e_self.astype(x.dtype)) * g.node_mask[:, None]
        deg = g.in_degree(include_self_loop=True).astype(jnp.float32)
        mean = s.astype(jnp.float32) / jnp.maximum(deg, 1.0)[:, None]
        # double-where: sqrt'(0)=inf on all-zero padded rows would turn
        # their zero cotangent into NaN (see models/chem.py SAGEConv)
        sq = jnp.sum(jnp.square(mean), axis=-1, keepdims=True)
        norm = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
        out = jnp.where(sq > 0, mean / jnp.maximum(norm, 1e-12), 0.0)
        return out.astype(s.dtype)


_CONVS = {"gin": GINConv, "gcn": GCNConv, "gat": GATConv,
          "graphsage": SAGEConv}


class GNN(nn.Module):
    """bio/model.py:227-290. Signature matches the chem trunk so objectives
    can swap trunks (``trunk=bio.GNN``)."""

    num_layer: int = 5
    emb_dim: int = 300
    jk: str = "last"
    drop_ratio: float = 0.0
    gnn_type: str = "gin"

    @nn.compact
    def __call__(self, g: PackedGraphs, train: bool = False) -> jnp.ndarray:
        if self.num_layer < 2:
            raise ValueError("Number of GNN layers must be greater than 1.")
        conv_cls = _CONVS[self.gnn_type]
        h = g.node_feat.astype(jnp.float32)
        h_list = [h]
        for layer in range(self.num_layer):
            conv = conv_cls(self.emb_dim, input_layer=(layer == 0),
                            name=f"gnns_{layer}")
            h = conv(h_list[-1], g, train=train)
            if layer != self.num_layer - 1:
                h = nn.relu(h)
            h = nn.Dropout(self.drop_ratio, deterministic=not train)(h)
            h = h * g.node_mask[:, None]
            h_list.append(h)
        if self.jk == "last":
            return h_list[-1]
        if self.jk == "sum":  # intended semantics; see module docstring
            return sum(h_list[1:])
        raise ValueError(f"bio trunk supports JK last|sum, got {self.jk!r}")


class GNNGraphPred(nn.Module):
    """bio/model.py:293-347: pooled rep ++ center-node rep -> linear."""

    num_layer: int = 5
    emb_dim: int = 300
    num_tasks: int = 1
    jk: str = "last"
    drop_ratio: float = 0.0
    graph_pooling: str = "mean"
    gnn_type: str = "gin"

    @nn.compact
    def __call__(self, g: PackedGraphs, train: bool = False) -> jnp.ndarray:
        h = GNN(self.num_layer, self.emb_dim, self.jk, self.drop_ratio,
                self.gnn_type, name="gnn")(g, train=train)
        gp = self.graph_pooling
        if gp == "sum":
            pooled = pools.sum_pool(h, g)
        elif gp == "mean":
            pooled = pools.mean_pool(h, g)
        elif gp == "max":
            pooled = pools.max_pool(h, g)
        elif gp == "attention":
            pooled = pools.GlobalAttentionPool(self.emb_dim, name="pool")(h, g)
        else:
            raise ValueError("Invalid graph pooling type.")
        center = g.extras["center_node_idx"]
        center_rep = jnp.take(h, center, axis=0)  # [G, D]
        graph_rep = jnp.concatenate([pooled, center_rep], axis=1)
        return inits.dense(
            self.num_tasks, 2 * self.emb_dim, "graph_pred_linear"
        )(graph_rep)
