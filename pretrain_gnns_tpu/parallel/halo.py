"""Edge-partitioned distributed message passing ("halo exchange").

The GNN analogue of context parallelism (SURVEY.md §5.7/§2.8): for packed
graphs too large for one device's memory/compute, the batched mega-graph's
NODE rows are sharded contiguously across a mesh axis and each device owns
the edges whose RECEIVER lands in its shard (scatter stays local). Sender
features can live on any shard, so each conv layer first reconstructs the
full node-feature table with ``jax.lax.all_gather`` over ICI (the v1 halo:
gather-everything; a boundary-only exchange is a later optimization), then
gathers senders locally and segment-sums into the local receivers.

Cross-device reductions:
- BatchNorm batch statistics: mask-weighted sums psum'd over the axis, so
  normalization matches the single-device reference exactly.
- Graph pooling: per-shard partial segment-sums into the full ``[G, D]``
  table, psum'd — every device ends with the replicated pooled output.

The executor reuses the exact chem-GIN parameter tree of
``models.chem.GNN`` (same checkpoint layout, verified by equality tests)
rather than the flax module, because the collectives must interleave with
the layer math.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pretrain_gnns_tpu.core.graphs import PackedGraphs
from pretrain_gnns_tpu.models.chem import SELF_LOOP_BOND_TYPE


def shard_packed(packed: PackedGraphs, n_shards: int) -> PackedGraphs:
    """Host-side: reorganize a (numpy) PackedGraphs for edge-partitioned
    execution. Node rows are split into ``n_shards`` contiguous shards
    (N_pad must divide); edges are routed to their receiver's shard and
    padded per-shard to a common count. All leaves gain a leading
    ``[n_shards, ...]`` axis for ``shard_map`` with ``P(axis)``.
    Senders/receivers stay GLOBAL indices."""
    N = packed.node_feat.shape[0]
    G = packed.max_graphs
    if N % n_shards:
        raise ValueError(f"{N} nodes not divisible by {n_shards} shards")
    n_loc = N // n_shards

    snd = np.asarray(packed.senders)
    rcv = np.asarray(packed.receivers)
    emask = np.asarray(packed.edge_mask)
    ef = np.asarray(packed.edge_feat)

    owner = rcv // n_loc
    per_shard = [np.where(emask & (owner == s))[0] for s in range(n_shards)]
    e_loc = max(int(max(len(ix) for ix in per_shard)), 1)
    # round up for lane friendliness
    e_loc = (e_loc + 127) // 128 * 128

    def route(arr, fill=0):
        out = np.full((n_shards, e_loc) + arr.shape[1:], fill, arr.dtype)
        for s, ix in enumerate(per_shard):
            out[s, : len(ix)] = arr[ix]
        return out

    new_emask = np.zeros((n_shards, e_loc), bool)
    for s, ix in enumerate(per_shard):
        new_emask[s, : len(ix)] = True

    reshape_nodes = lambda a: np.asarray(a).reshape(
        (n_shards, n_loc) + np.asarray(a).shape[1:]
    )
    bcast = lambda a: np.broadcast_to(
        np.asarray(a), (n_shards,) + np.asarray(a).shape
    ).copy()
    return PackedGraphs(
        node_feat=reshape_nodes(packed.node_feat),
        edge_feat=route(ef),
        senders=route(snd),
        receivers=route(rcv),
        node_graph=reshape_nodes(packed.node_graph),
        node_mask=reshape_nodes(packed.node_mask),
        edge_mask=new_emask,
        graph_mask=bcast(packed.graph_mask),
        y=bcast(packed.y) if packed.y is not None else None,
        # per-graph extras (center_node_idx with GLOBAL node ids, labels,
        # species) are small: replicate on every shard
        extras={k: bcast(v) for k, v in (packed.extras or {}).items()},
    )


def put_sharded(sharded: PackedGraphs, mesh: Mesh,
                axis: str = "edge") -> PackedGraphs:
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(np.asarray(a), sh), sharded
    )


# ---------------------------------------------------------------------------
# Distributed chem-GIN trunk (parameter tree of models.chem.GNN)
# ---------------------------------------------------------------------------
def _bn_eval(p, stats, h):
    inv = jax.lax.rsqrt(stats["var"] + 1e-5)
    return (h - stats["mean"]) * inv * p["scale"] + p["bias"]


def _bn_train(p, h, mask, axis):
    m = mask.astype(h.dtype)[:, None]
    n = jax.lax.psum(jnp.sum(m), axis)
    mean = jax.lax.psum(jnp.sum(h * m, axis=0), axis) / jnp.maximum(n, 1.0)
    var = jax.lax.psum(
        jnp.sum(jnp.square(h - mean) * m, axis=0), axis
    ) / jnp.maximum(n, 1.0)
    return (h - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def _lin(p, x):
    return x @ p["kernel"] + p["bias"]


def _conv_gin(cp, h, h_full, local, rcv_local, n_loc, axis, train,
              bn_stats):
    ee = (jnp.take(cp["edge_embedding1"], local.edge_feat[:, 0], axis=0)
          + jnp.take(cp["edge_embedding2"], local.edge_feat[:, 1], axis=0))
    e_self = cp["edge_embedding1"][SELF_LOOP_BOND_TYPE] + \
        cp["edge_embedding2"][0]
    msg = jnp.take(h_full, local.senders, axis=0) + ee
    msg = msg * local.edge_mask.astype(msg.dtype)[:, None]
    aggr = jax.ops.segment_sum(msg, rcv_local, num_segments=n_loc)
    aggr = aggr + (h + e_self) * local.node_mask[:, None]
    z = jnp.maximum(_lin(cp["mlp_0"], aggr), 0.0)
    return _lin(cp["mlp_2"], z)


def _conv_gcn(cp, h, h_unused, local, rcv_local, n_loc, axis, train,
              bn_stats):
    """chem/model.py:58-104 with a second (scalar) halo for remote inverse
    sqrt degrees."""
    ee = (jnp.take(cp["edge_embedding1"], local.edge_feat[:, 0], axis=0)
          + jnp.take(cp["edge_embedding2"], local.edge_feat[:, 1], axis=0))
    e_self = cp["edge_embedding1"][SELF_LOOP_BOND_TYPE] + \
        cp["edge_embedding2"][0]
    ones = local.edge_mask.astype(jnp.float32)
    deg = jax.ops.segment_sum(ones, rcv_local, num_segments=n_loc)
    deg = deg + local.node_mask.astype(jnp.float32)
    dis = jnp.where(deg > 0, jnp.where(deg > 0, deg, 1.0) ** -0.5, 0.0)
    dis_full = jax.lax.all_gather(dis, axis, tiled=True)  # [N]
    x = _lin(cp["linear"], h)
    x_full = jax.lax.all_gather(x, axis, tiled=True)
    norm = jnp.take(dis, rcv_local) * jnp.take(dis_full, local.senders)
    msg = norm[:, None] * (jnp.take(x_full, local.senders, axis=0) + ee)
    msg = msg * ones[:, None]
    aggr = jax.ops.segment_sum(msg, rcv_local, num_segments=n_loc)
    self_w = (dis * dis)[:, None] * local.node_mask[:, None]
    return aggr + self_w * (x + e_self)


def _conv_gat(cp, h, h_unused, local, rcv_local, n_loc, axis, train,
              bn_stats, heads=2, slope=0.2):
    """chem/model.py:107-165: projections computed locally, one [N, H*D]
    halo gather, then logits/softmax/aggregation all shard-local (the
    receiver owns every edge of its softmax group)."""
    D = cp["bias"].shape[0]
    H = heads
    ee = (jnp.take(cp["edge_embedding1"], local.edge_feat[:, 0], axis=0)
          + jnp.take(cp["edge_embedding2"], local.edge_feat[:, 1], axis=0))
    e = ee.reshape(-1, H, D)
    e_self = (cp["edge_embedding1"][SELF_LOOP_BOND_TYPE]
              + cp["edge_embedding2"][0]).reshape(H, D)
    att = cp["att"]
    a_i, a_j = att[..., :D], att[..., D:]
    x = _lin(cp["weight_linear"], h).reshape(-1, H, D)
    x_full = jax.lax.all_gather(
        x.reshape(n_loc, H * D), axis, tiled=True
    ).reshape(-1, H, D)

    from pretrain_gnns_tpu.ops import segment as seg

    x_i = jnp.take(x, rcv_local, axis=0)
    x_j = jnp.take(x_full, local.senders, axis=0) + e
    logits = jax.nn.leaky_relu(
        jnp.sum(x_i * a_i + x_j * a_j, axis=-1), slope
    )
    x_self = x + e_self
    self_logits = jax.nn.leaky_relu(
        jnp.sum(x * a_i + x_self * a_j, axis=-1), slope
    )
    p, p_self = seg.segment_softmax(
        logits, rcv_local, n_loc, mask=local.edge_mask,
        extra_logit=self_logits,
    )
    out = seg.segment_sum(
        p[..., None] * x_j, rcv_local, n_loc, mask=local.edge_mask
    )
    out = out + p_self[..., None] * x_self
    return jnp.mean(out, axis=1) + cp["bias"]


def _conv_sage(cp, h, h_unused, local, rcv_local, n_loc, axis, train,
               bn_stats):
    """chem/model.py:168-202."""
    ee = (jnp.take(cp["edge_embedding1"], local.edge_feat[:, 0], axis=0)
          + jnp.take(cp["edge_embedding2"], local.edge_feat[:, 1], axis=0))
    e_self = cp["edge_embedding1"][SELF_LOOP_BOND_TYPE] + \
        cp["edge_embedding2"][0]
    x = _lin(cp["linear"], h)
    x_full = jax.lax.all_gather(x, axis, tiled=True)
    msg = jnp.take(x_full, local.senders, axis=0) + ee
    msg = msg * local.edge_mask.astype(msg.dtype)[:, None]
    s = jax.ops.segment_sum(msg, rcv_local, num_segments=n_loc)
    s = s + (x + e_self) * local.node_mask[:, None]
    ones = local.edge_mask.astype(jnp.float32)
    deg = jax.ops.segment_sum(ones, rcv_local, num_segments=n_loc)
    deg = deg + local.node_mask.astype(jnp.float32)
    mean = s / jnp.maximum(deg, 1.0)[:, None]
    norm = jnp.sqrt(jnp.sum(jnp.square(mean), axis=-1, keepdims=True))
    return mean / jnp.maximum(norm, 1e-12)


_CHEM_CONVS = {"gin": _conv_gin, "gcn": _conv_gcn, "gat": _conv_gat,
               "graphsage": _conv_sage}


def halo_chem_trunk(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    local: PackedGraphs,  # leaves WITHOUT the shard axis (inside shard_map)
    axis: str,
    num_layer: int,
    train: bool = False,
    gnn_type: str = "gin",
) -> jnp.ndarray:
    """chem trunk (JK=last, models.chem.GNN parameter tree) with
    edge-partitioned halo execution for any conv family.
    ``local.senders``/``receivers`` are global; returns the LOCAL node-rep
    shard [n_loc, D]."""
    n_loc = local.node_feat.shape[0]
    my = jax.lax.axis_index(axis)
    base = my * n_loc

    x = (
        jnp.take(params["x_embedding1"], local.node_feat[:, 0], axis=0)
        + jnp.take(params["x_embedding2"], local.node_feat[:, 1], axis=0)
    )
    h = x * local.node_mask[:, None]
    conv = _CHEM_CONVS[gnn_type]

    rcv_local = local.receivers - base
    for layer in range(num_layer):
        cp = params[f"gnns_{layer}"]
        # halo: reconstruct the full node table over ICI
        h_full = jax.lax.all_gather(h, axis, tiled=True)  # [N, D]
        hconv = conv(cp, h, h_full, local, rcv_local, n_loc, axis, train,
                     batch_stats)
        bnp = params[f"batch_norms_{layer}"]
        if train:
            hconv = _bn_train(bnp, hconv, local.node_mask, axis)
        else:
            hconv = _bn_eval(bnp, batch_stats[f"batch_norms_{layer}"], hconv)
        if layer != num_layer - 1:
            hconv = jnp.maximum(hconv, 0.0)
        h = hconv * local.node_mask[:, None]
    return h


# Backwards-compatible alias (original GIN-only entry point)
def halo_gin_trunk(params, batch_stats, local, axis, num_layer,
                   train=False):
    return halo_chem_trunk(params, batch_stats, local, axis, num_layer,
                           train, gnn_type="gin")


def halo_bio_trunk(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    local: PackedGraphs,
    axis: str,
    num_layer: int,
    train: bool = False,
) -> jnp.ndarray:
    """bio GIN trunk (models.bio.GNN parameter tree; bio/model.py:11-58,
    227-290): concat(x_j, e) messages, Linear(9) edge encoder, BN inside
    the MLP, layer-0 input embedding, no trunk BN. The halo pattern is the
    same as chem — the point of the executor: bio ego-networks are the
    'giant graph' case (SURVEY.md §5.7)."""
    n_loc = local.node_feat.shape[0]
    my = jax.lax.axis_index(axis)
    base = my * n_loc
    rcv_local = local.receivers - base

    h = local.node_feat.astype(jnp.float32)
    for layer in range(num_layer):
        cp = params[f"gnns_{layer}"]
        if layer == 0:
            emb = cp["input_node_embeddings"]
            h = jnp.take(emb, h[:, 0].astype(jnp.int32), axis=0)
            h = h * local.node_mask[:, None]
        enc_k, enc_b = cp["edge_encoder"]["kernel"], \
            cp["edge_encoder"]["bias"]
        e = local.edge_feat @ enc_k + enc_b
        e_self = enc_k[7] + enc_b  # one-hot self-loop dim (bio/model.py:43)

        h_full = jax.lax.all_gather(h, axis, tiled=True)
        msg = jnp.concatenate(
            [jnp.take(h_full, local.senders, axis=0), e], axis=-1
        )
        msg = msg * local.edge_mask.astype(msg.dtype)[:, None]
        aggr = jax.ops.segment_sum(msg, rcv_local, num_segments=n_loc)
        self_msg = jnp.concatenate(
            [h, jnp.broadcast_to(e_self, h.shape)], axis=-1
        )
        aggr = aggr + self_msg * local.node_mask[:, None]

        z = _lin(cp["mlp_0"], aggr)
        bnp = cp["mlp_1"]
        if train:
            z = _bn_train(bnp, z, local.node_mask, axis)
        else:
            z = _bn_eval(bnp, batch_stats[f"gnns_{layer}"]["mlp_1"], z)
        z = jnp.maximum(z, 0.0)
        hconv = _lin(cp["mlp_3"], z)
        if layer != num_layer - 1:
            hconv = jnp.maximum(hconv, 0.0)
        h = hconv * local.node_mask[:, None]
    return h


def make_halo_forward(
    mesh: Mesh,
    num_layer: int = 5,
    axis: str = "edge",
    train: bool = False,
    gnn_type: str = "gin",
    domain: str = "chem",
):
    """jitted fn(variables, sharded_batch) -> node reps [n_shards, n_loc, D]."""

    def per_device(variables, local):
        local = jax.tree_util.tree_map(lambda a: a[0], local)
        if domain == "bio":
            if gnn_type != "gin":
                raise NotImplementedError(
                    "bio halo executor currently implements GIN (the "
                    "protocol default)"
                )
            h = halo_bio_trunk(
                variables["params"], variables.get("batch_stats", {}),
                local, axis, num_layer, train,
            )
        else:
            h = halo_chem_trunk(
                variables["params"], variables.get("batch_stats", {}),
                local, axis, num_layer, train, gnn_type,
            )
        return h[None]

    return jax.jit(
        shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=P(axis),
        )
    )


def make_halo_graphpred_loss(
    mesh: Mesh,
    num_layer: int = 5,
    axis: str = "edge",
):
    """jitted fn(graphpred_variables, sharded_batch) -> scalar masked BCE,
    with mean pooling + linear head (models.chem.GNNGraphPred layout) and
    all cross-shard reductions via psum."""
    from pretrain_gnns_tpu.objectives import losses

    def per_device(variables, local):
        local = jax.tree_util.tree_map(lambda a: a[0], local)
        trunk = {
            "params": variables["params"]["gnn"],
            "batch_stats": variables.get("batch_stats", {}).get("gnn", {}),
        }
        h = halo_gin_trunk(
            trunk["params"], trunk["batch_stats"], local, axis, num_layer,
            train=False,
        )
        G = local.graph_mask.shape[0]
        m = local.node_mask.astype(h.dtype)
        s = jax.ops.segment_sum(h * m[:, None], local.node_graph,
                                num_segments=G)
        cnt = jax.ops.segment_sum(m, local.node_graph, num_segments=G)
        s = jax.lax.psum(s, axis)
        cnt = jax.lax.psum(cnt, axis)
        pooled = s / jnp.maximum(cnt, 1.0)[:, None]
        head = variables["params"]["graph_pred_linear"]
        logits = pooled @ head["kernel"] + head["bias"]
        loss = losses.masked_task_bce(logits, local.y, local.graph_mask)
        # identical on all shards already (y/graph_mask are broadcast
        # copies); pmean makes the replication provable to shard_map
        return jax.lax.pmean(loss, axis)

    return jax.jit(
        shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=P(),
        )
    )


def make_halo_bio_graphpred_loss(
    mesh: Mesh,
    num_layer: int = 5,
    axis: str = "edge",
):
    """Bio fine-tune loss under halo execution: mean pool (psum'd partial
    segment sums) ++ center-node representation (one final [N, D] gather,
    centers are global node ids replicated per shard) -> Linear(2D, T),
    plain BCE (bio/finetune.py:25-37; head layout models.bio.GNNGraphPred)."""
    from pretrain_gnns_tpu.objectives import losses

    def per_device(variables, local):
        local = jax.tree_util.tree_map(lambda a: a[0], local)
        h = halo_bio_trunk(
            variables["params"]["gnn"],
            variables.get("batch_stats", {}).get("gnn", {}),
            local, axis, num_layer, train=False,
        )
        G = local.graph_mask.shape[0]
        m = local.node_mask.astype(h.dtype)
        s = jax.ops.segment_sum(h * m[:, None], local.node_graph,
                                num_segments=G)
        cnt = jax.ops.segment_sum(m, local.node_graph, num_segments=G)
        pooled = jax.lax.psum(s, axis) / jnp.maximum(
            jax.lax.psum(cnt, axis), 1.0
        )[:, None]
        h_full = jax.lax.all_gather(h, axis, tiled=True)
        center = local.extras["center_node_idx"].reshape(-1)[:G]
        center_rep = jnp.take(h_full, center, axis=0)
        graph_rep = jnp.concatenate([pooled, center_rep], axis=1)
        head = variables["params"]["graph_pred_linear"]
        logits = graph_rep @ head["kernel"] + head["bias"]
        loss = losses.plain_bce(logits, local.y, local.graph_mask)
        return jax.lax.pmean(loss, axis)

    return jax.jit(
        shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=P(),
        )
    )
