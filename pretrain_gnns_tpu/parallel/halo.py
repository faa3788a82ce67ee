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
    return PackedGraphs(
        node_feat=reshape_nodes(packed.node_feat),
        edge_feat=route(ef),
        senders=route(snd),
        receivers=route(rcv),
        node_graph=reshape_nodes(packed.node_graph),
        node_mask=reshape_nodes(packed.node_mask),
        edge_mask=new_emask,
        graph_mask=np.broadcast_to(
            np.asarray(packed.graph_mask), (n_shards, G)
        ).copy(),
        y=(
            np.broadcast_to(
                np.asarray(packed.y), (n_shards,) + packed.y.shape
            ).copy()
            if packed.y is not None
            else None
        ),
        extras={},
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


def halo_gin_trunk(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    local: PackedGraphs,  # leaves WITHOUT the shard axis (inside shard_map)
    axis: str,
    num_layer: int,
    train: bool = False,
) -> jnp.ndarray:
    """chem GIN trunk (JK=last) with edge-partitioned halo execution.
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

    emask = local.edge_mask
    rcv_local = local.receivers - base
    for layer in range(num_layer):
        cp = params[f"gnns_{layer}"]
        e1, e2 = cp["edge_embedding1"], cp["edge_embedding2"]
        ee = jnp.take(e1, local.edge_feat[:, 0], axis=0) + jnp.take(
            e2, local.edge_feat[:, 1], axis=0
        )
        e_self = e1[SELF_LOOP_BOND_TYPE] + e2[0]

        # halo: reconstruct the full node table over ICI, gather senders
        h_full = jax.lax.all_gather(h, axis, tiled=True)  # [N, D]
        msg = jnp.take(h_full, local.senders, axis=0) + ee
        msg = msg * emask.astype(msg.dtype)[:, None]
        aggr = jax.ops.segment_sum(msg, rcv_local, num_segments=n_loc)
        aggr = aggr + (h + e_self) * local.node_mask[:, None]

        z = aggr @ cp["mlp_0"]["kernel"] + cp["mlp_0"]["bias"]
        z = jnp.maximum(z, 0.0)
        hconv = z @ cp["mlp_2"]["kernel"] + cp["mlp_2"]["bias"]

        bnp = params[f"batch_norms_{layer}"]
        if train:
            hconv = _bn_train(bnp, hconv, local.node_mask, axis)
        else:
            hconv = _bn_eval(bnp, batch_stats[f"batch_norms_{layer}"], hconv)
        if layer != num_layer - 1:
            hconv = jnp.maximum(hconv, 0.0)
        h = hconv * local.node_mask[:, None]
    return h


def make_halo_forward(
    mesh: Mesh,
    num_layer: int = 5,
    axis: str = "edge",
    train: bool = False,
):
    """jitted fn(variables, sharded_batch) -> node reps [n_shards, n_loc, D]."""

    def per_device(variables, local):
        local = jax.tree_util.tree_map(lambda a: a[0], local)
        h = halo_gin_trunk(
            variables["params"], variables.get("batch_stats", {}),
            local, axis, num_layer, train,
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
