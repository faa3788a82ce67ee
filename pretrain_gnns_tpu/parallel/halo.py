"""Edge-partitioned distributed message passing ("halo exchange").

The GNN analogue of context parallelism (SURVEY.md §5.7/§2.8): for packed
graphs too large for one device's memory/compute, the batched mega-graph's
NODE rows are sharded contiguously across a mesh axis and each device owns
the edges whose RECEIVER lands in its shard (scatter stays local).

v2 — boundary-only exchange (BASELINE.json north star: "exchanging boundary
node features all-to-all over ICI overlapped with local aggregation"):
``shard_packed`` precomputes, host-side, the per-(src, dst) shard lists of
*boundary* rows — the unique sender nodes that some remote shard's edges
reference. Each conv layer then moves only those rows with one tiled
``jax.lax.all_to_all`` over the mesh axis (comm volume = boundary rows,
not the full node table as in the v1 ``all_gather``), and the aggregation
is structured as two masked passes:

  1. local pass  — edges whose sender is shard-local: gather + segment-sum
     with NO data dependence on the collective, so XLA's latency-hiding
     scheduler overlaps it with the in-flight all-to-all;
  2. remote pass — edges whose sender arrived in the exchanged buffer.

Cross-device reductions:
- BatchNorm batch statistics: mask-weighted sums psum'd over the axis, so
  normalization matches the single-device reference exactly. In train mode
  the trunks also return the batch (mean, unbiased-var) pairs so
  ``make_halo_train_step`` can update running stats with torch momentum
  semantics (models/norm.py).
- Graph pooling: per-shard partial segment-sums into the full ``[G, D]``
  table, psum'd — every device ends with the replicated pooled output.

The executors reuse the exact parameter trees of ``models.chem.GNN`` /
``models.bio.GNN`` (same checkpoint layout, verified by equality tests)
rather than the flax modules, because the collectives must interleave with
the layer math.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pretrain_gnns_tpu.core.graphs import PackedGraphs
from pretrain_gnns_tpu.models.chem import SELF_LOOP_BOND_TYPE

BIO_SELF_LOOP_DIM = 7  # bio/model.py:43


def _run_positions(group_ids: np.ndarray) -> np.ndarray:
    """Position of each element within its (sorted, contiguous) group."""
    n = len(group_ids)
    if not n:
        return np.zeros(0, np.int64)
    starts = np.flatnonzero(np.diff(group_ids, prepend=-1))
    lens = np.diff(np.append(starts, n))
    return np.arange(n) - np.repeat(starts, lens)


def route_stats(packed: PackedGraphs,
                n_shards: int) -> Tuple[int, int]:
    """(max edges routed to one shard, max boundary rows on one (src, dst)
    pair) for this batch — the quantities that size the static halo
    buffers. Vectorized; no allocation of the routed arrays."""
    N = packed.node_feat.shape[0]
    n_loc = N // n_shards
    emask = np.asarray(packed.edge_mask)
    rcv = np.asarray(packed.receivers)[emask]
    snd = np.asarray(packed.senders)[emask]
    dst = rcv // n_loc
    src = snd // n_loc
    e_need = int(np.bincount(dst, minlength=n_shards).max(initial=0))
    rm = src != dst
    key = (dst[rm].astype(np.int64) * n_shards + src[rm]) * N + snd[rm]
    uk = np.unique(key)
    b_need = int(
        np.bincount(uk // N, minlength=n_shards * n_shards).max(initial=0)
    )
    return max(e_need, 1), max(b_need, 1)


def shard_packed(packed: PackedGraphs, n_shards: int,
                 e_loc: Optional[int] = None,
                 b_max: Optional[int] = None) -> PackedGraphs:
    """Host-side: reorganize a (numpy) PackedGraphs for edge-partitioned
    execution. Node rows are split into ``n_shards`` contiguous shards
    (N_pad must divide); edges are routed to their receiver's shard and
    padded per-shard to a common count. All leaves gain a leading
    ``[n_shards, ...]`` axis for ``shard_map`` with ``P(axis)``.

    ``e_loc`` / ``b_max`` fix the routed-edge and boundary-row buffer
    sizes — pass DATASET-level maxima (``HaloSharder``) so every batch of
    a run produces identical shapes and the jitted halo step compiles
    exactly once; omitted, they are sized to this batch (the r3 behavior,
    which recompiles on heavy-tailed data). ValueError if the batch
    exceeds a given size.

    Boundary metadata (extras, leading axis = shard axis):
      halo_send_idx    [n_shards, n_shards, b_max] — row ``[p, s]`` lists the
                       LOCAL node ids shard p must send to shard s (padded
                       with 0; padded slots are never indexed by receivers).
      halo_senders_ext [n_shards, e_loc] — per-edge sender index into the
                       EXTENDED local table ``concat(local_h, remote_h)``
                       where ``remote_h[p*b_max + j]`` is row j sent by
                       shard p.
      halo_send_counts [n_shards, n_shards] — valid (unpadded) entries of
                       each send list; ``counts[p, s]`` rows flow p->s. The
                       sum over s != p is the shard's exchanged-row volume
                       (test: boundary rows << N).

    ``senders`` keeps GLOBAL indices (used by the one residual all_gather in
    the bio center-node head)."""
    N = packed.node_feat.shape[0]
    if N % n_shards:
        raise ValueError(f"{N} nodes not divisible by {n_shards} shards")
    n_loc = N // n_shards

    snd = np.asarray(packed.senders)
    rcv = np.asarray(packed.receivers)
    emask = np.asarray(packed.edge_mask)
    ef = np.asarray(packed.edge_feat)

    # ---- receiver-shard routing (one stable sort; per-shard original
    # edge order preserved)
    valid = np.flatnonzero(emask)
    dst = rcv[valid] // n_loc
    order = np.argsort(dst, kind="stable")
    vsort = valid[order]
    dst_s = dst[order]
    e_counts = np.bincount(dst_s, minlength=n_shards)
    e_need = max(int(e_counts.max(initial=0)), 1)
    if e_loc is None:
        # round up for lane friendliness
        e_loc = (e_need + 127) // 128 * 128
    elif e_need > e_loc:
        raise ValueError(f"{e_need} routed edges > e_loc buffer {e_loc}")
    epos = _run_positions(dst_s)

    def route(arr, fill=0):
        out = np.full((n_shards, e_loc) + arr.shape[1:], fill, arr.dtype)
        out[dst_s, epos] = arr[vsort]
        return out

    new_emask = np.zeros((n_shards, e_loc), bool)
    new_emask[dst_s, epos] = True

    # ---- boundary send lists (unique remote senders per (src, dst)
    # shard pair), via one np.unique over a packed (dst, src, sender) key
    sg = snd[vsort]
    src_s = sg // n_loc
    rm = src_s != dst_s
    key = (dst_s[rm].astype(np.int64) * n_shards + src_s[rm]) * N + sg[rm]
    uk, inv = np.unique(key, return_inverse=True)
    u_sp = uk // N  # = dst * n_shards + src, sorted => groups contiguous
    u_snd = uk % N
    b_counts = np.bincount(u_sp, minlength=n_shards * n_shards)
    b_need = max(int(b_counts.max(initial=0)), 1)
    if b_max is None:
        b_max = max((b_need + 7) // 8 * 8, 8)
    elif b_need > b_max:
        raise ValueError(f"{b_need} boundary rows > b_max buffer {b_max}")
    upos = _run_positions(u_sp)

    u_dst = u_sp // n_shards
    u_src = u_sp % n_shards
    send_idx = np.zeros((n_shards, n_shards, b_max), np.int32)
    send_idx[u_src, u_dst, upos] = (u_snd - u_src * n_loc).astype(np.int32)
    counts = b_counts.reshape(n_shards, n_shards).T.astype(np.int32)

    senders_ext = np.zeros((n_shards, e_loc), np.int32)
    ext = np.where(rm, 0, sg - dst_s * n_loc)
    if len(uk):
        ext[rm] = n_loc + u_src[inv] * b_max + upos[inv]
    senders_ext[dst_s, epos] = ext

    reshape_nodes = lambda a: np.asarray(a).reshape(
        (n_shards, n_loc) + np.asarray(a).shape[1:]
    )
    bcast = lambda a: np.broadcast_to(
        np.asarray(a), (n_shards,) + np.asarray(a).shape
    ).copy()
    extras = {k: bcast(v) for k, v in (packed.extras or {}).items()}
    extras["halo_send_idx"] = send_idx
    extras["halo_senders_ext"] = senders_ext
    extras["halo_send_counts"] = counts
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
        extras=extras,
    )


def put_sharded(sharded: PackedGraphs, mesh: Mesh,
                axis: str = "edge") -> PackedGraphs:
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(np.asarray(a), sh), sharded
    )


class HaloSharder:
    """Static-shape halo sharding across heterogeneous batches.

    r3's ``shard_packed`` sized ``e_loc``/``b_max`` from the batch at
    hand, so heavy-tailed data (the giant-ego-network workload halo
    exists for) produced a new shard shape — and a full XLA recompile of
    the jitted halo step — every few batches. This wrapper derives the
    buffer sizes ONCE from dataset-level maxima (``reserve`` over any
    iterable of packed batches, e.g. the deterministic eval loaders plus
    one unshuffled pass over the train set) plus a slack factor, then
    emits identically-shaped shards for every batch. A batch exceeding
    the reserve (possible under reshuffled packing) grows the buffers —
    one amortized recompile, counted in ``regrows`` — instead of
    thrashing per batch."""

    def __init__(self, n_shards: int, mesh: Optional[Mesh] = None,
                 axis: str = "edge", slack: float = 1.25):
        self.n_shards = n_shards
        self.mesh = mesh
        self.axis = axis
        self.slack = slack
        self.e_loc: Optional[int] = None
        self.b_max: Optional[int] = None
        self.regrows = 0
        self.host_ms_per_batch: Optional[float] = None

    def _grow(self, e_need: int, b_need: int):
        if self.e_loc is not None:
            self.regrows += 1
        self.e_loc = (
            max(int(e_need * self.slack), 1) + 127
        ) // 128 * 128
        self.b_max = max(
            (max(int(b_need * self.slack), 1) + 7) // 8 * 8, 8
        )

    def reserve(self, batches) -> "HaloSharder":
        """Size the buffers from the maxima over ``batches`` (no routed
        arrays are built — route_stats only)."""
        e_need = b_need = 1
        for b in batches:
            e, bb = route_stats(b, self.n_shards)
            e_need, b_need = max(e_need, e), max(b_need, bb)
        prev = self.regrows
        self._grow(e_need, b_need)
        self.regrows = prev  # reserving is not a regrow
        return self

    def shard(self, batch: PackedGraphs) -> PackedGraphs:
        import time

        t0 = time.perf_counter()
        if self.e_loc is None:
            self._grow(*route_stats(batch, self.n_shards))
        try:
            # steady state: one routing pass (shard_packed validates the
            # buffers itself; a separate route_stats pre-pass would
            # double the host cost this class exists to minimize)
            out = shard_packed(batch, self.n_shards, self.e_loc,
                               self.b_max)
        except ValueError:
            self._grow(*route_stats(batch, self.n_shards))
            out = shard_packed(batch, self.n_shards, self.e_loc,
                               self.b_max)
        dt = (time.perf_counter() - t0) * 1e3
        self.host_ms_per_batch = (
            dt if self.host_ms_per_batch is None
            else 0.9 * self.host_ms_per_batch + 0.1 * dt
        )
        return out

    def shard_put(self, batch: PackedGraphs) -> PackedGraphs:
        if self.mesh is None:
            raise ValueError("HaloSharder built without a mesh")
        return put_sharded(self.shard(batch), self.mesh, self.axis)


# ---------------------------------------------------------------------------
# Exchange + overlap-structured aggregation primitives
# ---------------------------------------------------------------------------
def _exchange(x: jnp.ndarray, send_idx: jnp.ndarray,
              axis: str) -> jnp.ndarray:
    """Boundary exchange: each shard sends its rows ``x[send_idx[s]]`` to
    shard s; returns the remote table [n_shards * b_max, D] where block p
    holds the rows received from shard p. One tiled all_to_all over ICI."""
    n_shards = send_idx.shape[0]
    send = jnp.take(x, send_idx, axis=0)  # [n_shards, b_max, D]
    if n_shards > 1:
        send = jax.lax.all_to_all(
            send, axis, split_axis=0, concat_axis=0, tiled=True
        )
    return send.reshape(-1, x.shape[-1])


def _two_pass_sum(table, remote, ids_ext, edge_mask, rcv, n_loc,
                  combine: Callable[[jnp.ndarray], jnp.ndarray]):
    """Masked two-pass gather/segment-sum: the local pass has no data
    dependence on ``remote`` (the in-flight all_to_all), so XLA overlaps
    it with the exchange; the remote pass consumes the landed buffer."""
    is_loc = ids_ext < n_loc
    loc_ids = jnp.where(is_loc, ids_ext, 0)
    rem_ids = jnp.where(is_loc, 0, ids_ext - n_loc)
    m_loc = edge_mask & is_loc
    m_rem = edge_mask & ~is_loc
    msg = combine(jnp.take(table, loc_ids, axis=0))
    aggr = jax.ops.segment_sum(
        msg * m_loc.astype(msg.dtype)[:, None], rcv, num_segments=n_loc
    )
    msg_r = combine(jnp.take(remote, rem_ids, axis=0))
    return aggr + jax.ops.segment_sum(
        msg_r * m_rem.astype(msg_r.dtype)[:, None], rcv, num_segments=n_loc
    )


def _gather_ext(table, remote, ids_ext, n_loc):
    """where-combined gather from the extended (local ++ remote) table; used
    where both halves feed one non-linear op (GAT logits/softmax)."""
    is_loc = ids_ext < n_loc
    loc = jnp.take(table, jnp.where(is_loc, ids_ext, 0), axis=0)
    rem = jnp.take(remote, jnp.where(is_loc, 0, ids_ext - n_loc), axis=0)
    m = is_loc.reshape(is_loc.shape + (1,) * (loc.ndim - 1))
    return jnp.where(m, loc, rem)


# ---------------------------------------------------------------------------
# BatchNorm (torch semantics, cross-shard stats via psum)
# ---------------------------------------------------------------------------
def _bn_eval(p, stats, h):
    inv = jax.lax.rsqrt(stats["var"] + 1e-5)
    return (h - stats["mean"]) * inv * p["scale"] + p["bias"]


def _bn_train(p, h, mask, axis):
    """Returns (normalized, batch_mean, unbiased_batch_var) — the stats the
    train step folds into running stats (models/norm.py semantics)."""
    m = mask.astype(h.dtype)[:, None]
    n = jax.lax.psum(jnp.sum(m), axis)
    n = jnp.maximum(n, 1.0)
    mean = jax.lax.psum(jnp.sum(h * m, axis=0), axis) / n
    var = jax.lax.psum(jnp.sum(jnp.square(h - mean) * m, axis=0), axis) / n
    y = (h - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]
    unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
    return y, mean, unbiased


def _lin(p, x):
    return x @ p["kernel"] + p["bias"]


def _dropout(h, rate, rng, mask):
    keep = jax.random.bernoulli(rng, 1.0 - rate, h.shape)
    return jnp.where(keep, h / (1.0 - rate), 0.0) * mask[:, None]


# ---------------------------------------------------------------------------
# Chem conv families (parameter trees of models.chem.GNN)
# ---------------------------------------------------------------------------
def _chem_edge_embed(cp, local):
    ee = (jnp.take(cp["edge_embedding1"], local.edge_feat[:, 0], axis=0)
          + jnp.take(cp["edge_embedding2"], local.edge_feat[:, 1], axis=0))
    e_self = cp["edge_embedding1"][SELF_LOOP_BOND_TYPE] + \
        cp["edge_embedding2"][0]
    return ee, e_self


def _conv_gin(cp, h, local, snd_ext, send_idx, rcv_local, n_loc, axis):
    remote = _exchange(h, send_idx, axis)  # in flight during local pass
    ee, e_self = _chem_edge_embed(cp, local)
    aggr = _two_pass_sum(h, remote, snd_ext, local.edge_mask, rcv_local,
                         n_loc, lambda xj: xj + ee)
    aggr = aggr + (h + e_self) * local.node_mask[:, None]
    z = jnp.maximum(_lin(cp["mlp_0"], aggr), 0.0)
    return _lin(cp["mlp_2"], z)


def _conv_gcn(cp, h, local, snd_ext, send_idx, rcv_local, n_loc, axis):
    """chem/model.py:58-104; the scalar inverse-sqrt degree rides the same
    exchange as the projected features (one extra column)."""
    ones = local.edge_mask.astype(jnp.float32)
    deg = jax.ops.segment_sum(ones, rcv_local, num_segments=n_loc)
    deg = deg + local.node_mask.astype(jnp.float32)
    dis = jnp.where(deg > 0, jnp.where(deg > 0, deg, 1.0) ** -0.5, 0.0)
    x = _lin(cp["linear"], h)
    table = jnp.concatenate([x, dis[:, None]], axis=1)
    remote = _exchange(table, send_idx, axis)
    ee, e_self = _chem_edge_embed(cp, local)
    D = x.shape[1]
    dis_rcv = jnp.take(dis, rcv_local)

    def combine(rows):
        xj, dsnd = rows[:, :D], rows[:, D]
        return (dis_rcv * dsnd)[:, None] * (xj + ee)

    aggr = _two_pass_sum(table, remote, snd_ext, local.edge_mask,
                         rcv_local, n_loc, combine)
    self_w = (dis * dis)[:, None] * local.node_mask[:, None]
    return aggr + self_w * (x + e_self)


def _conv_gat(cp, h, local, snd_ext, send_idx, rcv_local, n_loc, axis,
              heads=2, slope=0.2):
    """chem/model.py:107-165: projections computed locally, one [b, H*D]
    boundary exchange, then logits/softmax/aggregation all shard-local (the
    receiver owns every edge of its softmax group)."""
    from pretrain_gnns_tpu.ops import segment as seg

    D = cp["bias"].shape[0]
    H = heads
    x_flat = _lin(cp["weight_linear"], h)  # [n_loc, H*D]
    remote = _exchange(x_flat, send_idx, axis)
    ee, e_self_flat = _chem_edge_embed(cp, local)
    e = ee.reshape(-1, H, D)
    e_self = e_self_flat.reshape(H, D)
    att = cp["att"]
    a_i, a_j = att[..., :D], att[..., D:]
    x = x_flat.reshape(-1, H, D)

    x_i = jnp.take(x, rcv_local, axis=0)
    x_j = _gather_ext(x_flat, remote, snd_ext, n_loc).reshape(-1, H, D) + e
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


def _conv_sage(cp, h, local, snd_ext, send_idx, rcv_local, n_loc, axis):
    """chem/model.py:168-202."""
    x = _lin(cp["linear"], h)
    remote = _exchange(x, send_idx, axis)
    ee, e_self = _chem_edge_embed(cp, local)
    s = _two_pass_sum(x, remote, snd_ext, local.edge_mask, rcv_local,
                      n_loc, lambda xj: xj + ee)
    s = s + (x + e_self) * local.node_mask[:, None]
    ones = local.edge_mask.astype(jnp.float32)
    deg = jax.ops.segment_sum(ones, rcv_local, num_segments=n_loc)
    deg = deg + local.node_mask.astype(jnp.float32)
    mean = s / jnp.maximum(deg, 1.0)[:, None]
    # double-where: sqrt'(0)=inf on all-zero padded rows would turn the
    # zero cotangent into NaN (see models/chem.py SAGEConv)
    sq = jnp.sum(jnp.square(mean), axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    return jnp.where(sq > 0, mean / jnp.maximum(norm, 1e-12), 0.0)


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
    drop_ratio: float = 0.0,
    drop_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """chem trunk (JK=last, models.chem.GNN parameter tree) with
    edge-partitioned boundary-exchange execution for any conv family.
    Returns ``(local node reps [n_loc, D], batch-stat dict)`` — the stats
    are the per-layer BN (mean, unbiased var) pairs in train mode ({} in
    eval), mirroring models.chem.GNN's batch_stats tree."""
    n_loc = local.node_feat.shape[0]
    snd_ext = local.extras["halo_senders_ext"]
    send_idx = local.extras["halo_send_idx"]
    my = jax.lax.axis_index(axis)
    base = my * n_loc

    x = (
        jnp.take(params["x_embedding1"], local.node_feat[:, 0], axis=0)
        + jnp.take(params["x_embedding2"], local.node_feat[:, 1], axis=0)
    )
    h = x * local.node_mask[:, None]
    conv = _CHEM_CONVS[gnn_type]

    rcv_local = local.receivers - base
    new_stats: Dict[str, Any] = {}
    for layer in range(num_layer):
        cp = params[f"gnns_{layer}"]
        hconv = conv(cp, h, local, snd_ext, send_idx, rcv_local, n_loc,
                     axis)
        bnp = params[f"batch_norms_{layer}"]
        if train:
            hconv, bmean, bvar = _bn_train(bnp, hconv, local.node_mask,
                                           axis)
            new_stats[f"batch_norms_{layer}"] = {"mean": bmean,
                                                 "var": bvar}
        else:
            hconv = _bn_eval(bnp, batch_stats[f"batch_norms_{layer}"],
                             hconv)
        if layer != num_layer - 1:
            hconv = jnp.maximum(hconv, 0.0)
        if train and drop_ratio > 0.0 and drop_rng is not None:
            hconv = _dropout(hconv, drop_ratio,
                             jax.random.fold_in(drop_rng, layer),
                             local.node_mask)
        h = hconv * local.node_mask[:, None]
    return h, new_stats


# Backwards-compatible alias (original GIN-only entry point)
def halo_gin_trunk(params, batch_stats, local, axis, num_layer,
                   train=False):
    return halo_chem_trunk(params, batch_stats, local, axis, num_layer,
                           train, gnn_type="gin")[0]


# ---------------------------------------------------------------------------
# Bio conv families (parameter trees of models.bio.GNN)
# ---------------------------------------------------------------------------
def _bio_edge_encode(cp, local):
    enc_k, enc_b = cp["edge_encoder"]["kernel"], cp["edge_encoder"]["bias"]
    e = local.edge_feat @ enc_k + enc_b
    e_self = enc_k[BIO_SELF_LOOP_DIM] + enc_b
    return e, e_self


def _bio_input_embed(cp, local):
    emb = cp["input_node_embeddings"]
    h = jnp.take(emb, local.node_feat[:, 0].astype(jnp.int32), axis=0)
    return h * local.node_mask[:, None]


def _bio_conv_gin(cp, h, local, snd_ext, send_idx, rcv_local, n_loc, axis,
                  layer, train, batch_stats, new_stats):
    if layer == 0:
        h = _bio_input_embed(cp, local)
    remote = _exchange(h, send_idx, axis)
    e, e_self = _bio_edge_encode(cp, local)
    aggr = _two_pass_sum(
        h, remote, snd_ext, local.edge_mask, rcv_local, n_loc,
        lambda xj: jnp.concatenate([xj, e], axis=-1),
    )
    self_msg = jnp.concatenate(
        [h, jnp.broadcast_to(e_self, h.shape)], axis=-1
    )
    aggr = aggr + self_msg * local.node_mask[:, None]
    z = _lin(cp["mlp_0"], aggr)
    bnp = cp["mlp_1"]
    if train:
        z, bmean, bvar = _bn_train(bnp, z, local.node_mask, axis)
        new_stats[f"gnns_{layer}"] = {"mlp_1": {"mean": bmean,
                                                "var": bvar}}
    else:
        z = _bn_eval(bnp, batch_stats[f"gnns_{layer}"]["mlp_1"], z)
    z = jnp.maximum(z, 0.0)
    return _lin(cp["mlp_3"], z)


def _bio_conv_gcn(cp, h, local, snd_ext, send_idx, rcv_local, n_loc, axis,
                  layer, train, batch_stats, new_stats):
    """bio/model.py:61-114 (Linear edge encoder; self-loop one-hot dim 7)."""
    if layer == 0:
        h = _bio_input_embed(cp, local)
    ones = local.edge_mask.astype(jnp.float32)
    deg = jax.ops.segment_sum(ones, rcv_local, num_segments=n_loc)
    deg = deg + local.node_mask.astype(jnp.float32)
    dis = jnp.where(deg > 0, jnp.where(deg > 0, deg, 1.0) ** -0.5, 0.0)
    x = _lin(cp["linear"], h)
    table = jnp.concatenate([x, dis[:, None]], axis=1)
    remote = _exchange(table, send_idx, axis)
    e, e_self = _bio_edge_encode(cp, local)
    D = x.shape[1]
    dis_rcv = jnp.take(dis, rcv_local)

    def combine(rows):
        xj, dsnd = rows[:, :D], rows[:, D]
        return (dis_rcv * dsnd)[:, None] * (xj + e)

    aggr = _two_pass_sum(table, remote, snd_ext, local.edge_mask,
                         rcv_local, n_loc, combine)
    self_w = (dis * dis)[:, None] * local.node_mask[:, None]
    return aggr + self_w * (x + e_self)


def _bio_conv_gat(cp, h, local, snd_ext, send_idx, rcv_local, n_loc, axis,
                  layer, train, batch_stats, new_stats, heads=2, slope=0.2):
    """bio/model.py:117-180 (edge encoder emits H*D features)."""
    from pretrain_gnns_tpu.ops import segment as seg

    if layer == 0:
        h = _bio_input_embed(cp, local)
    D = cp["bias"].shape[0]
    H = heads
    x_flat = _lin(cp["weight_linear"], h)
    remote = _exchange(x_flat, send_idx, axis)
    e_flat, e_self_flat = _bio_edge_encode(cp, local)
    e = e_flat.reshape(-1, H, D)
    e_self = e_self_flat.reshape(H, D)
    att = cp["att"]
    a_i, a_j = att[..., :D], att[..., D:]
    x = x_flat.reshape(-1, H, D)

    x_i = jnp.take(x, rcv_local, axis=0)
    x_j = _gather_ext(x_flat, remote, snd_ext, n_loc).reshape(-1, H, D) + e
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


def _bio_conv_sage(cp, h, local, snd_ext, send_idx, rcv_local, n_loc, axis,
                   layer, train, batch_stats, new_stats):
    """bio/model.py:183-224."""
    if layer == 0:
        h = _bio_input_embed(cp, local)
    x = _lin(cp["linear"], h)
    remote = _exchange(x, send_idx, axis)
    e, e_self = _bio_edge_encode(cp, local)
    s = _two_pass_sum(x, remote, snd_ext, local.edge_mask, rcv_local,
                      n_loc, lambda xj: xj + e)
    s = s + (x + e_self) * local.node_mask[:, None]
    ones = local.edge_mask.astype(jnp.float32)
    deg = jax.ops.segment_sum(ones, rcv_local, num_segments=n_loc)
    deg = deg + local.node_mask.astype(jnp.float32)
    mean = s / jnp.maximum(deg, 1.0)[:, None]
    # double-where: sqrt'(0)=inf on all-zero padded rows would turn the
    # zero cotangent into NaN (see models/chem.py SAGEConv)
    sq = jnp.sum(jnp.square(mean), axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    return jnp.where(sq > 0, mean / jnp.maximum(norm, 1e-12), 0.0)


_BIO_CONVS = {"gin": _bio_conv_gin, "gcn": _bio_conv_gcn,
              "gat": _bio_conv_gat, "graphsage": _bio_conv_sage}


def halo_bio_trunk(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    local: PackedGraphs,
    axis: str,
    num_layer: int,
    train: bool = False,
    gnn_type: str = "gin",
    drop_ratio: float = 0.0,
    drop_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """bio trunk (models.bio.GNN parameter tree; bio/model.py:227-290) with
    boundary-exchange halo execution for all four conv families: Linear(9)
    edge encoder, layer-0 input embedding, no trunk BN (bio GIN's BN lives
    inside its MLP). The halo pattern is the point of the executor: bio
    ego-networks are the 'giant graph' case (SURVEY.md §5.7)."""
    n_loc = local.node_feat.shape[0]
    snd_ext = local.extras["halo_senders_ext"]
    send_idx = local.extras["halo_send_idx"]
    my = jax.lax.axis_index(axis)
    rcv_local = local.receivers - my * n_loc
    conv = _BIO_CONVS[gnn_type]

    h = local.node_feat.astype(jnp.float32)
    new_stats: Dict[str, Any] = {}
    for layer in range(num_layer):
        cp = params[f"gnns_{layer}"]
        hconv = conv(cp, h, local, snd_ext, send_idx, rcv_local, n_loc,
                     axis, layer, train, batch_stats, new_stats)
        if layer != num_layer - 1:
            hconv = jnp.maximum(hconv, 0.0)
        if train and drop_ratio > 0.0 and drop_rng is not None:
            hconv = _dropout(hconv, drop_ratio,
                             jax.random.fold_in(drop_rng, layer),
                             local.node_mask)
        h = hconv * local.node_mask[:, None]
    return h, new_stats


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
        trunk = halo_bio_trunk if domain == "bio" else halo_chem_trunk
        h, _ = trunk(
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


# ---------------------------------------------------------------------------
# Graph-level heads + losses (chem masked BCE / bio plain BCE)
# ---------------------------------------------------------------------------
def _halo_graphpred_logits(variables, local, axis, num_layer, train,
                           gnn_type, domain, drop_ratio=0.0, drop_rng=None):
    """Per-device: trunk -> psum'd mean pool (++ center rep for bio) ->
    linear head. Returns (replicated logits [G, T], batch-stat tree)."""
    trunk_fn = halo_bio_trunk if domain == "bio" else halo_chem_trunk
    h, tstats = trunk_fn(
        variables["params"]["gnn"],
        variables.get("batch_stats", {}).get("gnn", {}),
        local, axis, num_layer, train, gnn_type, drop_ratio, drop_rng,
    )
    G = local.graph_mask.shape[0]
    m = local.node_mask.astype(h.dtype)
    s = jax.ops.segment_sum(h * m[:, None], local.node_graph,
                            num_segments=G)
    cnt = jax.ops.segment_sum(m, local.node_graph, num_segments=G)
    pooled = jax.lax.psum(s, axis) / jnp.maximum(
        jax.lax.psum(cnt, axis), 1.0
    )[:, None]
    if domain == "bio":
        # centers are arbitrary global node ids: one residual [N, D] gather
        # per forward (not per layer)
        h_full = jax.lax.all_gather(h, axis, tiled=True)
        center = local.extras["center_node_idx"].reshape(-1)[:G]
        center_rep = jnp.take(h_full, center, axis=0)
        pooled = jnp.concatenate([pooled, center_rep], axis=1)
    head = variables["params"]["graph_pred_linear"]
    logits = pooled @ head["kernel"] + head["bias"]
    return logits, ({"gnn": tstats} if tstats else {})


def make_halo_graphpred_apply(
    mesh: Mesh,
    num_layer: int = 5,
    axis: str = "edge",
    gnn_type: str = "gin",
    domain: str = "chem",
):
    """jitted eval fn(variables, sharded_batch) -> logits [G, T]
    (replicated; running-stat BN)."""

    def per_device(variables, local):
        local = jax.tree_util.tree_map(lambda a: a[0], local)
        logits, _ = _halo_graphpred_logits(
            variables, local, axis, num_layer, False, gnn_type, domain
        )
        return logits

    return jax.jit(
        shard_map(per_device, mesh=mesh, in_specs=(P(), P(axis)),
                  out_specs=P())
    )


def _loss_of(domain):
    from pretrain_gnns_tpu.objectives import losses

    return losses.plain_bce if domain == "bio" else losses.masked_task_bce


def make_halo_graphpred_loss(
    mesh: Mesh,
    num_layer: int = 5,
    axis: str = "edge",
    gnn_type: str = "gin",
    domain: str = "chem",
):
    """jitted fn(graphpred_variables, sharded_batch) -> scalar BCE (chem
    masked multi-task / bio plain), eval-mode BN, all cross-shard
    reductions via psum."""
    loss_of = _loss_of(domain)

    def per_device(variables, local):
        local = jax.tree_util.tree_map(lambda a: a[0], local)
        logits, _ = _halo_graphpred_logits(
            variables, local, axis, num_layer, False, gnn_type, domain
        )
        loss = loss_of(logits, local.y, local.graph_mask)
        # identical on all shards already (y/graph_mask are broadcast
        # copies); pmean makes the replication provable to shard_map
        return jax.lax.pmean(loss, axis)

    return jax.jit(
        shard_map(per_device, mesh=mesh, in_specs=(P(), P(axis)),
                  out_specs=P())
    )


def make_halo_bio_graphpred_loss(mesh: Mesh, num_layer: int = 5,
                                 axis: str = "edge"):
    return make_halo_graphpred_loss(mesh, num_layer, axis, "gin", "bio")


def make_halo_train_step(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    num_layer: int = 5,
    axis: str = "edge",
    gnn_type: str = "gin",
    domain: str = "chem",
    drop_ratio: float = 0.0,
    bn_momentum: float = 0.1,
):
    """Full optimizer step under halo execution: train-mode BN (cross-shard
    psum statistics), gradients flowing through the collectives (shard_map
    transpose psums the replicated-parameter cotangents), optax update, and
    torch-momentum running-stat refresh. Signature matches
    train.finetune.make_train_step: (TrainState, sharded batch) ->
    (TrainState, loss)."""
    loss_of = _loss_of(domain)

    def loss_sharded(params, batch_stats, local_sharded, drop_rng):
        def per_device(params, batch_stats, local, drop_rng):
            local = jax.tree_util.tree_map(lambda a: a[0], local)
            rng = (jax.random.fold_in(drop_rng, jax.lax.axis_index(axis))
                   if drop_ratio > 0.0 else None)
            logits, bstats = _halo_graphpred_logits(
                {"params": params, "batch_stats": batch_stats},
                local, axis, num_layer, True, gnn_type, domain,
                drop_ratio, rng,
            )
            loss = loss_of(logits, local.y, local.graph_mask)
            return jax.lax.pmean(loss, axis), \
                jax.tree_util.tree_map(lambda s: jax.lax.pmean(s, axis),
                                       bstats)

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=(P(), P()),
        )(params, batch_stats, local_sharded, drop_rng)

    @jax.jit
    def step(state, local_sharded):
        rng, drop_rng = jax.random.split(state.rng)

        def lf(params):
            return loss_sharded(params, state.batch_stats, local_sharded,
                                drop_rng)

        (loss, bstats), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        batch_stats = state.batch_stats
        if jax.tree_util.tree_leaves(bstats):
            batch_stats = jax.tree_util.tree_map(
                lambda old, new: (1.0 - bn_momentum) * old
                + bn_momentum * new,
                state.batch_stats, bstats,
            )
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=batch_stats,
            opt_state=opt_state, rng=rng,
        )
        return new_state, loss

    return step
