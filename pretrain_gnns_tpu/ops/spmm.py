"""Fused gather→message→segment-aggregate — the message-passing hot loop.

This is the TPU-native replacement for torch-scatter's CUDA kernels behind
``MessagePassing.propagate`` (reference: chem/model.py:49-55 and every conv).
One call computes, for each node ``i``::

    out[i] = aggr_{e : receivers[e] == i} message(x[senders[e]], edge_emb[e])

with ``message`` either ``x_j + e`` (chem convs, chem/model.py:51-52) or
``concat(x_j, e)`` (bio GIN, bio/model.py:54-55), optionally scaled by a
per-edge weight (GCN norm, chem/model.py:103-104), and ``aggr`` in
{sum, mean}.

Implementations:
- ``_xla``: jnp take + segment_sum. XLA lowers to dynamic-gather +
  scatter-add; correct for any packing, baseline performance.
- Pallas block-diagonal one-hot-matmul kernel
  (``pretrain_gnns_tpu.ops.pallas_spmm``): used when the batch was packed
  with ``pack_graphs_blocked`` (block_nodes/block_edges > 0) and the
  backend allows it. Select via ``set_backend`` / env
  ``PGT_SPMM_BACKEND`` in {auto, xla, pallas}: ``auto`` uses Pallas on TPU
  for blocked batches; ``pallas`` forces it everywhere (interpret mode off
  TPU — for tests); ``xla`` disables it.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from pretrain_gnns_tpu.ops import segment as seg

_BACKEND = os.environ.get("PGT_SPMM_BACKEND", "auto")
# kernel compute dtype for the one-hot matmuls: bf16 is ~4x faster than
# f32-HIGHEST on the MXU; parity tests pin f32 via set_compute_dtype
_DTYPE = os.environ.get("PGT_SPMM_DTYPE", "bfloat16")


def set_compute_dtype(name: str) -> None:
    global _DTYPE
    if name not in ("float32", "bfloat16"):
        raise ValueError(name)
    _DTYPE = name


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in ("auto", "xla", "pallas"):
        raise ValueError(name)
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def gather_scatter(
    x: jnp.ndarray,  # [N, F] node features
    edge_emb: Optional[jnp.ndarray],  # [E, F] per-edge embedding (or None)
    senders: jnp.ndarray,  # [E] int32
    receivers: jnp.ndarray,  # [E] int32
    edge_mask: jnp.ndarray,  # [E] bool
    num_nodes: int,
    combine: str = "add",  # "add" | "concat"
    aggr: str = "sum",  # "sum" | "mean"
    edge_weight: Optional[jnp.ndarray] = None,  # [E]
    block_nodes: int = 0,
    block_edges: int = 0,
    edge_in: Optional[jnp.ndarray] = None,  # [E, K] tiny per-edge inputs
    edge_kernel: Optional[jnp.ndarray] = None,  # [K, F] tables/encoder
) -> jnp.ndarray:
    """See module docstring. Returns [N, F] (or [N, 2F] for concat).

    When ``(edge_in, edge_kernel)`` are given instead of ``edge_emb``, the
    per-edge embedding is ``edge_in @ edge_kernel`` — identical numerics
    (embedding lookup == one-hot matmul), but on the Pallas path it is
    computed inside the kernel so the [E, F] embedding (and its gradient)
    never touches HBM.
    """
    fused = edge_in is not None and edge_kernel is not None
    assert not (fused and edge_emb is not None)
    blocked = block_nodes > 0 and block_edges > 0
    use_pallas = _BACKEND == "pallas" or (
        _BACKEND == "auto" and _on_tpu()
    )
    if blocked and use_pallas and aggr == "sum":
        from pretrain_gnns_tpu.ops import pallas_spmm

        interpret = not _on_tpu()
        cdt = jnp.float32 if _DTYPE == "float32" else jnp.bfloat16
        w = edge_mask.astype(jnp.float32)
        if edge_weight is not None:
            w = w * edge_weight
        if combine == "add" and fused:
            return pallas_spmm.blocked_spmm_fused(
                x, edge_in, edge_kernel, senders, receivers, w,
                block_nodes, block_edges, cdt, interpret, True, True,
            )
        if combine == "add" and edge_emb is None:
            return pallas_spmm.blocked_spmm_fused(
                x, None, None, senders, receivers, w,
                block_nodes, block_edges, cdt, interpret, True, False,
            )
        if combine == "add":
            return pallas_spmm.gather_scatter_add(
                x, edge_emb, senders, receivers, edge_mask, num_nodes,
                edge_weight=edge_weight, block_nodes=block_nodes,
                block_edges=block_edges, compute_dtype=cdt,
                interpret=interpret,
            )
        if combine == "concat":
            # concat(x_j, e) summed per receiver splits into two halves:
            # scatter of x_j (spmm without ee) ++ scatter of e alone.
            left = pallas_spmm.blocked_spmm_fused(
                x, None, None, senders, receivers, w,
                block_nodes, block_edges, cdt, interpret, True, False,
            )
            if fused:
                right = pallas_spmm.blocked_spmm_fused(
                    x, edge_in, edge_kernel, senders, receivers, w,
                    block_nodes, block_edges, cdt, interpret, False, True,
                )
            else:
                right = pallas_spmm.gather_scatter_add(
                    jnp.zeros_like(x[:, :edge_emb.shape[1]]), edge_emb,
                    senders, receivers, edge_mask, num_nodes,
                    edge_weight=edge_weight, block_nodes=block_nodes,
                    block_edges=block_edges, compute_dtype=cdt,
                    interpret=interpret,
                )
            return jnp.concatenate([left, right], axis=-1)
    if fused:
        edge_emb = edge_in @ edge_kernel
    return _xla(
        x, edge_emb, senders, receivers, edge_mask, num_nodes,
        combine, aggr, edge_weight,
    )


def edge_dot(
    x: jnp.ndarray,  # [N, F]
    a_idx: jnp.ndarray,  # [P] int32
    b_idx: jnp.ndarray,  # [P] int32
    mask: jnp.ndarray,  # [P] bool
    block_nodes: int = 0,
    pairs_per_block: int = 0,
) -> jnp.ndarray:
    """Masked per-pair dot scores ``mask * <x[a], x[b]>`` (the edgepred
    scoring head). Blocked batches on the Pallas backend route through
    ``blocked_edge_dot`` whose VJP is one-hot MXU matmuls — the XLA
    fallback's take/scatter backward serializes on TPU."""
    blocked = block_nodes > 0 and pairs_per_block > 0
    use_pallas = _BACKEND == "pallas" or (
        _BACKEND == "auto" and _on_tpu()
    )
    if blocked and use_pallas:
        from pretrain_gnns_tpu.ops import pallas_spmm

        cdt = jnp.float32 if _DTYPE == "float32" else jnp.bfloat16
        return pallas_spmm.blocked_edge_dot(
            x, a_idx, b_idx, mask.astype(jnp.float32), block_nodes,
            pairs_per_block, cdt, not _on_tpu(),
        )
    xa = jnp.take(x, a_idx, axis=0)
    xb = jnp.take(x, b_idx, axis=0)
    return jnp.sum(xa * xb, axis=1) * mask.astype(x.dtype)


def _xla(x, edge_emb, senders, receivers, edge_mask, num_nodes,
         combine, aggr, edge_weight):
    x_j = jnp.take(x, senders, axis=0)
    if combine == "add":
        msg = x_j if edge_emb is None else x_j + edge_emb
    elif combine == "concat":
        msg = jnp.concatenate([x_j, edge_emb], axis=-1)
    else:
        raise ValueError(combine)
    if edge_weight is not None:
        msg = msg * edge_weight[:, None]
    if aggr == "sum":
        return seg.segment_sum(msg, receivers, num_nodes, mask=edge_mask)
    if aggr == "mean":
        return seg.segment_mean(msg, receivers, num_nodes, mask=edge_mask)
    raise ValueError(aggr)
