"""Fused gather→message→segment-aggregate — the message-passing hot loop.

This is the TPU-native replacement for torch-scatter's CUDA kernels behind
``MessagePassing.propagate`` (reference: chem/model.py:49-55 and every conv).
One call computes, for each node ``i``::

    out[i] = aggr_{e : receivers[e] == i} message(x[senders[e]], edge_emb[e])

with ``message`` either ``x_j + e`` (chem convs, chem/model.py:51-52) or
``concat(x_j, e)`` (bio GIN, bio/model.py:54-55), optionally scaled by a
per-edge weight (GCN norm, chem/model.py:103-104), and ``aggr`` in
{sum, mean}.

Two implementations:
- ``_xla``: pure jnp take + segment_sum. XLA lowers this to dynamic-gather +
  scatter-add; correct everywhere (CPU tests, TPU), baseline performance.
- Pallas TPU kernel (``pretrain_gnns_tpu.ops.pallas_spmm``): rows of ``x``
  are gathered from VMEM and accumulated tile-by-tile; used when running on
  TPU and shapes qualify. Selected via ``set_backend`` / env var
  ``PGT_SPMM_BACKEND`` in {auto, xla, pallas}.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from pretrain_gnns_tpu.ops import segment as seg

_BACKEND = os.environ.get("PGT_SPMM_BACKEND", "auto")


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in ("auto", "xla", "pallas"):
        raise ValueError(name)
    _BACKEND = name


def _use_pallas() -> bool:
    if _BACKEND == "xla":
        return False
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        on_tpu = False
    return _BACKEND == "pallas" or (_BACKEND == "auto" and on_tpu)


def gather_scatter(
    x: jnp.ndarray,  # [N, F] node features
    edge_emb: jnp.ndarray,  # [E, F] per-edge embedding
    senders: jnp.ndarray,  # [E] int32
    receivers: jnp.ndarray,  # [E] int32
    edge_mask: jnp.ndarray,  # [E] bool
    num_nodes: int,
    combine: str = "add",  # "add" | "concat"
    aggr: str = "sum",  # "sum" | "mean"
    edge_weight: Optional[jnp.ndarray] = None,  # [E]
) -> jnp.ndarray:
    """See module docstring. Returns [N, F] (or [N, 2F] for concat)."""
    if _use_pallas() and combine == "add" and aggr == "sum":
        from pretrain_gnns_tpu.ops import pallas_spmm

        out = pallas_spmm.gather_scatter_add(
            x, edge_emb, senders, receivers, edge_mask, num_nodes,
            edge_weight=edge_weight,
        )
        if out is not None:
            return out
    return _xla(
        x, edge_emb, senders, receivers, edge_mask, num_nodes,
        combine, aggr, edge_weight,
    )


def _xla(x, edge_emb, senders, receivers, edge_mask, num_nodes,
         combine, aggr, edge_weight):
    x_j = jnp.take(x, senders, axis=0)
    if combine == "add":
        msg = x_j + edge_emb
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
