"""GAT attention op: XLA reference path + fused Pallas dispatch.

The reference computes GAT attention with PyG's segment ``softmax`` over
``edge_index[0]`` plus scatter aggregation (chem/model.py:150-165,
bio/model.py:160-175), with the materialized self-loop edges inside the
softmax. Here the op is a pure function over packed batches:

    out[n, h] = sum_{e->n} alpha[e,h] (x[snd[e],h] + e[e,h])
              + alpha_self[n,h] (x[n,h] + e_self[h])

with alpha the segment softmax of LeakyReLU logits (self-loop as one extra
per-node logit — exactly equivalent to materializing (i,i) edges).

Two implementations:
- ``gat_attention_xla``: gathers + masked segment softmax (ops.segment).
  Works for any packing; the grad path.
- Pallas fused kernel (ops.pallas_attention) for block-diagonal packed
  batches, selected by the same backend switches as the SpMM
  (``PGT_SPMM_BACKEND`` / ops.spmm.set_backend). Wrapped in a custom VJP
  whose backward recomputes through the XLA path — identical math, exact
  gradients; forward avoids materializing [E, H, D] gathers in HBM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pretrain_gnns_tpu.ops import segment as seg
from pretrain_gnns_tpu.ops import spmm


def gat_attention_xla(
    x: jnp.ndarray,  # [N, H, D]
    e: jnp.ndarray,  # [E, H, D]
    e_self: jnp.ndarray,  # [H, D]
    a_i: jnp.ndarray,  # [1, H, D]
    a_j: jnp.ndarray,  # [1, H, D]
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_mask: jnp.ndarray,
    num_nodes: int,
    slope: float,
) -> jnp.ndarray:
    """Reference path (chem/model.py:150-165). Returns [N, H, D]."""
    x_i = jnp.take(x, receivers, axis=0)
    x_j = jnp.take(x, senders, axis=0) + e
    logits = jnp.sum(x_i * a_i + x_j * a_j, axis=-1)  # [E, H]
    logits = jax.nn.leaky_relu(logits, slope)

    x_self = x + e_self  # [N, H, D]
    self_logits = jnp.sum(x * a_i + x_self * a_j, axis=-1)  # [N, H]
    self_logits = jax.nn.leaky_relu(self_logits, slope)

    p, p_self = seg.segment_softmax(
        logits, receivers, num_nodes, mask=edge_mask,
        extra_logit=self_logits,
    )
    out = seg.segment_sum(
        p[..., None] * x_j, receivers, num_nodes, mask=edge_mask
    )
    return out + p_self[..., None] * x_self


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _gat_blocked(x, e, e_self, a_i, a_j, senders, receivers, edge_mask,
                 num_nodes, slope, block_nodes, block_edges, compute_dtype,
                 interpret):
    from pretrain_gnns_tpu.ops import pallas_attention

    return pallas_attention.blocked_gat_forward(
        x, e, e_self, a_i, a_j, senders, receivers,
        edge_mask.astype(jnp.float32), slope, block_nodes, block_edges,
        compute_dtype, interpret,
    )


def _gat_fwd(x, e, e_self, a_i, a_j, senders, receivers, edge_mask,
             num_nodes, slope, block_nodes, block_edges, compute_dtype,
             interpret):
    out = _gat_blocked(x, e, e_self, a_i, a_j, senders, receivers,
                       edge_mask, num_nodes, slope, block_nodes,
                       block_edges, compute_dtype, interpret)
    return out, (x, e, e_self, a_i, a_j, senders, receivers, edge_mask)


def _gat_bwd(num_nodes, slope, block_nodes, block_edges, compute_dtype,
             interpret, residuals, g):
    import os

    x, e, e_self, a_i, a_j, senders, receivers, edge_mask = residuals
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)

    if os.environ.get("PGT_GAT_BWD", "pallas") == "pallas":
        from pretrain_gnns_tpu.ops import pallas_attention

        dx, de, des, dai, daj = pallas_attention.blocked_gat_backward(
            x, e, e_self, a_i, a_j, senders, receivers,
            edge_mask.astype(jnp.float32), g, slope, block_nodes,
            block_edges, compute_dtype, interpret,
        )
        return (dx, de, des, dai, daj, f0(senders), f0(receivers),
                f0(edge_mask))

    # escape hatch: recompute through the XLA reference path
    def ref(x, e, e_self, a_i, a_j):
        return gat_attention_xla(x, e, e_self, a_i, a_j, senders,
                                 receivers, edge_mask, num_nodes, slope)

    _, vjp = jax.vjp(ref, x, e, e_self, a_i, a_j)
    dx, de, des, dai, daj = vjp(g)
    return dx, de, des, dai, daj, f0(senders), f0(receivers), f0(edge_mask)


_gat_blocked.defvjp(_gat_fwd, _gat_bwd)


def gat_attention(
    x: jnp.ndarray,
    e: jnp.ndarray,
    e_self: jnp.ndarray,
    a_i: jnp.ndarray,
    a_j: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_mask: jnp.ndarray,
    num_nodes: int,
    slope: float = 0.2,
    block_nodes: int = 0,
    block_edges: int = 0,
) -> jnp.ndarray:
    """Dispatch: fused Pallas kernel on blocked batches (per the spmm
    backend switches), XLA reference otherwise. Returns [N, H, D]."""
    blocked = block_nodes > 0 and block_edges > 0
    backend = spmm.get_backend()
    use_pallas = backend == "pallas" or (
        backend == "auto" and spmm._on_tpu()
    )
    if blocked and use_pallas:
        cdt = (jnp.float32 if spmm._DTYPE == "float32" else jnp.bfloat16)
        return _gat_blocked(
            x, e, e_self, a_i, a_j, senders, receivers, edge_mask,
            num_nodes, slope, block_nodes, block_edges, cdt,
            not spmm._on_tpu(),
        )
    return gat_attention_xla(x, e, e_self, a_i, a_j, senders, receivers,
                             edge_mask, num_nodes, slope)
