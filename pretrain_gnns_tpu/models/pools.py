"""Graph-level readouts over packed batches.

Replaces PyG's ``global_{add,mean,max}_pool``, ``GlobalAttention`` and
``Set2Set`` (imported at chem/model.py:4, used at chem/model.py:322-341).
All readouts are mask-aware: padded nodes contribute nothing, mean
denominators count valid nodes only.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn
from jax import random

from pretrain_gnns_tpu.core.graphs import PackedGraphs
from pretrain_gnns_tpu.models import inits
from pretrain_gnns_tpu.ops import segment as seg


def sum_pool(h: jnp.ndarray, g: PackedGraphs) -> jnp.ndarray:
    return seg.segment_sum(h, g.node_graph, g.max_graphs, mask=g.node_mask)


def mean_pool(h: jnp.ndarray, g: PackedGraphs) -> jnp.ndarray:
    return seg.segment_mean(h, g.node_graph, g.max_graphs, mask=g.node_mask)


def max_pool(h: jnp.ndarray, g: PackedGraphs) -> jnp.ndarray:
    return seg.segment_max(
        h, g.node_graph, g.max_graphs, mask=g.node_mask, empty_value=0.0
    )


class GlobalAttentionPool(nn.Module):
    """PyG ``GlobalAttention`` with gate_nn = Linear(D, 1)
    (chem/model.py:329-333): softmax(gate) over each graph, weighted sum."""

    in_dim: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, g: PackedGraphs) -> jnp.ndarray:
        gate = inits.dense(1, self.in_dim, "gate_nn")(h)  # [N, 1]
        a = seg.segment_softmax(
            gate, g.node_graph, g.max_graphs, mask=g.node_mask
        )
        return seg.segment_sum(
            a * h, g.node_graph, g.max_graphs, mask=g.node_mask
        )


class _TorchLSTMCell(nn.Module):
    """Standard LSTM cell with torch nn.LSTM's init (all params
    U(-1/sqrt(H), 1/sqrt(H))) and gate order [i, f, g, o]."""

    hidden: int
    in_dim: int

    @nn.compact
    def __call__(self, carry, x):
        c, h = carry
        bound = 1.0 / math.sqrt(self.hidden)
        u = lambda key, shape, dtype=jnp.float32: random.uniform(
            key, shape, dtype, -bound, bound
        )
        w_ih = self.param("weight_ih", u, (self.in_dim, 4 * self.hidden))
        w_hh = self.param("weight_hh", u, (self.hidden, 4 * self.hidden))
        b_ih = self.param("bias_ih", u, (4 * self.hidden,))
        b_hh = self.param("bias_hh", u, (4 * self.hidden,))
        z = x @ w_ih + b_ih + h @ w_hh + b_hh
        i, f, gg, o = jnp.split(z, 4, axis=-1)
        c_new = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(gg)
        h_new = nn.sigmoid(o) * jnp.tanh(c_new)
        return (c_new, h_new), h_new


class Set2SetPool(nn.Module):
    """PyG ``Set2Set(in_dim, processing_steps)`` (chem/model.py:334-339):
    LSTM-driven attention readout; output dim = 2 * in_dim."""

    in_dim: int
    processing_steps: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, g: PackedGraphs) -> jnp.ndarray:
        B = g.max_graphs
        cell = _TorchLSTMCell(self.hidden_dim, 2 * self.hidden_dim,
                              name="lstm")
        q_star = jnp.zeros((B, 2 * self.in_dim), h.dtype)
        carry = (
            jnp.zeros((B, self.in_dim), h.dtype),
            jnp.zeros((B, self.in_dim), h.dtype),
        )
        # static small loop (2-3 steps): unrolled, keeps params shared
        for _ in range(self.processing_steps):
            carry, q = cell(carry, q_star)
            e = jnp.sum(h * q[g.node_graph], axis=-1, keepdims=True)
            a = seg.segment_softmax(
                e, g.node_graph, B, mask=g.node_mask
            )
            r = seg.segment_sum(a * h, g.node_graph, B, mask=g.node_mask)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star

    @property
    def hidden_dim(self) -> int:
        return self.in_dim
