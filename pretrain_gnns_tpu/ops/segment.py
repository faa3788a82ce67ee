"""Masked segment reductions — the XLA-native message-passing primitives.

These replace the reference's torch-scatter native kernels
(``scatter_add`` at chem/model.py:6,78 and every ``MessagePassing.propagate``
aggregation) with mask-aware JAX segment ops. They are the correctness
reference path; ``pretrain_gnns_tpu.ops.spmm`` provides the Pallas TPU
kernels for the hot configurations and falls back to these.

All functions take explicit ``num_segments`` (static) and a validity mask so
padded rows contribute nothing — including to mean denominators and softmax
normalizers, which is where naive padding silently corrupts numerics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # finite stand-in for -inf: keeps masked max/softmax NaN-free


def _apply_mask(data: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return data
    m = mask.astype(data.dtype)
    return data * m.reshape(m.shape + (1,) * (data.ndim - m.ndim))


# Below this segment count, segment sums are computed as one-hot matmuls:
# XLA lowers scatter-adds into few-row outputs to a serialized loop on TPU
# (profiled at ~0.1 ms per pool per step), while onehot.T @ data is one MXU
# pass. HIGHEST precision keeps f32 sums exact (each output element is a
# plain f32 accumulation, same values as the scatter path).
_MATMUL_SEGMENTS = 1024


def _onehot_ids(segment_ids, num_segments, mask, dtype):
    oh = jax.nn.one_hot(segment_ids, num_segments, dtype=dtype)
    if mask is not None:
        oh = oh * mask.astype(dtype)[:, None]
    return oh


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sum of ``data`` rows per segment; masked rows contribute zero."""
    if (
        data.ndim == 2
        and segment_ids.ndim == 1
        and num_segments <= _MATMUL_SEGMENTS
        and data.shape[0] * num_segments <= 16_000_000  # one-hot size cap
        and jnp.issubdtype(data.dtype, jnp.floating)
    ):
        oh = _onehot_ids(segment_ids, num_segments, mask, data.dtype)
        return jnp.einsum(
            "ns,nf->sf", oh, data, precision=jax.lax.Precision.HIGHEST
        )
    return jax.ops.segment_sum(
        _apply_mask(data, mask), segment_ids, num_segments=num_segments
    )


def segment_count(
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    if (segment_ids.ndim == 1 and num_segments <= _MATMUL_SEGMENTS
            and segment_ids.shape[0] * num_segments <= 16_000_000):
        return _onehot_ids(segment_ids, num_segments, mask, dtype).sum(0)
    ones = (
        jnp.ones(segment_ids.shape, dtype)
        if mask is None
        else mask.astype(dtype)
    )
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean per segment over valid rows only (empty segments -> 0)."""
    s = segment_sum(data, segment_ids, num_segments, mask)
    n = segment_count(segment_ids, num_segments, mask, dtype=s.dtype)
    n = n.reshape(n.shape + (1,) * (s.ndim - n.ndim))
    return s / jnp.maximum(n, 1.0)


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    empty_value: float = 0.0,
) -> jnp.ndarray:
    """Max per segment over valid rows; empty segments get ``empty_value``."""
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
        data = jnp.where(m, data, _NEG_INF)
    out = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments
    )
    return jnp.where(out <= _NEG_INF / 2, empty_value, out)


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    extra_logit: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Numerically-stable softmax within each segment (PyG ``softmax``,
    used by GAT attention at chem/model.py:157).

    ``extra_logit``: optional ``[num_segments, ...]`` per-segment logit that
    participates in the normalizer but is not among the rows — used for the
    analytically-handled self-loop edge (see core/graphs.py docstring). When
    given, returns ``(probs_for_rows, probs_for_extra)``.
    """
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (logits.ndim - mask.ndim))
        logits = jnp.where(m, logits, _NEG_INF)
    seg_max = jax.ops.segment_max(
        logits, segment_ids, num_segments=num_segments
    )
    if extra_logit is not None:
        seg_max = jnp.maximum(seg_max, extra_logit)
    seg_max = jnp.maximum(seg_max, _NEG_INF)  # empty segments: avoid -inf
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = _apply_mask(exp, mask)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    if extra_logit is not None:
        exp_extra = jnp.exp(extra_logit - seg_max)
        denom = denom + exp_extra
        denom = jnp.maximum(denom, 1e-16)
        return exp / denom[segment_ids], exp_extra / denom
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[segment_ids]
