"""Pallas TPU kernels for message-passing segment ops — the framework's
native replacement for torch-scatter's CUDA kernels (SURVEY.md §2.9).

Layout contract: the block-diagonal packing of
:func:`pretrain_gnns_tpu.core.graphs.pack_graphs_blocked` — node rows in
blocks of ``block_nodes`` (W), edge slots in blocks of ``block_edges``
(EPB), every edge's endpoints inside its own block.

Kernel strategy (TPU-first, no scalar loops): within a block, gather and
scatter are expressed as ONE-HOT MATMULS on the MXU:

    S[e, n] = [senders_local[e] == n]      (EPB x W)
    R[e, n] = [receivers_local[e] == n]    (EPB x W)
    msg  = S @ x_block + edge_emb          (gather + message)
    out  = R^T @ (w * msg)                 (masked scatter-add)

Padded edge slots carry global index 0, whose block-local value is negative
for every block except block 0 where w=0 masks it — either way they
contribute nothing. The whole computation is dense MXU/VPU work at
lane-aligned shapes; the feature dim is padded to a multiple of 128 by the
wrapper.

The backward pass reuses the same structure:
    dmsg = w * (R @ g_block)          (per-edge gather of output grads)
    dx   = S^T @ dmsg                 (scatter into sender rows)
    dee  = dmsg

``edge_weight`` is treated as non-differentiable (it is always mask /
degree data in this framework, never a parameter).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; kernels run with interpret=True there
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _pad_f(a: jnp.ndarray, fp: int) -> jnp.ndarray:
    if a.shape[-1] == fp:
        return a
    return jnp.pad(a, ((0, 0), (0, fp - a.shape[-1])))


def _vmem():
    return dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {}


def _precision(compute_dtype):
    # with f32 compute, force true-f32 MXU passes (default would be bf16)
    return (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT)


def _fwd_kernel(has_ee, block_nodes, block_edges, compute_dtype,
                snd_ref, rcv_ref, w_ref, x_ref, *rest):
    if has_ee:
        ee_ref, out_ref = rest
    else:
        (out_ref,) = rest
    b = pl.program_id(0)
    base = b * block_nodes
    snd = snd_ref[0, 0, :] - base  # [EPB] block-local
    rcv = rcv_ref[0, 0, :] - base
    w = w_ref[0, 0, :]
    node_ids = jax.lax.broadcasted_iota(
        jnp.int32, (block_edges, block_nodes), 1
    )
    prec = _precision(compute_dtype)
    S = (snd[:, None] == node_ids).astype(compute_dtype)
    msg = jnp.dot(
        S, x_ref[:].astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    )
    if has_ee:
        msg = msg + ee_ref[:]
    msg = msg * w[:, None]
    R = (rcv[:, None] == node_ids).astype(compute_dtype)
    out_ref[:] = jnp.dot(
        R.T, msg.astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _bwd_kernel(block_nodes, block_edges, compute_dtype,
                snd_ref, rcv_ref, w_ref, g_ref, dx_ref, dmsg_ref):
    b = pl.program_id(0)
    base = b * block_nodes
    snd = snd_ref[0, 0, :] - base
    rcv = rcv_ref[0, 0, :] - base
    w = w_ref[0, 0, :]
    node_ids = jax.lax.broadcasted_iota(
        jnp.int32, (block_edges, block_nodes), 1
    )
    prec = _precision(compute_dtype)
    R = (rcv[:, None] == node_ids).astype(compute_dtype)
    dmsg = jnp.dot(
        R, g_ref[:].astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    ) * w[:, None]
    dmsg_ref[:] = dmsg
    S = (snd[:, None] == node_ids).astype(compute_dtype)
    dx_ref[:] = jnp.dot(
        S.T, dmsg.astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _reshape_idx(a: jnp.ndarray, n_blocks: int, block_edges: int):
    # [n_blocks, 1, EPB]: the (1, EPB) trailing block equals the trailing
    # array dims, satisfying the Mosaic (8, 128) block-tiling rule
    return a.reshape(n_blocks, 1, block_edges)


def _call_fwd(x, ee, snd, rcv, w, block_nodes, block_edges, compute_dtype,
              interpret):
    N, F = x.shape
    E = snd.shape[0]
    n_blocks = N // block_nodes
    assert E == n_blocks * block_edges, (E, n_blocks, block_edges)
    FP = _round_up(F, 128)
    xp = _pad_f(x, FP)
    has_ee = ee is not None
    args = [
        _reshape_idx(snd, n_blocks, block_edges),
        _reshape_idx(rcv, n_blocks, block_edges),
        _reshape_idx(w.astype(jnp.float32), n_blocks, block_edges),
        xp,
    ]
    in_specs = [
        pl.BlockSpec((1, 1, block_edges), lambda b: (b, 0, 0), **_vmem()),
        pl.BlockSpec((1, 1, block_edges), lambda b: (b, 0, 0), **_vmem()),
        pl.BlockSpec((1, 1, block_edges), lambda b: (b, 0, 0), **_vmem()),
        pl.BlockSpec((block_nodes, FP), lambda b: (b, 0), **_vmem()),
    ]
    if has_ee:
        args.append(_pad_f(ee, FP))
        in_specs.append(
            pl.BlockSpec((block_edges, FP), lambda b: (b, 0), **_vmem())
        )
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, has_ee, block_nodes, block_edges, compute_dtype
        ),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_nodes, FP), lambda b: (b, 0), **_vmem()
        ),
        out_shape=jax.ShapeDtypeStruct((N, FP), jnp.float32),
        interpret=interpret,
    )(*args)
    return out[:, :F]


def _call_bwd(g, snd, rcv, w, block_nodes, block_edges, compute_dtype,
              interpret):
    N, F = g.shape
    E = snd.shape[0]
    n_blocks = N // block_nodes
    FP = _round_up(F, 128)
    gp = _pad_f(g, FP)
    dx, dmsg = pl.pallas_call(
        functools.partial(
            _bwd_kernel, block_nodes, block_edges, compute_dtype
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, block_edges), lambda b: (b, 0, 0), **_vmem()),
            pl.BlockSpec((1, 1, block_edges), lambda b: (b, 0, 0), **_vmem()),
            pl.BlockSpec((1, 1, block_edges), lambda b: (b, 0, 0), **_vmem()),
            pl.BlockSpec((block_nodes, FP), lambda b: (b, 0), **_vmem()),
        ],
        out_specs=[
            pl.BlockSpec((block_nodes, FP), lambda b: (b, 0), **_vmem()),
            pl.BlockSpec((block_edges, FP), lambda b: (b, 0), **_vmem()),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, FP), jnp.float32),
            jax.ShapeDtypeStruct((E, FP), jnp.float32),
        ],
        interpret=interpret,
    )(
        _reshape_idx(snd, n_blocks, block_edges),
        _reshape_idx(rcv, n_blocks, block_edges),
        _reshape_idx(w.astype(jnp.float32), n_blocks, block_edges),
        gp,
    )
    return dx[:, :F], dmsg[:, :F]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def blocked_spmm(
    x: jnp.ndarray,  # [N, F]
    edge_emb: Optional[jnp.ndarray],  # [E, F] or None
    senders: jnp.ndarray,  # [E] int32 global
    receivers: jnp.ndarray,  # [E] int32 global
    edge_weight: jnp.ndarray,  # [E] f32 (0 = padded; mask folded in)
    block_nodes: int,
    block_edges: int,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[r] = sum_e edge_weight[e] * (x[senders[e]] + edge_emb[e])."""
    return _call_fwd(x, edge_emb, senders, receivers, edge_weight,
                     block_nodes, block_edges, compute_dtype, interpret)


def _spmm_fwd(x, edge_emb, senders, receivers, edge_weight,
              block_nodes, block_edges, compute_dtype, interpret):
    out = _call_fwd(x, edge_emb, senders, receivers, edge_weight,
                    block_nodes, block_edges, compute_dtype, interpret)
    return out, (senders, receivers, edge_weight, edge_emb is not None,
                 x.shape)


def _spmm_bwd(block_nodes, block_edges, compute_dtype, interpret,
              residuals, g):
    senders, receivers, edge_weight, has_ee, x_shape = residuals
    dx, dmsg = _call_bwd(g, senders, receivers, edge_weight,
                         block_nodes, block_edges, compute_dtype, interpret)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    dee = dmsg if has_ee else None
    return (dx, dee, f0(senders), f0(receivers),
            jnp.zeros_like(edge_weight))


blocked_spmm.defvjp(_spmm_fwd, _spmm_bwd)


# ---------------------------------------------------------------------------
# Dispatch hook used by ops.spmm.gather_scatter
# ---------------------------------------------------------------------------
def gather_scatter_add(
    x, edge_emb, senders, receivers, edge_mask, num_nodes,
    edge_weight=None, block_nodes: int = 0, block_edges: int = 0,
    compute_dtype=None, interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """Returns None when the batch is not block-diagonal (caller falls back
    to the XLA path)."""
    if block_nodes <= 0 or block_edges <= 0:
        return None
    if compute_dtype is None:
        compute_dtype = jnp.float32
    w = edge_mask.astype(jnp.float32)
    if edge_weight is not None:
        w = w * edge_weight
    return blocked_spmm(
        x, edge_emb, senders, receivers, w,
        block_nodes, block_edges, compute_dtype, interpret,
    )
