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
import os
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


# Lane padding policy for the feature dim. Mosaic handles non-128-multiple
# trailing dims by masking inside VMEM; materializing the pad in HBM
# (jnp.pad + slice on every call) showed up as ~10% of device time in the
# train-step profile, so the default is to pass features unpadded — with a
# one-time lowering probe as an automatic fallback for toolchains whose
# Mosaic cannot compile unpadded trailing dims (PGT_SPMM_NOPAD=0 forces
# the padded path without probing).
_NOPAD_ENV = os.environ.get("PGT_SPMM_NOPAD", "1") == "1"
_NOPAD: "bool | None" = False if not _NOPAD_ENV else None


def _nopad_ok() -> bool:
    """Probe once: can Mosaic lower a kernel with a 300-wide trailing dim?
    On CPU/interpret the answer is always yes (no Mosaic involved)."""
    global _NOPAD
    if _NOPAD is not None:
        return _NOPAD
    try:
        if jax.default_backend() == "cpu":
            _NOPAD = True  # interpret mode; no Mosaic lowering involved
            return _NOPAD
        f = pl.pallas_call(
            lambda x_ref, o_ref: o_ref.__setitem__(..., x_ref[...] * 2.0),
            out_shape=jax.ShapeDtypeStruct((8, 300), jnp.float32),
        )
        jax.jit(f).lower(
            jax.ShapeDtypeStruct((8, 300), jnp.float32)
        ).compile()
        _NOPAD = True
    except Exception:  # pragma: no cover - toolchain dependent
        _NOPAD = False
    return _NOPAD


def _fp(f: int) -> int:
    return f if _nopad_ok() else _round_up(f, 128)


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
    ).astype(out_ref.dtype)


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
    dmsg_ref[:] = dmsg.astype(dmsg_ref.dtype)
    S = (snd[:, None] == node_ids).astype(compute_dtype)
    dx_ref[:] = jnp.dot(
        S.T, dmsg.astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(dx_ref.dtype)


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
    FP = _fp(F)
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
        out_shape=jax.ShapeDtypeStruct((N, FP), x.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :F]


def _call_bwd(g, snd, rcv, w, block_nodes, block_edges, compute_dtype,
              interpret):
    N, F = g.shape
    E = snd.shape[0]
    n_blocks = N // block_nodes
    FP = _fp(F)
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
            jax.ShapeDtypeStruct((N, FP), g.dtype),
            jax.ShapeDtypeStruct((E, FP), g.dtype),
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
# Fused edge-transform SpMM: out[r] = sum_e w[e] * (x[snd[e]] + (ein @ W)[e])
#
# The per-edge embedding/encoding never touches HBM: the reference's
# Embed(bond_type) + Embed(bond_dir) (chem/model.py:47) is one matmul of a
# tiny one-hot block against the stacked tables W = [e1; e2] (9 x F), and
# the bio Linear(9->F) edge encoder (bio/model.py:27,47) is ein @ [K; b]
# with a ones column. Compared to ``blocked_spmm`` with a precomputed
# ``edge_emb``, this removes an [E, F] HBM round-trip per layer in the
# forward AND the [E, F] ``dmsg`` materialization in the backward — dW is
# accumulated across grid steps inside the kernel (sequential TPU grid).
#
# Grid grouping: the per-block matmuls are tiny (~0.3 us of MXU work at
# 128-node blocks) while each grid step pays fixed DMA-latency cost for its
# 5+ small operand transfers — profiled at ~1.7 us/block, 5x the compute.
# So each grid step processes GROUP consecutive blocks: one DMA set per
# GROUP blocks, matmuls unrolled inside the kernel. snd/rcv ship as ONE
# packed int32 array, and the edge weight w is folded into the one-hot
# selects (S_w = w at the matching node, 0 elsewhere) instead of a
# separate [E, F] multiply.
#
# Either side of the message is optional: ``has_x=False`` drops the
# gather term (scatter of edge embeddings alone — the right half of bio's
# concat message), ``has_ein=False`` drops the edge term (pure
# neighbor scatter — the left half).
# ---------------------------------------------------------------------------
_GROUP = int(os.environ.get("PGT_SPMM_GROUP", "8"))


def _pick_group(n_blocks: int) -> int:
    for g in (_GROUP, 8, 4, 2):
        if g >= 1 and n_blocks % g == 0:
            return g
    return 1


def _pack_idx(snd, rcv, n_blocks, block_edges, group):
    s = snd.reshape(n_blocks, 1, block_edges)
    r = rcv.reshape(n_blocks, 1, block_edges)
    both = jnp.concatenate([s, r], axis=1)  # [n_blocks, 2, EPB]
    return both.reshape(n_blocks // group, 2 * group, block_edges)


def _fused_fwd_kernel(group, has_x, has_ein, block_nodes, block_edges,
                      compute_dtype, idx_ref, w_ref, *rest):
    refs = list(rest)
    ein_ref = W_ref = x_ref = None
    if has_ein:
        ein_ref, W_ref = refs.pop(0), refs.pop(0)
    if has_x:
        x_ref = refs.pop(0)
    (out_ref,) = refs
    prec = _precision(compute_dtype)
    b = pl.program_id(0)
    if has_ein:
        Wm = W_ref[:].astype(compute_dtype)
    node_ids = jax.lax.broadcasted_iota(
        jnp.int32, (block_edges, block_nodes), 1
    )
    for j in range(group):
        base = (b * group + j) * block_nodes
        rcv = idx_ref[0, 2 * j + 1, :] - base
        w = w_ref[0, j, :]
        acc = None
        if has_ein:
            ein_w = (
                ein_ref[j * block_edges:(j + 1) * block_edges, :]
                .astype(jnp.float32) * w[:, None]
            )
            acc = jnp.dot(
                ein_w.astype(compute_dtype), Wm,
                preferred_element_type=jnp.float32, precision=prec,
            )
        if has_x:
            snd = idx_ref[0, 2 * j, :] - base
            S_w = jnp.where(
                snd[:, None] == node_ids, w[:, None], 0.0
            ).astype(compute_dtype)
            xj = jnp.dot(
                S_w,
                x_ref[j * block_nodes:(j + 1) * block_nodes, :]
                .astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=prec,
            )
            acc = xj if acc is None else acc + xj
        R = (rcv[:, None] == node_ids).astype(compute_dtype)
        out_ref[j * block_nodes:(j + 1) * block_nodes, :] = jnp.dot(
            R.T, acc.astype(compute_dtype),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(out_ref.dtype)


def _fused_bwd_kernel(group, has_x, has_ein, block_nodes, block_edges,
                      compute_dtype, idx_ref, w_ref, *rest):
    refs = list(rest)
    ein_ref = dx_ref = dw_ref = None
    if has_ein:
        ein_ref = refs.pop(0)
    g_ref = refs.pop(0)
    if has_x:
        dx_ref = refs.pop(0)
    if has_ein:
        dw_ref = refs.pop(0)
    prec = _precision(compute_dtype)
    b = pl.program_id(0)

    if has_ein:
        # dW = sum over blocks of ein^T @ dmsg, accumulated across the
        # (sequential) grid into a single output block.
        @pl.when(b == 0)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)

    node_ids = jax.lax.broadcasted_iota(
        jnp.int32, (block_edges, block_nodes), 1
    )
    for j in range(group):
        base = (b * group + j) * block_nodes
        rcv = idx_ref[0, 2 * j + 1, :] - base
        w = w_ref[0, j, :]
        R_w = jnp.where(
            rcv[:, None] == node_ids, w[:, None], 0.0
        ).astype(compute_dtype)
        dmsg = jnp.dot(
            R_w,
            g_ref[j * block_nodes:(j + 1) * block_nodes, :]
            .astype(compute_dtype),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(compute_dtype)
        if has_x:
            snd = idx_ref[0, 2 * j, :] - base
            S = (snd[:, None] == node_ids).astype(compute_dtype)
            dx_ref[j * block_nodes:(j + 1) * block_nodes, :] = jnp.dot(
                S.T, dmsg,
                preferred_element_type=jnp.float32, precision=prec,
            ).astype(dx_ref.dtype)
        if has_ein:
            ein = ein_ref[j * block_edges:(j + 1) * block_edges, :]
            dw_ref[:] += jnp.dot(
                ein.T.astype(compute_dtype), dmsg,
                preferred_element_type=jnp.float32, precision=prec,
            )


def _fused_call_fwd(x, ein, W, snd, rcv, w, block_nodes, block_edges,
                    compute_dtype, interpret, has_x, has_ein):
    E = snd.shape[0]
    n_blocks = E // block_edges
    G = _pick_group(n_blocks)
    F = W.shape[1] if has_ein else x.shape[1]
    FP = _fp(F)
    N = x.shape[0] if has_x else n_blocks * block_nodes
    args = [
        _pack_idx(snd, rcv, n_blocks, block_edges, G),
        w.astype(jnp.float32).reshape(n_blocks // G, G, block_edges),
    ]
    in_specs = [
        pl.BlockSpec((1, 2 * G, block_edges), lambda b: (b, 0, 0),
                     **_vmem()),
        pl.BlockSpec((1, G, block_edges), lambda b: (b, 0, 0), **_vmem()),
    ]
    if has_ein:
        K = W.shape[0]
        args += [ein, _pad_f(W, FP)]
        in_specs += [
            pl.BlockSpec((G * block_edges, K), lambda b: (b, 0), **_vmem()),
            pl.BlockSpec((K, FP), lambda b: (0, 0), **_vmem()),
        ]
    if has_x:
        args.append(_pad_f(x, FP))
        in_specs.append(
            pl.BlockSpec((G * block_nodes, FP), lambda b: (b, 0), **_vmem())
        )
    out = pl.pallas_call(
        functools.partial(
            _fused_fwd_kernel, G, has_x, has_ein, block_nodes, block_edges,
            compute_dtype,
        ),
        grid=(n_blocks // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (G * block_nodes, FP), lambda b: (b, 0), **_vmem()
        ),
        # out dtype follows the activations either way (x is provided for
        # its shape even when has_x=False): keeps the bio-GIN concat's
        # right half in bf16 under bfloat16_act instead of promoting
        out_shape=jax.ShapeDtypeStruct((N, FP), x.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :F]


def _fused_call_bwd(g, ein, snd, rcv, w, K, block_nodes, block_edges,
                    compute_dtype, interpret, has_x, has_ein):
    N, F = g.shape
    E = snd.shape[0]
    n_blocks = E // block_edges
    G = _pick_group(n_blocks)
    FP = _fp(F)
    gp = _pad_f(g, FP)
    args = [
        _pack_idx(snd, rcv, n_blocks, block_edges, G),
        w.astype(jnp.float32).reshape(n_blocks // G, G, block_edges),
    ]
    in_specs = [
        pl.BlockSpec((1, 2 * G, block_edges), lambda b: (b, 0, 0),
                     **_vmem()),
        pl.BlockSpec((1, G, block_edges), lambda b: (b, 0, 0), **_vmem()),
    ]
    if has_ein:
        args.append(ein)
        in_specs.append(
            pl.BlockSpec((G * block_edges, K), lambda b: (b, 0), **_vmem())
        )
    args.append(gp)
    in_specs.append(
        pl.BlockSpec((G * block_nodes, FP), lambda b: (b, 0), **_vmem())
    )
    out_shapes = []
    out_specs = []
    if has_x:
        out_shapes.append(jax.ShapeDtypeStruct((N, FP), g.dtype))
        out_specs.append(
            pl.BlockSpec((G * block_nodes, FP), lambda b: (b, 0), **_vmem())
        )
    if has_ein:
        out_shapes.append(jax.ShapeDtypeStruct((K, FP), jnp.float32))
        out_specs.append(pl.BlockSpec((K, FP), lambda b: (0, 0), **_vmem()))
    outs = pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel, G, has_x, has_ein, block_nodes, block_edges,
            compute_dtype,
        ),
        grid=(n_blocks // G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    outs = list(outs)
    dx = outs.pop(0)[:, :F] if has_x else None
    dW = outs.pop(0)[:, :F] if has_ein else None
    return dx, dW


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def blocked_spmm_fused(
    x: jnp.ndarray,  # [N, F] (ignored when has_x=False)
    ein: Optional[jnp.ndarray],  # [E, K] per-edge inputs (one-hots / feats)
    W: Optional[jnp.ndarray],  # [K, F] stacked tables / encoder (+bias row)
    senders: jnp.ndarray,  # [E] int32 global
    receivers: jnp.ndarray,  # [E] int32 global
    edge_weight: jnp.ndarray,  # [E] f32 (0 = padded; mask folded in)
    block_nodes: int,
    block_edges: int,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    has_x: bool = True,
    has_ein: bool = True,
) -> jnp.ndarray:
    """out[r] = sum_e w[e] * (x[senders[e]] + (ein @ W)[e])."""
    return _fused_call_fwd(x, ein, W, senders, receivers, edge_weight,
                           block_nodes, block_edges, compute_dtype,
                           interpret, has_x, has_ein)


def _fused_fwd(x, ein, W, senders, receivers, edge_weight,
               block_nodes, block_edges, compute_dtype, interpret,
               has_x, has_ein):
    out = _fused_call_fwd(x, ein, W, senders, receivers, edge_weight,
                          block_nodes, block_edges, compute_dtype,
                          interpret, has_x, has_ein)
    return out, (x, ein, senders, receivers, edge_weight,
                 W.shape[0] if has_ein else 0)


def _fused_bwd(block_nodes, block_edges, compute_dtype, interpret,
               has_x, has_ein, residuals, g):
    x, ein, senders, receivers, edge_weight, K = residuals
    dx, dW = _fused_call_bwd(g, ein, senders, receivers, edge_weight, K,
                             block_nodes, block_edges, compute_dtype,
                             interpret, has_x, has_ein)
    if dx is None:
        dx = jnp.zeros_like(x)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    dein = jnp.zeros_like(ein) if has_ein else None
    return (dx, dein, dW, f0(senders), f0(receivers),
            jnp.zeros_like(edge_weight))


blocked_spmm_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Blocked per-pair dot products (SDDMM row): score[e] = w[e] * <x[a_e],
# x[b_e]> for block-local pair lists — the edgepred scoring head. The
# FORWARD's row gathers are one-hot matmuls like the SpMM; the point is
# the BACKWARD: autodiff of jnp.take would emit XLA scatter-adds of
# [E, F] rows, which TPU serializes (profiled at ~1.4 ms/step — it made
# edgepred 35% slower than masking e2e). Here dx = S_a^T (g ∘ m_b) +
# S_b^T (g ∘ m_a) — four one-hot MXU passes.
# ---------------------------------------------------------------------------
def _edot_fwd_kernel(group, block_nodes, pairs_pb, compute_dtype,
                     idx_ref, w_ref, x_ref, out_ref):
    prec = _precision(compute_dtype)
    node_ids = jax.lax.broadcasted_iota(
        jnp.int32, (pairs_pb, block_nodes), 1
    )
    b = pl.program_id(0)
    for j in range(group):
        base = (b * group + j) * block_nodes
        a = idx_ref[0, 2 * j, :] - base
        bb = idx_ref[0, 2 * j + 1, :] - base
        w = w_ref[0, j, :]
        xj = x_ref[j * block_nodes:(j + 1) * block_nodes, :] \
            .astype(compute_dtype)
        Sa = (a[:, None] == node_ids).astype(compute_dtype)
        Sb = (bb[:, None] == node_ids).astype(compute_dtype)
        ma = jnp.dot(Sa, xj, preferred_element_type=jnp.float32,
                     precision=prec)
        mb = jnp.dot(Sb, xj, preferred_element_type=jnp.float32,
                     precision=prec)
        out_ref[0, j, :] = jnp.sum(ma * mb, axis=1) * w


def _edot_bwd_kernel(group, block_nodes, pairs_pb, compute_dtype,
                     idx_ref, w_ref, x_ref, g_ref, dx_ref):
    prec = _precision(compute_dtype)
    node_ids = jax.lax.broadcasted_iota(
        jnp.int32, (pairs_pb, block_nodes), 1
    )
    b = pl.program_id(0)
    for j in range(group):
        base = (b * group + j) * block_nodes
        a = idx_ref[0, 2 * j, :] - base
        bb = idx_ref[0, 2 * j + 1, :] - base
        gw = g_ref[0, j, :] * w_ref[0, j, :]
        xj = x_ref[j * block_nodes:(j + 1) * block_nodes, :] \
            .astype(compute_dtype)
        Sa = (a[:, None] == node_ids).astype(compute_dtype)
        Sb = (bb[:, None] == node_ids).astype(compute_dtype)
        ma = jnp.dot(Sa, xj, preferred_element_type=jnp.float32,
                     precision=prec)
        mb = jnp.dot(Sb, xj, preferred_element_type=jnp.float32,
                     precision=prec)
        dx_ref[j * block_nodes:(j + 1) * block_nodes, :] = (
            jnp.dot(Sa.T, (mb * gw[:, None]).astype(compute_dtype),
                    preferred_element_type=jnp.float32, precision=prec)
            + jnp.dot(Sb.T, (ma * gw[:, None]).astype(compute_dtype),
                      preferred_element_type=jnp.float32, precision=prec)
        ).astype(dx_ref.dtype)


def _edot_call(kernel, extra, x, a_idx, b_idx, w, block_nodes, pairs_pb,
               compute_dtype, interpret, out_kind):
    N, F = x.shape
    P = a_idx.shape[0]
    n_blocks = P // pairs_pb
    G = _pick_group(n_blocks)
    FP = _fp(F)
    args = [
        _pack_idx(a_idx, b_idx, n_blocks, pairs_pb, G),
        w.astype(jnp.float32).reshape(n_blocks // G, G, pairs_pb),
        _pad_f(x, FP),
    ] + extra
    in_specs = [
        pl.BlockSpec((1, 2 * G, pairs_pb), lambda b: (b, 0, 0), **_vmem()),
        pl.BlockSpec((1, G, pairs_pb), lambda b: (b, 0, 0), **_vmem()),
        pl.BlockSpec((G * block_nodes, FP), lambda b: (b, 0), **_vmem()),
    ]
    if extra:  # backward: the incoming cotangent [P] reshaped like w
        in_specs.append(
            pl.BlockSpec((1, G, pairs_pb), lambda b: (b, 0, 0), **_vmem())
        )
    if out_kind == "scores":
        out_spec = pl.BlockSpec((1, G, pairs_pb), lambda b: (b, 0, 0),
                                **_vmem())
        out_shape = jax.ShapeDtypeStruct((n_blocks // G, G, pairs_pb),
                                         jnp.float32)
    else:
        out_spec = pl.BlockSpec((G * block_nodes, FP), lambda b: (b, 0),
                                **_vmem())
        out_shape = jax.ShapeDtypeStruct((N, FP), x.dtype)
    out = pl.pallas_call(
        functools.partial(kernel, G, block_nodes, pairs_pb, compute_dtype),
        grid=(n_blocks // G,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if out_kind == "scores":
        return out.reshape(P)
    return out[:, :F]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def blocked_edge_dot(
    x: jnp.ndarray,  # [N, F]
    a_idx: jnp.ndarray,  # [P] int32 global (block-local pairs)
    b_idx: jnp.ndarray,  # [P] int32 global
    w: jnp.ndarray,  # [P] f32 (0 = padded)
    block_nodes: int,
    pairs_per_block: int,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """score[p] = w[p] * <x[a_idx[p]], x[b_idx[p]]>; Pallas VJP."""
    return _edot_call(_edot_fwd_kernel, [], x, a_idx, b_idx, w,
                      block_nodes, pairs_per_block, compute_dtype,
                      interpret, "scores")


def _edot_fwd(x, a_idx, b_idx, w, block_nodes, pairs_per_block,
              compute_dtype, interpret):
    out = _edot_call(_edot_fwd_kernel, [], x, a_idx, b_idx, w,
                     block_nodes, pairs_per_block, compute_dtype,
                     interpret, "scores")
    return out, (x, a_idx, b_idx, w)


def _edot_bwd(block_nodes, pairs_per_block, compute_dtype, interpret,
              residuals, g):
    x, a_idx, b_idx, w = residuals
    n_blocks = a_idx.shape[0] // pairs_per_block
    G = _pick_group(n_blocks)
    gr = [g.astype(jnp.float32).reshape(n_blocks // G, G, pairs_per_block)]
    dx = _edot_call(_edot_bwd_kernel, gr, x, a_idx, b_idx, w,
                    block_nodes, pairs_per_block, compute_dtype,
                    interpret, "dx")
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return dx, f0(a_idx), f0(b_idx), jnp.zeros_like(w)


blocked_edge_dot.defvjp(_edot_fwd, _edot_bwd)


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
