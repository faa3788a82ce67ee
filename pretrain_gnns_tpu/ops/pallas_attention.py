"""Pallas TPU kernel: fused GAT attention (SDDMM + segment softmax +
weighted aggregation) over the block-diagonal packed layout.

This is the TPU-native replacement for the reference GAT's PyG segment
``softmax`` + scatter pipeline (chem/model.py:150-165, bio/model.py:117-180)
— the SURVEY.md §2.9 "SDDMM + segment-softmax" kernel. The XLA fallback
path materializes per-edge gathered features ``x_i, x_j`` of shape
``[E, H, D]`` in HBM three times (logits, softmax, aggregation); this
kernel keeps everything for a (node-block, head) tile in VMEM and touches
HBM once per tensor.

Math (additive GAT attention, factored SDDMM form): the reference logit
``LeakyReLU(cat[x_i, x_j+e] · att)`` decomposes into per-node scalar
projections ``ps = x·a_i``, ``pd = x·a_j`` and a per-edge term
``pe = e·a_j``, so inside a block the per-edge logit is

    l[e] = LeakyReLU( (R @ ps) + (S @ pd) + pe )

with S/R the one-hot sender/receiver matrices of the block (the same
MXU-matmul trick as ops.pallas_spmm). The self-loop participates in the
softmax as one extra per-node logit (see core/graphs.py docstring). The
softmax is the numerically-stable masked segment softmax:

    m[n]   = max( max_{e->n} l[e], l_self[n] )
    p[e]   = exp(l[e] - m[rcv[e]]) * w[e]          (w=0 kills padded edges)
    den[n] = sum_{e->n} p[e] + exp(l_self[n] - m[n])
    out[n] = ( R^T @ (p * (S @ x + e_feat)) + exp(l_self-m) * msg_self ) / den

Grid = (heads, node_blocks): each program owns one head of one block, so
every tensor tile is rank-2 and lane-aligned (feature dim padded to 128).

Backward (``blocked_gat_backward``): fused as well. The kernel recomputes
the segment softmax from the saved scalar projections (flash-attention
style — cheaper than storing per-edge probabilities), forms the edge
gradients, and emits everything the outer (XLA) einsums need:

    dα[e]  = g[rcv]·msg[e]          dαs[n] = g[n]·ms[n]
    c[n]   = Σ_{e->n} α dα + αs dαs          (softmax jacobian reduction)
    dz[e]  = α (dα - c[rcv]) · LeakyReLU'(raw)
    dzs[n] = αs (dαs - c[n]) · LeakyReLU'(raw_self)
    de     = α g[rcv]                        (per-edge message grad tile)
    dx_p   = Sᵀ (α g[rcv]) + αs g           (message-path node grad)
    dps_e  = Rᵀ dz     dpd_e = Sᵀ dz        (projection scalar grads)

The projection outer products (dx += dps·a_i + ..., da_i/da_j, de += dz·a_j)
are tiny [N,H]x[H,D] einsums left to XLA — see ops.attention._gat_bwd.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_NEG = -1e30


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _vmem():
    return dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {}


def _precision(compute_dtype):
    return (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT)


def _kernel(block_nodes, block_edges, slope, compute_dtype,
            snd_ref, rcv_ref, w_ref, ps_ref, pd_ref, pe_ref, sl_ref,
            x_ref, e_ref, ms_ref, out_ref):
    b = pl.program_id(1)
    base = b * block_nodes
    snd = snd_ref[0, 0, :] - base  # [EPB] block-local
    rcv = rcv_ref[0, 0, :] - base
    w = w_ref[0, 0, :]
    node_ids = jax.lax.broadcasted_iota(
        jnp.int32, (block_edges, block_nodes), 1
    )
    S = snd[:, None] == node_ids  # [EPB, W] bool
    R = rcv[:, None] == node_ids

    ps = ps_ref[0, 0, :]  # [W] receiver-side projection x·a_i
    pd = pd_ref[0, 0, :]  # [W] sender-side projection x·a_j
    pe = pe_ref[0, 0, :]  # [EPB] edge-feature projection e·a_j
    sl = sl_ref[0, 0, :]  # [W] self-loop logit (already LeakyReLU'd)

    # SDDMM: per-edge logits from endpoint projections
    ps_g = jnp.sum(jnp.where(R, ps[None, :], 0.0), axis=1)
    pd_g = jnp.sum(jnp.where(S, pd[None, :], 0.0), axis=1)
    logit = ps_g + pd_g + pe
    logit = jnp.where(logit >= 0, logit, slope * logit)  # LeakyReLU
    logit = jnp.where(w > 0, logit, _NEG)  # padded edges out of the max

    # stable segment softmax incl. the self logit
    m = jnp.max(jnp.where(R, logit[:, None], _NEG), axis=0)  # [W]
    m = jnp.maximum(m, sl)
    m_g = jnp.sum(jnp.where(R, m[None, :], 0.0), axis=1)  # m[rcv[e]]
    p = jnp.exp(logit - m_g) * w  # [EPB]
    p_self = jnp.exp(sl - m)  # [W]
    den = jnp.sum(jnp.where(R, p[:, None], 0.0), axis=0) + p_self

    # weighted aggregation on the MXU
    prec = _precision(compute_dtype)
    msg = jnp.dot(
        S.astype(compute_dtype), x_ref[0].astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    ) + e_ref[0]
    numer = jnp.dot(
        R.astype(compute_dtype).T,
        (p[:, None] * msg).astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    )
    numer = numer + p_self[:, None] * ms_ref[0]
    out_ref[0] = numer / den[:, None]


def blocked_gat_forward(
    x: jnp.ndarray,  # [N, H, D] transformed node features (per head)
    e: jnp.ndarray,  # [E, H, D] per-edge embeddings (per head)
    e_self: jnp.ndarray,  # [H, D] synthetic self-loop embedding
    a_i: jnp.ndarray,  # [1, H, D] receiver attention vector
    a_j: jnp.ndarray,  # [1, H, D] sender attention vector
    senders: jnp.ndarray,  # [E] int32 global (block-diagonal layout)
    receivers: jnp.ndarray,  # [E]
    edge_w: jnp.ndarray,  # [E] f32, 0 = padded
    slope: float,
    block_nodes: int,
    block_edges: int,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention forward. Returns [N, H, D] (pre head-mean)."""
    N, H, D = x.shape
    E = senders.shape[0]
    nb = N // block_nodes
    assert E == nb * block_edges, (E, nb, block_edges)
    DP = _round_up(D, 128)

    def pad_hd(a):  # [., H, D] -> [H, ., DP]
        a = jnp.moveaxis(a, 1, 0)
        if D != DP:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, DP - D)))
        return a

    x3 = pad_hd(x)  # [H, N, DP]
    e3 = pad_hd(e)  # [H, E, DP]
    ms = pad_hd(x + e_self[None])  # self-loop message [H, N, DP]

    ps = jnp.einsum("nhd,hd->hn", x, a_i[0])  # [H, N]
    pd = jnp.einsum("nhd,hd->hn", x, a_j[0])
    pe = jnp.einsum("ehd,hd->he", e, a_j[0])  # [H, E]
    sl = ps + pd + jnp.einsum("hd,hd->h", e_self, a_j[0])[:, None]
    sl = jnp.where(sl >= 0, sl, slope * sl)  # [H, N]

    # per-(head, block) scalar rows are flattened to [H*nb, 1, k] so the
    # trailing block dims (1, k) equal the array dims (Mosaic tiling rule)
    shape3 = lambda a, k: a.reshape(H * nb, 1, k)
    idx3 = lambda a: a.reshape(nb, 1, block_edges)

    b_spec = lambda k: pl.BlockSpec(
        (1, 1, k), lambda h, b: (h * nb + b, 0, 0), **_vmem()
    )
    idx_spec = pl.BlockSpec(
        (1, 1, block_edges), lambda h, b: (b, 0, 0), **_vmem()
    )
    feat_spec = lambda k: pl.BlockSpec(
        (1, k, DP), lambda h, b: (h, b, 0), **_vmem()
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, block_nodes, block_edges, slope, compute_dtype
        ),
        grid=(H, nb),
        in_specs=[
            idx_spec, idx_spec, idx_spec,
            b_spec(block_nodes),  # ps
            b_spec(block_nodes),  # pd
            b_spec(block_edges),  # pe
            b_spec(block_nodes),  # sl
            feat_spec(block_nodes),  # x3
            feat_spec(block_edges),  # e3
            feat_spec(block_nodes),  # ms
        ],
        out_specs=feat_spec(block_nodes),
        out_shape=jax.ShapeDtypeStruct((H, N, DP), jnp.float32),
        interpret=interpret,
    )(
        idx3(senders), idx3(receivers), idx3(edge_w.astype(jnp.float32)),
        shape3(ps, block_nodes), shape3(pd, block_nodes),
        shape3(pe, block_edges), shape3(sl, block_nodes),
        x3, e3, ms,
    )
    return jnp.moveaxis(out[:, :, :D], 0, 1)  # [N, H, D]


def _bwd_kernel(block_nodes, block_edges, slope, compute_dtype,
                snd_ref, rcv_ref, w_ref, ps_ref, pd_ref, pe_ref, sraw_ref,
                x_ref, e_ref, ms_ref, g_ref,
                de_ref, dxp_ref, dz_ref, dps_ref, dpd_ref, dzs_ref,
                as_ref):
    b = pl.program_id(1)
    base = b * block_nodes
    snd = snd_ref[0, 0, :] - base
    rcv = rcv_ref[0, 0, :] - base
    w = w_ref[0, 0, :]
    node_ids = jax.lax.broadcasted_iota(
        jnp.int32, (block_edges, block_nodes), 1
    )
    S = snd[:, None] == node_ids
    R = rcv[:, None] == node_ids
    prec = _precision(compute_dtype)

    ps = ps_ref[0, 0, :]
    pd = pd_ref[0, 0, :]
    pe = pe_ref[0, 0, :]
    sraw = sraw_ref[0, 0, :]
    sl = jnp.where(sraw >= 0, sraw, slope * sraw)

    # recompute the forward softmax (identical to _kernel)
    ps_g = jnp.sum(jnp.where(R, ps[None, :], 0.0), axis=1)
    pd_g = jnp.sum(jnp.where(S, pd[None, :], 0.0), axis=1)
    raw = ps_g + pd_g + pe
    logit = jnp.where(raw >= 0, raw, slope * raw)
    logit = jnp.where(w > 0, logit, _NEG)
    m = jnp.max(jnp.where(R, logit[:, None], _NEG), axis=0)
    m = jnp.maximum(m, sl)
    m_g = jnp.sum(jnp.where(R, m[None, :], 0.0), axis=1)
    p = jnp.exp(logit - m_g) * w
    p_self = jnp.exp(sl - m)
    den = jnp.sum(jnp.where(R, p[:, None], 0.0), axis=0) + p_self
    # padded edge slots have no receiver row in this block (R all-false):
    # den_g would be 0 there while p is already 0 — guard the 0/0
    den_g = jnp.sum(jnp.where(R, den[None, :], 0.0), axis=1)
    alpha = p / jnp.maximum(den_g, 1e-30)  # [EPB]
    aself = p_self / den  # [W]

    g = g_ref[0]  # [W, DP] upstream gradient
    ms = ms_ref[0]
    msg = jnp.dot(
        S.astype(compute_dtype), x_ref[0].astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    ) + e_ref[0]
    g_r = jnp.dot(
        R.astype(compute_dtype), g.astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    )  # [EPB, DP] = g[rcv[e]]

    d_alpha = jnp.sum(g_r * msg, axis=1)  # [EPB]
    d_aself = jnp.sum(g * ms, axis=1)  # [W]
    c = (
        jnp.sum(jnp.where(R, (alpha * d_alpha)[:, None], 0.0), axis=0)
        + aself * d_aself
    )  # [W]
    c_g = jnp.sum(jnp.where(R, c[None, :], 0.0), axis=1)
    dz = alpha * (d_alpha - c_g)
    dz = dz * jnp.where(raw >= 0, 1.0, slope)
    dzs = aself * (d_aself - c)
    dzs = dzs * jnp.where(sraw >= 0, 1.0, slope)

    dmsg = alpha[:, None] * g_r  # [EPB, DP] = de (message tile grad)
    de_ref[0] = dmsg
    dxp_ref[0] = jnp.dot(
        S.astype(compute_dtype).T, dmsg.astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    ) + aself[:, None] * g
    dz_ref[0, 0, :] = dz
    dps_ref[0, 0, :] = jnp.sum(jnp.where(R, dz[:, None], 0.0), axis=0)
    dpd_ref[0, 0, :] = jnp.sum(jnp.where(S, dz[:, None], 0.0), axis=0)
    dzs_ref[0, 0, :] = dzs
    as_ref[0, 0, :] = aself


def blocked_gat_backward(
    x: jnp.ndarray,  # [N, H, D]
    e: jnp.ndarray,  # [E, H, D]
    e_self: jnp.ndarray,  # [H, D]
    a_i: jnp.ndarray,  # [1, H, D]
    a_j: jnp.ndarray,  # [1, H, D]
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_w: jnp.ndarray,  # [E] f32
    g: jnp.ndarray,  # [N, H, D] upstream gradient
    slope: float,
    block_nodes: int,
    block_edges: int,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Fused backward. Returns (dx, de, de_self, da_i, da_j) with the
    same shapes as the inputs."""
    N, H, D = x.shape
    E = senders.shape[0]
    nb = N // block_nodes
    DP = _round_up(D, 128)

    def pad_hd(a):
        a = jnp.moveaxis(a, 1, 0)
        if D != DP:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, DP - D)))
        return a

    x3 = pad_hd(x)
    e3 = pad_hd(e)
    ms = pad_hd(x + e_self[None])
    g3 = pad_hd(g)

    ps = jnp.einsum("nhd,hd->hn", x, a_i[0])
    pd = jnp.einsum("nhd,hd->hn", x, a_j[0])
    pe = jnp.einsum("ehd,hd->he", e, a_j[0])
    sraw = ps + pd + jnp.einsum("hd,hd->h", e_self, a_j[0])[:, None]

    shape3 = lambda a, k: a.reshape(H * nb, 1, k)
    idx3 = lambda a: a.reshape(nb, 1, block_edges)
    b_spec = lambda k: pl.BlockSpec(
        (1, 1, k), lambda h, b: (h * nb + b, 0, 0), **_vmem()
    )
    idx_spec = pl.BlockSpec(
        (1, 1, block_edges), lambda h, b: (b, 0, 0), **_vmem()
    )
    feat_spec = lambda k: pl.BlockSpec(
        (1, k, DP), lambda h, b: (h, b, 0), **_vmem()
    )

    de3, dxp3, dz, dps_e, dpd_e, dzs, aself = pl.pallas_call(
        functools.partial(
            _bwd_kernel, block_nodes, block_edges, slope, compute_dtype
        ),
        grid=(H, nb),
        in_specs=[
            idx_spec, idx_spec, idx_spec,
            b_spec(block_nodes), b_spec(block_nodes),
            b_spec(block_edges), b_spec(block_nodes),
            feat_spec(block_nodes), feat_spec(block_edges),
            feat_spec(block_nodes), feat_spec(block_nodes),
        ],
        out_specs=[
            feat_spec(block_edges),  # de tile
            feat_spec(block_nodes),  # dx message-path
            b_spec(block_edges),  # dz
            b_spec(block_nodes),  # dps_e
            b_spec(block_nodes),  # dpd_e
            b_spec(block_nodes),  # dzs
            b_spec(block_nodes),  # alpha_self
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, E, DP), jnp.float32),
            jax.ShapeDtypeStruct((H, N, DP), jnp.float32),
            jax.ShapeDtypeStruct((H * nb, 1, block_edges), jnp.float32),
            jax.ShapeDtypeStruct((H * nb, 1, block_nodes), jnp.float32),
            jax.ShapeDtypeStruct((H * nb, 1, block_nodes), jnp.float32),
            jax.ShapeDtypeStruct((H * nb, 1, block_nodes), jnp.float32),
            jax.ShapeDtypeStruct((H * nb, 1, block_nodes), jnp.float32),
        ],
        interpret=interpret,
    )(
        idx3(senders), idx3(receivers), idx3(edge_w.astype(jnp.float32)),
        shape3(ps, block_nodes), shape3(pd, block_nodes),
        shape3(pe, block_edges), shape3(sraw, block_nodes),
        x3, e3, ms, g3,
    )

    dz = dz.reshape(H, E)
    dps_e = dps_e.reshape(H, N)
    dpd_e = dpd_e.reshape(H, N)
    dzs = dzs.reshape(H, N)
    aself = aself.reshape(H, N)
    de_msg = jnp.moveaxis(de3[:, :, :D], 0, 1)  # [E, H, D]
    dx_msg = jnp.moveaxis(dxp3[:, :, :D], 0, 1)  # [N, H, D]

    # projection outer products (tiny; left to XLA)
    ai = a_i[0]  # [H, D]
    aj = a_j[0]
    dx = (
        dx_msg
        + (dps_e + dzs).T[:, :, None] * ai[None]
        + (dpd_e + dzs).T[:, :, None] * aj[None]
    )
    de = de_msg + dz.T[:, :, None] * aj[None]
    de_self = (
        jnp.einsum("hn,nhd->hd", aself, g)
        + jnp.sum(dzs, axis=1)[:, None] * aj
    )
    da_i = jnp.einsum("nhd,hn->hd", x, dps_e + dzs)[None]
    da_j = (
        jnp.einsum("nhd,hn->hd", x, dpd_e + dzs)
        + jnp.einsum("ehd,he->hd", e, dz)
        + jnp.sum(dzs, axis=1)[:, None] * e_self
    )[None]
    return dx, de, de_self, da_i, da_j
