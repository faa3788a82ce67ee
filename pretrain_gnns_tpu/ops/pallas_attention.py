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

Grid (r5): ``nb // GROUP`` — each program owns GROUP consecutive node
blocks with BOTH heads unrolled inside, sharing the S/R one-hot builds
across heads (VMEM-budgeted group; measured NEUTRAL vs the r4
(heads, blocks) layout — the op is bound by its per-(block, head)
HBM traffic and op sequence, not program count). The real r5 GAT win is
the whole-conv kernel in ops/pallas_gat_conv.py, which removes the
[E, H, D] HBM tensors this kernel still consumes; this module remains
the attention-only A/B reference path (docs/PERFORMANCE.md §3).

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
import os
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
# blocks per grid step, bounded by a VMEM budget: the feature tiles
# ([H*W, DP] x / msg_self / grad and the [H*EPB, DP] edge tiles) double-
# buffer, so the per-program estimate must stay well under the ~16 MB
# scoped limit
_GROUP = int(os.environ.get("PGT_GAT_GROUP", "4"))
# conservative: Mosaic's scoped-vmem stack also holds the per-head
# [EPB, W] broadcast temporaries and the double-buffered block windows
# (measured: a 2.36 MB/block fwd estimate compiled to an 18.8 MB scoped
# allocation at G=2 — the multiplier is ~4x, so budget accordingly)
_VMEM_BUDGET = int(os.environ.get("PGT_GAT_VMEM", str(3 * 1024 * 1024)))


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _pick_group(nb: int, bytes_per_block: int) -> int:
    for g in (_GROUP, 4, 2):
        if (g >= 1 and nb % g == 0
                and g * bytes_per_block <= _VMEM_BUDGET):
            return g
    return 1


def _vmem():
    return dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {}


def _precision(compute_dtype):
    return (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT)


def _layouts(x, e, H, D, DP, nb, W, EPB, G,
             store_dtype=jnp.float32):
    """Host-side reshapes into the (G blocks) x (heads-inner) layout.
    Feature tiles are stored in the kernel's compute dtype (bf16 under
    the mixed-precision knob) — halves the VMEM tiles; the logit scalars
    stay f32."""

    def feat_nodes(a):  # [N, H, D] -> [nb, H*W, DP]
        a = a.astype(store_dtype)
        if D != DP:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, DP - D)))
        return a.reshape(nb, W, H, DP).transpose(0, 2, 1, 3) \
            .reshape(nb, H * W, DP)

    def feat_edges(a):  # [E, H, D] -> [nb, H*EPB, DP]
        a = a.astype(store_dtype)
        if D != DP:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, DP - D)))
        return a.reshape(nb, EPB, H, DP).transpose(0, 2, 1, 3) \
            .reshape(nb, H * EPB, DP)

    def rows_nodes(a):  # [H, N] -> [nb, H, W]
        return a.reshape(H, nb, W).transpose(1, 0, 2)

    def rows_edges(a):  # [H, E] -> [nb, H, EPB]
        return a.reshape(H, nb, EPB).transpose(1, 0, 2)

    return feat_nodes, feat_edges, rows_nodes, rows_edges


def _fwd_kernel(G, H, W, EPB, slope, compute_dtype,
                idx_ref, w_ref, ps_ref, pd_ref, pe_ref, sl_ref,
                x_ref, e_ref, ms_ref, out_ref):
    prec = _precision(compute_dtype)
    b = pl.program_id(0)
    node_ids = jax.lax.broadcasted_iota(jnp.int32, (EPB, W), 1)
    for j in range(G):
        base = (b * G + j) * W
        snd = idx_ref[0, 2 * j, :] - base
        rcv = idx_ref[0, 2 * j + 1, :] - base
        w = w_ref[0, j, :]
        S = snd[:, None] == node_ids  # shared across heads
        R = rcv[:, None] == node_ids
        Sc = S.astype(compute_dtype)
        Rc = R.astype(compute_dtype)
        for h in range(H):
            ps = ps_ref[j, h, :]
            pd = pd_ref[j, h, :]
            pe = pe_ref[j, h, :]
            sl = sl_ref[j, h, :]
            ps_g = jnp.sum(jnp.where(R, ps[None, :], 0.0), axis=1)
            pd_g = jnp.sum(jnp.where(S, pd[None, :], 0.0), axis=1)
            logit = ps_g + pd_g + pe
            logit = jnp.where(logit >= 0, logit, slope * logit)
            logit = jnp.where(w > 0, logit, _NEG)

            m = jnp.max(jnp.where(R, logit[:, None], _NEG), axis=0)
            m = jnp.maximum(m, sl)
            m_g = jnp.sum(jnp.where(R, m[None, :], 0.0), axis=1)
            p = jnp.exp(logit - m_g) * w
            p_self = jnp.exp(sl - m)
            den = jnp.sum(jnp.where(R, p[:, None], 0.0), axis=0) + p_self

            xs = slice(h * W + 0, h * W + W)
            es = slice(h * EPB, (h + 1) * EPB)
            msg = jnp.dot(
                Sc, x_ref[j, xs, :].astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=prec,
            ) + e_ref[j, es, :].astype(jnp.float32)
            numer = jnp.dot(
                Rc.T, (p[:, None] * msg).astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=prec,
            )
            numer = numer + p_self[:, None] * ms_ref[j, xs, :] \
                .astype(jnp.float32)
            out_ref[j, xs, :] = numer / den[:, None]


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
    W, EPB = block_nodes, block_edges
    nb = N // W
    assert E == nb * EPB, (E, nb, EPB)
    DP = _round_up(D, 128)
    isize = jnp.dtype(compute_dtype).itemsize
    bytes_pb = H * DP * ((2 * W + EPB) * isize + W * 4)
    G = _pick_group(nb, bytes_pb)
    fn, fe, rn, re = _layouts(x, e, H, D, DP, nb, W, EPB, G,
                              store_dtype=compute_dtype)

    ps = jnp.einsum("nhd,hd->hn", x, a_i[0])  # [H, N]
    pd = jnp.einsum("nhd,hd->hn", x, a_j[0])
    pe = jnp.einsum("ehd,hd->he", e, a_j[0])  # [H, E]
    sl = ps + pd + jnp.einsum("hd,hd->h", e_self, a_j[0])[:, None]
    sl = jnp.where(sl >= 0, sl, slope * sl)  # [H, N]

    idx = jnp.concatenate(
        [senders.reshape(nb, 1, EPB), receivers.reshape(nb, 1, EPB)],
        axis=1,
    ).reshape(nb // G, 2 * G, EPB)

    feat_spec = lambda k: pl.BlockSpec(
        (G, H * k, DP), lambda b: (b, 0, 0), **_vmem()
    )
    row_spec = lambda k: pl.BlockSpec(
        (G, H, k), lambda b: (b, 0, 0), **_vmem()
    )
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, G, H, W, EPB, slope, compute_dtype
        ),
        grid=(nb // G,),
        in_specs=[
            pl.BlockSpec((1, 2 * G, EPB), lambda b: (b, 0, 0), **_vmem()),
            pl.BlockSpec((1, G, EPB), lambda b: (b, 0, 0), **_vmem()),
            row_spec(W),  # ps
            row_spec(W),  # pd
            row_spec(EPB),  # pe
            row_spec(W),  # sl
            feat_spec(W),  # x
            feat_spec(EPB),  # e
            feat_spec(W),  # msg_self
        ],
        out_specs=feat_spec(W),
        out_shape=jax.ShapeDtypeStruct((nb, H * W, DP), jnp.float32),
        interpret=interpret,
    )(
        idx,
        edge_w.astype(jnp.float32).reshape(nb // G, G, EPB),
        rn(ps), rn(pd), re(pe), rn(sl),
        fn(x), fe(e), fn(x + e_self[None]),
    )
    return out.reshape(nb, H, W, DP).transpose(0, 2, 1, 3) \
        .reshape(N, H, DP)[:, :, :D]


def _bwd_kernel(G, H, W, EPB, slope, compute_dtype,
                idx_ref, w_ref, ps_ref, pd_ref, pe_ref, sraw_ref,
                x_ref, e_ref, ms_ref, g_ref,
                de_ref, dxp_ref, dz_ref, dps_ref, dpd_ref, dzs_ref,
                as_ref):
    prec = _precision(compute_dtype)
    b = pl.program_id(0)
    node_ids = jax.lax.broadcasted_iota(jnp.int32, (EPB, W), 1)
    for j in range(G):
        base = (b * G + j) * W
        snd = idx_ref[0, 2 * j, :] - base
        rcv = idx_ref[0, 2 * j + 1, :] - base
        w = w_ref[0, j, :]
        S = snd[:, None] == node_ids
        R = rcv[:, None] == node_ids
        Sc = S.astype(compute_dtype)
        Rc = R.astype(compute_dtype)
        for h in range(H):
            ps = ps_ref[j, h, :]
            pd = pd_ref[j, h, :]
            pe = pe_ref[j, h, :]
            sraw = sraw_ref[j, h, :]
            sl = jnp.where(sraw >= 0, sraw, slope * sraw)

            # recompute the forward softmax (identical to _fwd_kernel)
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
            # padded edge slots have no receiver row in this block (R
            # all-false): den_g would be 0 there while p is already 0 —
            # guard the 0/0
            den_g = jnp.sum(jnp.where(R, den[None, :], 0.0), axis=1)
            alpha = p / jnp.maximum(den_g, 1e-30)  # [EPB]
            aself = p_self / den  # [W]

            xs = slice(h * W, (h + 1) * W)
            es = slice(h * EPB, (h + 1) * EPB)
            g = g_ref[j, xs, :].astype(jnp.float32)  # [W, DP] upstream
            ms = ms_ref[j, xs, :].astype(jnp.float32)
            msg = jnp.dot(
                Sc, x_ref[j, xs, :].astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=prec,
            ) + e_ref[j, es, :].astype(jnp.float32)
            g_r = jnp.dot(
                Rc, g.astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=prec,
            )  # [EPB, DP] = g[rcv[e]]

            d_alpha = jnp.sum(g_r * msg, axis=1)  # [EPB]
            d_aself = jnp.sum(g * ms, axis=1)  # [W]
            c = (
                jnp.sum(jnp.where(R, (alpha * d_alpha)[:, None], 0.0),
                        axis=0)
                + aself * d_aself
            )  # [W]
            c_g = jnp.sum(jnp.where(R, c[None, :], 0.0), axis=1)
            dz = alpha * (d_alpha - c_g)
            dz = dz * jnp.where(raw >= 0, 1.0, slope)
            dzs = aself * (d_aself - c)
            dzs = dzs * jnp.where(sraw >= 0, 1.0, slope)

            dmsg = alpha[:, None] * g_r  # [EPB, DP] = de (message grad)
            de_ref[j, es, :] = dmsg
            dxp_ref[j, xs, :] = jnp.dot(
                Sc.T, dmsg.astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=prec,
            ) + aself[:, None] * g
            dz_ref[j, h, :] = dz
            dps_ref[j, h, :] = jnp.sum(jnp.where(R, dz[:, None], 0.0),
                                       axis=0)
            dpd_ref[j, h, :] = jnp.sum(jnp.where(S, dz[:, None], 0.0),
                                       axis=0)
            dzs_ref[j, h, :] = dzs
            as_ref[j, h, :] = aself


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
    W, EPB = block_nodes, block_edges
    nb = N // W
    DP = _round_up(D, 128)
    isize = jnp.dtype(compute_dtype).itemsize
    bytes_pb = H * DP * (
        (3 * W + EPB) * isize + (EPB + W) * 4
    )
    G = _pick_group(nb, bytes_pb)
    fn, fe, rn, re = _layouts(x, e, H, D, DP, nb, W, EPB, G,
                              store_dtype=compute_dtype)

    ps = jnp.einsum("nhd,hd->hn", x, a_i[0])
    pd = jnp.einsum("nhd,hd->hn", x, a_j[0])
    pe = jnp.einsum("ehd,hd->he", e, a_j[0])
    sraw = ps + pd + jnp.einsum("hd,hd->h", e_self, a_j[0])[:, None]

    idx = jnp.concatenate(
        [senders.reshape(nb, 1, EPB), receivers.reshape(nb, 1, EPB)],
        axis=1,
    ).reshape(nb // G, 2 * G, EPB)
    feat_spec = lambda k: pl.BlockSpec(
        (G, H * k, DP), lambda b: (b, 0, 0), **_vmem()
    )
    row_spec = lambda k: pl.BlockSpec(
        (G, H, k), lambda b: (b, 0, 0), **_vmem()
    )

    de3, dxp3, dz, dps_e, dpd_e, dzs, aself = pl.pallas_call(
        functools.partial(
            _bwd_kernel, G, H, W, EPB, slope, compute_dtype
        ),
        grid=(nb // G,),
        in_specs=[
            pl.BlockSpec((1, 2 * G, EPB), lambda b: (b, 0, 0), **_vmem()),
            pl.BlockSpec((1, G, EPB), lambda b: (b, 0, 0), **_vmem()),
            row_spec(W), row_spec(W), row_spec(EPB), row_spec(W),
            feat_spec(W), feat_spec(EPB), feat_spec(W), feat_spec(W),
        ],
        out_specs=[
            feat_spec(EPB),  # de tile
            feat_spec(W),  # dx message-path
            row_spec(EPB),  # dz
            row_spec(W),  # dps_e
            row_spec(W),  # dpd_e
            row_spec(W),  # dzs
            row_spec(W),  # alpha_self
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, H * EPB, DP), jnp.float32),
            jax.ShapeDtypeStruct((nb, H * W, DP), jnp.float32),
            jax.ShapeDtypeStruct((nb, H, EPB), jnp.float32),
            jax.ShapeDtypeStruct((nb, H, W), jnp.float32),
            jax.ShapeDtypeStruct((nb, H, W), jnp.float32),
            jax.ShapeDtypeStruct((nb, H, W), jnp.float32),
            jax.ShapeDtypeStruct((nb, H, W), jnp.float32),
        ],
        interpret=interpret,
    )(
        idx,
        edge_w.astype(jnp.float32).reshape(nb // G, G, EPB),
        rn(ps), rn(pd), re(pe), rn(sraw),
        fn(x), fe(e), fn(x + e_self[None]), fn(g),
    )

    dz = dz.transpose(1, 0, 2).reshape(H, E)
    dps_e = dps_e.transpose(1, 0, 2).reshape(H, N)
    dpd_e = dpd_e.transpose(1, 0, 2).reshape(H, N)
    dzs = dzs.transpose(1, 0, 2).reshape(H, N)
    aself = aself.transpose(1, 0, 2).reshape(H, N)
    de_msg = de3.reshape(nb, H, EPB, DP).transpose(0, 2, 1, 3) \
        .reshape(E, H, DP)[:, :, :D]
    dx_msg = dxp3.reshape(nb, H, W, DP).transpose(0, 2, 1, 3) \
        .reshape(N, H, DP)[:, :, :D]

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
