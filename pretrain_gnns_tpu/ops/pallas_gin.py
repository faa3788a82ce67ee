"""Whole-conv fused GIN kernel (Pallas TPU).

The r4 profile (docs/PERFORMANCE.md §1) showed the train step is
op-count-bound: no single op above ~1.6%, the time spread across dozens
of small per-layer fusions between the SpMM kernels and the GIN MLP
matmuls. This kernel executes the ENTIRE GIN conv layer
(chem/model.py:15-55) in one pallas_call per direction:

    msg_e  = w_e * (x[snd_e] + (ein_e @ We))       gather + edge embed
    aggr_i = sum_{rcv_e = i} msg_e + (x_i + e_self) * nmask_i
    out    = relu(aggr @ W1 + b1) @ W2 + b2        the GIN MLP

so the [N, 300] aggregate and the [N, 600] hidden activation never
round-trip HBM, the MLP matmuls ride the same VMEM residency as the
one-hot passes, and the per-layer XLA op chain collapses to one op.
The BatchNorm that follows (masked batch stats) stays outside — its
statistics are a cross-block reduction.

Backward recomputes msg/aggr/z per block (MXU recompute is cheaper than
an HBM round-trip of the [N, 600] residual) and accumulates dW1/db1/
dW2/db2/dWe/de_self across the sequential grid in VMEM-resident
accumulator outputs, like the fused-SpMM dW (pallas_spmm.py).

Precision: matmuls run in ``compute_dtype`` operands with f32
accumulation. bf16 operand rounding matches the bfloat16_act regime the
e2e bench runs in (a bf16*bf16 product is exact in the f32 accumulator,
so this equals an f32 matmul of bf16-rounded inputs up to accumulation
order); parity tests pin float32.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from pretrain_gnns_tpu.ops.pallas_spmm import (
    _fp, _pack_idx, _pad_f, _pick_group, _precision, _vmem,
)


def _fwd_kernel(group, block_nodes, block_edges, compute_dtype, out_dtype,
                save_res, idx_ref, w_ref, nm_ref, ein_ref, We_ref, es_ref,
                x_ref, W1_ref, b1_ref, W2_ref, b2_ref, out_ref,
                *res_refs):
    if save_res:
        aggr_ref, z_ref = res_refs
    prec = _precision(compute_dtype)
    b = pl.program_id(0)
    We = We_ref[:].astype(compute_dtype)
    W1 = W1_ref[:].astype(compute_dtype)
    W2 = W2_ref[:].astype(compute_dtype)
    b1 = b1_ref[0, :]
    b2 = b2_ref[0, :]
    es = es_ref[0, :]
    node_ids = jax.lax.broadcasted_iota(
        jnp.int32, (block_edges, block_nodes), 1
    )
    # pass 1 — per-block aggregation (the one-hot contraction depth is
    # capped at block_nodes by construction)
    parts = []
    for j in range(group):
        base = (b * group + j) * block_nodes
        snd = idx_ref[0, 2 * j, :] - base
        rcv = idx_ref[0, 2 * j + 1, :] - base
        w = w_ref[0, j, :]
        nm = nm_ref[0, j, :]
        xj = x_ref[j * block_nodes:(j + 1) * block_nodes, :]
        ein_w = (
            ein_ref[j * block_edges:(j + 1) * block_edges, :]
            .astype(jnp.float32) * w[:, None]
        )
        S_w = jnp.where(
            snd[:, None] == node_ids, w[:, None], 0.0
        ).astype(compute_dtype)
        msg = jnp.dot(
            S_w, xj.astype(compute_dtype),
            preferred_element_type=jnp.float32, precision=prec,
        ) + jnp.dot(
            ein_w.astype(compute_dtype), We,
            preferred_element_type=jnp.float32, precision=prec,
        )
        R = (rcv[:, None] == node_ids).astype(compute_dtype)
        aggr = jnp.dot(
            R.T, msg.astype(compute_dtype),
            preferred_element_type=jnp.float32, precision=prec,
        )
        parts.append(aggr + (xj.astype(jnp.float32) + es) * nm[:, None])
    # pass 2 — the GIN MLP over the whole group at once: M = group *
    # block_nodes rows per matmul instead of block_nodes (8x deeper MXU
    # utilization than per-block MLPs; measured in PERFORMANCE.md r5)
    aggr_g = jnp.concatenate(parts, axis=0)
    z = jnp.maximum(
        jnp.dot(aggr_g.astype(compute_dtype), W1,
                preferred_element_type=jnp.float32, precision=prec)
        + b1,
        0.0,
    )
    o = jnp.dot(
        z.astype(compute_dtype), W2,
        preferred_element_type=jnp.float32, precision=prec,
    ) + b2
    out_ref[:] = o.astype(out_dtype)
    if save_res:
        aggr_ref[:] = aggr_g.astype(aggr_ref.dtype)
        z_ref[:] = z.astype(z_ref.dtype)


def _bwd_kernel(group, block_nodes, block_edges, compute_dtype,
                idx_ref, w_ref, nm_ref, ein_ref, W1_ref, W2_ref,
                aggr_ref, z_ref, g_ref,
                dx_ref, dWe_ref, des_ref, dW1_ref, db1_ref, dW2_ref,
                db2_ref):
    """Backward from SAVED residuals (aggr, z): recomputing them in here
    costs ~0.26 ms/step of extra MXU work — a measured e2e regression
    (7.16 -> 6.27 M edges/s) vs the ~35 us HBM round-trip of storing
    them (docs/PERFORMANCE.md r5)."""
    prec = _precision(compute_dtype)
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dWe_ref[:] = jnp.zeros_like(dWe_ref)
        des_ref[:] = jnp.zeros_like(des_ref)
        dW1_ref[:] = jnp.zeros_like(dW1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dW2_ref[:] = jnp.zeros_like(dW2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    W1 = W1_ref[:].astype(compute_dtype)
    W2 = W2_ref[:].astype(compute_dtype)
    node_ids = jax.lax.broadcasted_iota(
        jnp.int32, (block_edges, block_nodes), 1
    )
    # ---- MLP backward, whole group at once (relu mask from the saved
    # activation: z > 0 iff zpre > 0); group-deep contractions for the
    # weight gradients
    g_all = g_ref[:].astype(compute_dtype)
    z_all = z_ref[:]
    aggr_all = aggr_ref[:]
    dz = jnp.dot(g_all, W2.T, preferred_element_type=jnp.float32,
                 precision=prec)
    dW2_ref[:] += jnp.dot(
        z_all.astype(compute_dtype).T, g_all,
        preferred_element_type=jnp.float32, precision=prec,
    )
    db2_ref[0, :] += jnp.sum(g_all.astype(jnp.float32), axis=0)
    dzr = jnp.where(z_all.astype(jnp.float32) > 0.0, dz, 0.0)
    dW1_ref[:] += jnp.dot(
        aggr_all.astype(compute_dtype).T, dzr.astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    )
    db1_ref[0, :] += jnp.sum(dzr, axis=0)
    da_all = jnp.dot(
        dzr.astype(compute_dtype), W1.T,
        preferred_element_type=jnp.float32, precision=prec,
    )
    # ---- aggregation backward, per block
    for j in range(group):
        base = (b * group + j) * block_nodes
        snd = idx_ref[0, 2 * j, :] - base
        rcv = idx_ref[0, 2 * j + 1, :] - base
        w = w_ref[0, j, :]
        nm = nm_ref[0, j, :]
        sl = slice(j * block_nodes, (j + 1) * block_nodes)
        da = da_all[j * block_nodes:(j + 1) * block_nodes, :]
        ein_w = (
            ein_ref[j * block_edges:(j + 1) * block_edges, :]
            .astype(jnp.float32) * w[:, None]
        )
        da_nm = da * nm[:, None]
        des_ref[0, :] += jnp.sum(da_nm, axis=0)
        R = (rcv[:, None] == node_ids).astype(compute_dtype)
        dmsg = jnp.dot(
            R, da.astype(compute_dtype),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dWe_ref[:] += jnp.dot(
            ein_w.astype(compute_dtype).T, dmsg.astype(compute_dtype),
            preferred_element_type=jnp.float32, precision=prec,
        )
        S_w = jnp.where(
            snd[:, None] == node_ids, w[:, None], 0.0
        ).astype(compute_dtype)
        dxj = jnp.dot(
            S_w.T, dmsg.astype(compute_dtype),
            preferred_element_type=jnp.float32, precision=prec,
        ) + da_nm
        dx_ref[sl, :] = dxj.astype(dx_ref.dtype)


def _common_specs(n_blocks, G, block_nodes, block_edges, K, FP, F2):
    idx_spec = pl.BlockSpec((1, 2 * G, block_edges), lambda b: (b, 0, 0),
                            **_vmem())
    w_spec = pl.BlockSpec((1, G, block_edges), lambda b: (b, 0, 0),
                          **_vmem())
    nm_spec = pl.BlockSpec((1, G, block_nodes), lambda b: (b, 0, 0),
                           **_vmem())
    ein_spec = pl.BlockSpec((G * block_edges, K), lambda b: (b, 0),
                            **_vmem())
    We_spec = pl.BlockSpec((K, FP), lambda b: (0, 0), **_vmem())
    es_spec = pl.BlockSpec((1, FP), lambda b: (0, 0), **_vmem())
    x_spec = pl.BlockSpec((G * block_nodes, FP), lambda b: (b, 0),
                          **_vmem())
    W1_spec = pl.BlockSpec((FP, F2), lambda b: (0, 0), **_vmem())
    b1_spec = pl.BlockSpec((1, F2), lambda b: (0, 0), **_vmem())
    W2_spec = pl.BlockSpec((F2, FP), lambda b: (0, 0), **_vmem())
    b2_spec = pl.BlockSpec((1, FP), lambda b: (0, 0), **_vmem())
    return (idx_spec, w_spec, nm_spec, ein_spec, We_spec, es_spec, x_spec,
            W1_spec, b1_spec, W2_spec, b2_spec)


def _prep(x, ein, We, e_self, W1, b1, W2, b2, senders, receivers, w,
          nmask, block_nodes, block_edges):
    N, F = x.shape
    E = senders.shape[0]
    n_blocks = N // block_nodes
    G = _pick_group(n_blocks)
    FP = _fp(F)
    F2 = W1.shape[1]
    K = We.shape[0]
    args = [
        _pack_idx(senders, receivers, n_blocks, block_edges, G),
        w.astype(jnp.float32).reshape(n_blocks // G, G, block_edges),
        nmask.astype(jnp.float32).reshape(n_blocks // G, G, block_nodes),
        ein,
        _pad_f(We, FP),
        _pad_f(e_self.reshape(1, F), FP),
        _pad_f(x, FP),
        jnp.pad(W1, ((0, FP - F), (0, 0))) if FP != F else W1,
        b1.reshape(1, F2),
        _pad_f(W2, FP),
        _pad_f(b2.reshape(1, F), FP),
    ]
    return args, (N, F, E, n_blocks, G, FP, F2, K)


def _call_fwd(x, ein, We, e_self, W1, b1, W2, b2, senders, receivers, w,
              nmask, block_nodes, block_edges, compute_dtype, interpret,
              save_res: bool = False):
    args, (N, F, E, n_blocks, G, FP, F2, K) = _prep(
        x, ein, We, e_self, W1, b1, W2, b2, senders, receivers, w, nmask,
        block_nodes, block_edges,
    )
    node_spec = pl.BlockSpec((G * block_nodes, FP), lambda b: (b, 0),
                             **_vmem())
    out_specs = [node_spec]
    out_shapes = [jax.ShapeDtypeStruct((N, FP), x.dtype)]
    if save_res:
        out_specs += [
            node_spec,
            pl.BlockSpec((G * block_nodes, F2), lambda b: (b, 0),
                         **_vmem()),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((N, FP), compute_dtype),
            jax.ShapeDtypeStruct((N, F2), compute_dtype),
        ]
    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, G, block_nodes, block_edges, compute_dtype,
            x.dtype,  # match what the flax Dense chain would return
            save_res,
        ),
        grid=(n_blocks // G,),
        in_specs=list(_common_specs(n_blocks, G, block_nodes, block_edges,
                                    K, FP, F2)),
        out_specs=out_specs if save_res else out_specs[0],
        out_shape=out_shapes if save_res else out_shapes[0],
        interpret=interpret,
    )(*args)
    if not save_res:
        return outs[:, :F]
    out, aggr, z = outs
    return out[:, :F], aggr, z


def _call_bwd(g, aggr, z, ein, W1, W2, K, senders, receivers, w, nmask,
              block_nodes, block_edges, compute_dtype, interpret):
    N, F = g.shape
    E = senders.shape[0]
    n_blocks = N // block_nodes
    G = _pick_group(n_blocks)
    FP = _fp(F)
    F2 = W1.shape[1]
    args = [
        _pack_idx(senders, receivers, n_blocks, block_edges, G),
        w.astype(jnp.float32).reshape(n_blocks // G, G, block_edges),
        nmask.astype(jnp.float32).reshape(n_blocks // G, G, block_nodes),
        ein,
        jnp.pad(W1, ((0, FP - F), (0, 0))) if FP != F else W1,
        _pad_f(W2, FP),
        aggr,  # [N, FP] (saved padded by the fwd)
        z,  # [N, F2]
        _pad_f(g, FP),
    ]
    node_spec = pl.BlockSpec((G * block_nodes, FP), lambda b: (b, 0),
                             **_vmem())
    in_specs = [
        pl.BlockSpec((1, 2 * G, block_edges), lambda b: (b, 0, 0),
                     **_vmem()),
        pl.BlockSpec((1, G, block_edges), lambda b: (b, 0, 0), **_vmem()),
        pl.BlockSpec((1, G, block_nodes), lambda b: (b, 0, 0), **_vmem()),
        pl.BlockSpec((G * block_edges, K), lambda b: (b, 0), **_vmem()),
        pl.BlockSpec((FP, F2), lambda b: (0, 0), **_vmem()),
        pl.BlockSpec((F2, FP), lambda b: (0, 0), **_vmem()),
        node_spec,
        pl.BlockSpec((G * block_nodes, F2), lambda b: (b, 0), **_vmem()),
        node_spec,
    ]
    acc = lambda r, c: pl.BlockSpec((r, c), lambda b: (0, 0), **_vmem())
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, G, block_nodes, block_edges, compute_dtype,
        ),
        grid=(n_blocks // G,),
        in_specs=in_specs,
        out_specs=[
            node_spec,
            acc(K, FP), acc(1, FP), acc(FP, F2), acc(1, F2), acc(F2, FP),
            acc(1, FP),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, FP), jnp.float32),
            jax.ShapeDtypeStruct((K, FP), jnp.float32),
            jax.ShapeDtypeStruct((1, FP), jnp.float32),
            jax.ShapeDtypeStruct((FP, F2), jnp.float32),
            jax.ShapeDtypeStruct((1, F2), jnp.float32),
            jax.ShapeDtypeStruct((F2, FP), jnp.float32),
            jax.ShapeDtypeStruct((1, FP), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    dx, dWe, des, dW1, db1, dW2, db2 = outs
    return (dx[:, :F], dWe[:, :F], des[0, :F], dW1[:F, :], db1[0],
            dW2[:, :F], db2[0, :F])


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def fused_gin_conv(
    x: jnp.ndarray,  # [N, F] node features
    ein: jnp.ndarray,  # [E, K] per-edge one-hot bond features
    We: jnp.ndarray,  # [K, F] stacked edge-embedding tables
    e_self: jnp.ndarray,  # [F] self-loop embedding
    W1: jnp.ndarray,  # [F, 2F] mlp_0 kernel
    b1: jnp.ndarray,  # [2F]
    W2: jnp.ndarray,  # [2F, F] mlp_2 kernel
    b2: jnp.ndarray,  # [F]
    senders: jnp.ndarray,  # [E] int32 global
    receivers: jnp.ndarray,  # [E] int32 global
    w: jnp.ndarray,  # [E] f32 edge weight (mask folded)
    nmask: jnp.ndarray,  # [N] bool/f32 node validity
    block_nodes: int,
    block_edges: int,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """relu((scatter_sum + self) @ W1 + b1) @ W2 + b2, one kernel."""
    return _call_fwd(x, ein, We, e_self, W1, b1, W2, b2, senders,
                     receivers, w, nmask, block_nodes, block_edges,
                     compute_dtype, interpret)


def _gin_fwd(x, ein, We, e_self, W1, b1, W2, b2, senders, receivers, w,
             nmask, block_nodes, block_edges, compute_dtype, interpret):
    out, aggr, z = _call_fwd(x, ein, We, e_self, W1, b1, W2, b2, senders,
                             receivers, w, nmask, block_nodes, block_edges,
                             compute_dtype, interpret, save_res=True)
    return out, (x, ein, We.shape[0], aggr, z, W1, W2, senders, receivers,
                 w, nmask)


def _gin_bwd(block_nodes, block_edges, compute_dtype, interpret,
             residuals, g):
    (x, ein, K, aggr, z, W1, W2, senders, receivers, w,
     nmask) = residuals
    dx, dWe, des, dW1, db1, dW2, db2 = _call_bwd(
        g, aggr, z, ein, W1, W2, K, senders, receivers, w, nmask,
        block_nodes, block_edges, compute_dtype, interpret,
    )
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dx.astype(x.dtype), jnp.zeros_like(ein), dWe, des, dW1, db1,
            dW2, db2, f0(senders), f0(receivers), jnp.zeros_like(w),
            jnp.zeros_like(nmask, jnp.float32)
            if nmask.dtype != jnp.bool_ else f0(nmask))


fused_gin_conv.defvjp(_gin_fwd, _gin_bwd)


_FUSED_ENV = os.environ.get("PGT_GIN_FUSED", "auto")


def set_fused(name: str) -> None:
    global _FUSED_ENV
    if name not in ("auto", "on", "off"):
        raise ValueError(name)
    _FUSED_ENV = name


def use_fused_conv(blocked: bool) -> bool:
    """Whole-conv kernel gate: on TPU for blocked batches (auto), 'on'
    forces it everywhere (interpret off-TPU — tests), 'off' disables.
    Follows the spmm backend switch: PGT_SPMM_BACKEND=xla turns every
    Pallas path off together."""
    from pretrain_gnns_tpu.ops import spmm

    if not blocked or _FUSED_ENV == "off":
        return False
    if _FUSED_ENV == "on":
        return True
    if spmm.get_backend() == "xla":
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False
