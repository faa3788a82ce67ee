"""EXPERIMENT (VERDICT r3 item 6): receiver-sorted in-block segment-sum
SpMM — an alternative to the one-hot-matmul scatter in ops/pallas_spmm.py.

The one-hot formulation pays a BN=block_nodes× FLOP amplification to keep
the irregular scatter on the MXU (docs/PERFORMANCE.md §1). If edges are
sorted by receiver WITHIN each block, the scatter is a segment reduction
over contiguous runs, which needs no ``Rᵀ`` matmul:

    msg   = S @ x + ee                  (gather term unchanged)
    csum  = cumsum(msg, axis=0)         (VPU)
    cnt≤n = Σ_e [rcv_e <= n]            (one [W, EPB] compare+reduce, VPU)
    out[n] = csum[cnt≤n - 1] - csum[cnt<n - 1]   (2 boundary rows per node)

The boundary rows are fetched with per-node dynamic slices — W tiny
dynamic row reads per block, the exact pattern TPUs are documented to
dislike; whether the saved Rᵀ MXU pass beats W serialized row reads is an
empirical question, answered by ``scripts/kernel_micro.py`` and recorded
in docs/PERFORMANCE.md. Padded edge slots carry w=0 so their position in
the sort order never corrupts the sums.

Forward only: the experiment compares scatter strategies; training would
also need the transposed pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pretrain_gnns_tpu.ops.pallas_spmm import (
    _fp, _pad_f, _precision, _reshape_idx, _vmem,
)


def _sorted_fwd_kernel(has_ee, block_nodes, block_edges, compute_dtype,
                       snd_ref, rcv_ref, w_ref, x_ref, *rest):
    if has_ee:
        ee_ref, out_ref, cz_ref = rest
    else:
        (out_ref, cz_ref) = rest
    b = pl.program_id(0)
    base = b * block_nodes
    snd = snd_ref[0, 0, :] - base
    rcv = rcv_ref[0, 0, :] - base  # SORTED ascending within the block
    w = w_ref[0, 0, :]
    prec = _precision(compute_dtype)

    # gather term: identical to the baseline (the experiment isolates the
    # scatter side)
    node_ids = jax.lax.broadcasted_iota(
        jnp.int32, (block_edges, block_nodes), 1
    )
    S = (snd[:, None] == node_ids).astype(compute_dtype)
    msg = jnp.dot(
        S, x_ref[:].astype(compute_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    )
    if has_ee:
        msg = msg + ee_ref[:]
    msg = msg * w[:, None]

    # segment reduction over sorted runs: running sums + boundary diffs.
    # Mosaic has no cumsum lowering: log-depth prefix sum via shifted adds
    # (ceil(log2(EPB)) passes over the [EPB, F] tile on the VPU)
    csum = msg.astype(jnp.float32)
    k = 1
    while k < block_edges:
        shifted = jnp.concatenate(
            [jnp.zeros((k, csum.shape[1]), jnp.float32), csum[:-k]],
            axis=0,
        )
        csum = csum + shifted
        k *= 2
    # boundary rows must be read back with dynamic indices, which Mosaic
    # supports only on refs — stage the (zero-prepended) prefix sums in a
    # VMEM scratch
    cz_ref[0, :] = jnp.zeros((csum.shape[1],), jnp.float32)
    cz_ref[1:block_edges + 1, :] = csum
    n_ids = jax.lax.broadcasted_iota(
        jnp.int32, (block_nodes, block_edges), 0
    )
    cnt_le = jnp.sum(
        (rcv[None, :] <= n_ids).astype(jnp.int32), axis=1
    )  # [W]
    cnt_lt = jnp.sum(
        (rcv[None, :] < n_ids).astype(jnp.int32), axis=1
    )
    for n in range(block_nodes):
        hi = cz_ref[pl.ds(cnt_le[n], 1), :]
        lo = cz_ref[pl.ds(cnt_lt[n], 1), :]
        out_ref[n, :] = (hi - lo)[0].astype(out_ref.dtype)


def sort_block_edges(senders, receivers, edge_weight, edge_emb,
                     n_blocks: int, block_edges: int):
    """Per-block stable sort of the edge slots by receiver (the packer
    could emit this order for free; done in-jit here so the sort cost can
    be measured separately)."""
    r2 = receivers.reshape(n_blocks, block_edges)
    order = jnp.argsort(r2, axis=1)
    take = lambda a: jnp.take_along_axis(
        a.reshape(n_blocks, block_edges), order, axis=1
    ).reshape(-1)
    ee = None
    if edge_emb is not None:
        ee = jnp.take_along_axis(
            edge_emb.reshape(n_blocks, block_edges, -1),
            order[..., None], axis=1,
        ).reshape(-1, edge_emb.shape[-1])
    return take(senders), take(receivers), take(edge_weight), ee


def sorted_blocked_spmm(
    x: jnp.ndarray,
    edge_emb,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,  # MUST be sorted ascending within each block
    edge_weight: jnp.ndarray,
    block_nodes: int,
    block_edges: int,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[r] = sum_e w[e] * (x[snd[e]] + ee[e]); scatter via cumsum +
    boundary diff instead of the Rᵀ one-hot matmul."""
    N, F = x.shape
    E = senders.shape[0]
    n_blocks = N // block_nodes
    assert E == n_blocks * block_edges
    FP = _fp(F)
    xp = _pad_f(x, FP)
    has_ee = edge_emb is not None
    args = [
        _reshape_idx(senders, n_blocks, block_edges),
        _reshape_idx(receivers, n_blocks, block_edges),
        _reshape_idx(edge_weight.astype(jnp.float32), n_blocks,
                     block_edges),
        xp,
    ]
    in_specs = [
        pl.BlockSpec((1, 1, block_edges), lambda b: (b, 0, 0), **_vmem()),
        pl.BlockSpec((1, 1, block_edges), lambda b: (b, 0, 0), **_vmem()),
        pl.BlockSpec((1, 1, block_edges), lambda b: (b, 0, 0), **_vmem()),
        pl.BlockSpec((block_nodes, FP), lambda b: (b, 0), **_vmem()),
    ]
    if has_ee:
        args.append(_pad_f(edge_emb, FP))
        in_specs.append(
            pl.BlockSpec((block_edges, FP), lambda b: (b, 0), **_vmem())
        )
    try:
        from jax.experimental.pallas import tpu as pltpu

        scratch = [pltpu.VMEM((block_edges + 8, FP), jnp.float32)]
    except Exception:  # pragma: no cover
        scratch = []
    out = pl.pallas_call(
        functools.partial(
            _sorted_fwd_kernel, has_ee, block_nodes, block_edges,
            compute_dtype,
        ),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_nodes, FP), lambda b: (b, 0), **_vmem()
        ),
        out_shape=jax.ShapeDtypeStruct((N, FP), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return out[:, :F]
