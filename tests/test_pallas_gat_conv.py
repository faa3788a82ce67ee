"""Whole-conv fused GAT kernel (ops/pallas_gat_conv.py) — interpret-mode
parity vs the unfused composition (flax projection + XLA/segment
attention), forward and every gradient leaf, for both domain flavors.

The r4 GAT path was HBM-bound on its [E, H, D] edge-embedding tensors
(~2.2 ms/op fwd+bwd regardless of matmul precision); the fused kernel
computes projections and edge embeds in-kernel and lifted masking_gat
e2e 1.11 -> 1.89 M edges/s (docs/PERFORMANCE.md §3)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pretrain_gnns_tpu.core import graphs as G
from pretrain_gnns_tpu.data.packing import PackedLoader, block_layout
from pretrain_gnns_tpu.data.synthetic import bio_dataset, molecule_dataset
from pretrain_gnns_tpu.models import bio, chem
from pretrain_gnns_tpu.ops import pallas_gin


@pytest.fixture
def restore_fused():
    prev = pallas_gin._FUSED_ENV
    yield
    pallas_gin.set_fused(prev)


def _check(model, batch, rtol=2e-4):
    var = model.init(jax.random.PRNGKey(0), batch, train=False)

    def loss(v, fused):
        pallas_gin.set_fused("on" if fused else "off")
        out = model.apply(v, batch, train=False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    l0 = loss(var, False)
    g0 = jax.grad(lambda v: loss(v, False))(var)
    l1 = loss(var, True)
    g1 = jax.grad(lambda v: loss(v, True))(var)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(float(np.max(np.abs(a))), 1e-6)
        np.testing.assert_allclose(
            b, a, atol=rtol * scale,
            err_msg=jax.tree_util.keystr(p),
        )


def test_fused_gat_matches_unfused_chem(restore_fused):
    graphs, _ = molecule_dataset(32, num_tasks=1, seed=0, mean_atoms=20)
    blocks = block_layout(graphs, 32, block_nodes=64, block_edges=192)
    batch = next(iter(PackedLoader(graphs, 32, shuffle=False,
                                   blocks=blocks)))
    _check(chem.GNN(num_layer=2, emb_dim=32, gnn_type="gat"), batch)


def test_fused_gat_matches_unfused_bio(restore_fused):
    graphs = [
        dataclasses.replace(g, extras={})
        for g in bio_dataset(8, num_downstream=2, seed=1, mean_nodes=20)
    ]
    packed = G.pack_graphs_blocked(graphs, 4, 64, 512, 8)
    _check(bio.GNN(num_layer=2, emb_dim=32, gnn_type="gat"), packed)


def test_fused_gat_param_tree_matches(restore_fused):
    """Checkpoint compatibility: identical parameter trees and init
    values on both paths."""
    graphs, _ = molecule_dataset(16, num_tasks=1, seed=2, mean_atoms=16)
    blocks = block_layout(graphs, 16, block_nodes=64, block_edges=192)
    batch = next(iter(PackedLoader(graphs, 16, shuffle=False,
                                   blocks=blocks)))
    model = chem.GNN(num_layer=2, emb_dim=32, gnn_type="gat")
    pallas_gin.set_fused("off")
    v0 = model.init(jax.random.PRNGKey(3), batch, train=False)
    pallas_gin.set_fused("on")
    v1 = model.init(jax.random.PRNGKey(3), batch, train=False)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(v0),
        jax.tree_util.tree_leaves_with_path(v1),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(p),
        )
