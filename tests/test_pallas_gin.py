"""Whole-conv fused GIN kernel (ops/pallas_gin.py) — interpret-mode
parity vs the unfused composition (XLA gather/scatter + flax Dense MLP),
forward and every parameter/input gradient, plus checkpoint-layout and
gating invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pretrain_gnns_tpu.data.packing import PackedLoader, block_layout
from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.models import chem
from pretrain_gnns_tpu.ops import pallas_gin


@pytest.fixture
def blocked_batch():
    graphs, _ = molecule_dataset(32, num_tasks=1, seed=0, mean_atoms=20)
    blocks = block_layout(graphs, 32, block_nodes=64, block_edges=192)
    return next(iter(PackedLoader(graphs, 32, shuffle=False,
                                  blocks=blocks)))


@pytest.fixture
def restore_fused():
    prev = pallas_gin._FUSED_ENV
    yield
    pallas_gin.set_fused(prev)


def _loss(model, batch, fused):
    def f(v):
        pallas_gin.set_fused("on" if fused else "off")
        h = model.apply(v, batch, train=False)
        return jnp.sum(h * h)

    return f


def test_fused_gin_matches_unfused_fwd_and_grads(blocked_batch,
                                                 restore_fused):
    model = chem.GNN(num_layer=2, emb_dim=32)
    var = model.init(jax.random.PRNGKey(0), blocked_batch, train=False)

    l0 = _loss(model, blocked_batch, False)(var)
    g0 = jax.grad(_loss(model, blocked_batch, False))(var)
    l1 = _loss(model, blocked_batch, True)(var)
    g1 = jax.grad(_loss(model, blocked_batch, True))(var)

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(p),
        )


def test_fused_param_tree_matches_unfused(blocked_batch, restore_fused):
    """Checkpoint compatibility: both paths must declare the identical
    parameter tree (same names, shapes, and init values)."""
    model = chem.GNN(num_layer=2, emb_dim=32)
    pallas_gin.set_fused("off")
    v0 = model.init(jax.random.PRNGKey(3), blocked_batch, train=False)
    pallas_gin.set_fused("on")
    v1 = model.init(jax.random.PRNGKey(3), blocked_batch, train=False)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(v0),
        jax.tree_util.tree_leaves_with_path(v1),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(p),
        )


def test_fused_masked_padding_rows_ignored(blocked_batch, restore_fused):
    """Padded node rows may hold junk (bias terms) exactly like the
    unfused path: valid rows must agree regardless of what padded rows
    held on input."""
    model = chem.GNN(num_layer=2, emb_dim=16)
    var = model.init(jax.random.PRNGKey(1), blocked_batch, train=False)
    pallas_gin.set_fused("on")
    h1 = model.apply(var, blocked_batch, train=False)
    # poison padded node feature rows; valid outputs must not change
    nf = np.asarray(blocked_batch.node_feat).copy()
    nf[~np.asarray(blocked_batch.node_mask)] = 1
    poisoned = blocked_batch.replace(node_feat=jnp.asarray(nf))
    h2 = model.apply(var, poisoned, train=False)
    m = np.asarray(blocked_batch.node_mask)
    np.testing.assert_allclose(np.asarray(h1)[m], np.asarray(h2)[m],
                               rtol=1e-6)


def test_gating(restore_fused):
    pallas_gin.set_fused("off")
    assert not pallas_gin.use_fused_conv(True)
    pallas_gin.set_fused("on")
    assert pallas_gin.use_fused_conv(True)
    assert not pallas_gin.use_fused_conv(False)  # needs blocked layout
    pallas_gin.set_fused("auto")
    # conftest pins PGT_SPMM_BACKEND=xla and CPU: auto stays off
    assert not pallas_gin.use_fused_conv(True)
    with pytest.raises(ValueError):
        pallas_gin.set_fused("bogus")
