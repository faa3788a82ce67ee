"""Block-diagonal packing + Pallas one-hot-matmul SpMM kernel (interpret
mode on CPU): forward/backward must match the XLA reference path, and the
full model must produce identical outputs on blocked vs standard packing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pretrain_gnns_tpu.core import graphs as G
from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.ops import pallas_spmm, spmm
from pretrain_gnns_tpu.ops import segment as seg


def _blocked_batch(rng, n_graphs=10, block_nodes=32, block_edges=96,
                   n_blocks=4):
    graphs, _ = molecule_dataset(n_graphs, seed=int(rng.integers(1e6)),
                                 mean_atoms=10)
    return G.pack_graphs_blocked(
        graphs, n_blocks, block_nodes, block_edges, max_graphs=n_graphs,
        np_out=True,
    )


def test_blocked_pack_invariants(rng):
    rng = np.random.default_rng(11)
    graphs, _ = molecule_dataset(10, seed=int(rng.integers(1e6)),
                                 mean_atoms=10)
    p = G.pack_graphs_blocked(graphs, 4, 32, 96, max_graphs=10,
                              np_out=True)
    W, EPB = p.block_nodes, p.block_edges
    assert p.node_feat.shape[0] == 4 * W
    assert p.senders.shape[0] == 4 * EPB
    for b in range(4):
        sl = slice(b * EPB, (b + 1) * EPB)
        m = p.edge_mask[sl]
        for arr in (p.senders[sl][m], p.receivers[sl][m]):
            assert arr.size == 0 or (
                arr.min() >= b * W and arr.max() < (b + 1) * W
            )
    # same valid nodes/edges/labels as the plain (contiguous) packer
    plain = G.pack_graphs(graphs, 4 * 32, 4 * 96, 10, np_out=True)
    assert int(p.node_mask.sum()) == int(plain.node_mask.sum())
    assert int(p.edge_mask.sum()) == int(plain.edge_mask.sum())
    assert int(p.graph_mask.sum()) == int(plain.graph_mask.sum())
    np.testing.assert_array_equal(p.y, plain.y)
    # every graph's node rows hold the same features in both layouts
    for i in range(10):
        rows_b = p.node_feat[(p.node_graph == i) & p.node_mask]
        rows_p = plain.node_feat[
            (plain.node_graph == i) & plain.node_mask
        ]
        np.testing.assert_array_equal(rows_b, rows_p)


def test_kernel_matches_xla_forward(rng):
    p = _blocked_batch(rng)
    N, F = p.node_feat.shape[0], 20
    E = p.senders.shape[0]
    x = rng.normal(size=(N, F)).astype(np.float32)
    ee = rng.normal(size=(E, F)).astype(np.float32)
    w = (rng.random(E) * 2 - 0.5).astype(np.float32) * p.edge_mask

    out_k = pallas_spmm.blocked_spmm(
        jnp.array(x), jnp.array(ee), jnp.array(p.senders),
        jnp.array(p.receivers), jnp.array(w),
        p.block_nodes, p.block_edges, jnp.float32, True,
    )
    ref = seg.segment_sum(
        (x[p.senders] + ee) * w[:, None], jnp.array(p.receivers), N,
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_kernel_matches_xla_no_ee(rng):
    p = _blocked_batch(rng)
    N, F = p.node_feat.shape[0], 16
    x = rng.normal(size=(N, F)).astype(np.float32)
    w = p.edge_mask.astype(np.float32)
    out_k = pallas_spmm.blocked_spmm(
        jnp.array(x), None, jnp.array(p.senders), jnp.array(p.receivers),
        jnp.array(w), p.block_nodes, p.block_edges, jnp.float32, True,
    )
    ref = seg.segment_sum(
        x[p.senders] * w[:, None], jnp.array(p.receivers), N
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_kernel_gradients_match_xla(rng):
    p = _blocked_batch(rng)
    N, F = p.node_feat.shape[0], 12
    E = p.senders.shape[0]
    x = jnp.array(rng.normal(size=(N, F)).astype(np.float32))
    ee = jnp.array(rng.normal(size=(E, F)).astype(np.float32))
    w = jnp.array((rng.random(E).astype(np.float32)) * p.edge_mask)
    snd, rcv = jnp.array(p.senders), jnp.array(p.receivers)
    tangent = jnp.array(rng.normal(size=(N, F)).astype(np.float32))

    def f_k(x, ee):
        out = pallas_spmm.blocked_spmm(
            x, ee, snd, rcv, w, p.block_nodes, p.block_edges,
            jnp.float32, True,
        )
        return jnp.sum(out * tangent)

    def f_ref(x, ee):
        out = seg.segment_sum(
            (jnp.take(x, snd, axis=0) + ee) * w[:, None], rcv, N
        )
        return jnp.sum(out * tangent)

    gx_k, gee_k = jax.grad(f_k, argnums=(0, 1))(x, ee)
    gx_r, gee_r = jax.grad(f_ref, argnums=(0, 1))(x, ee)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gee_k), np.asarray(gee_r),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("has_x", [True, False])
def test_fused_kernel_matches_xla(rng, has_x):
    """Fused edge-transform SpMM: out, dx and dW vs the XLA reference."""
    p = _blocked_batch(rng)
    N, F, K = p.node_feat.shape[0], 20, 9
    E = p.senders.shape[0]
    x = jnp.array(rng.normal(size=(N, F)).astype(np.float32))
    ein = jnp.array(rng.normal(size=(E, K)).astype(np.float32))
    W = jnp.array(rng.normal(size=(K, F)).astype(np.float32))
    w = jnp.array(
        ((rng.random(E) * 2 - 0.5) * p.edge_mask).astype(np.float32)
    )
    snd, rcv = jnp.array(p.senders), jnp.array(p.receivers)
    tangent = jnp.array(rng.normal(size=(N, F)).astype(np.float32))

    def f_k(x, W):
        out = pallas_spmm.blocked_spmm_fused(
            x, ein, W, snd, rcv, w, p.block_nodes, p.block_edges,
            jnp.float32, True, has_x,
        )
        return jnp.sum(out * tangent), out

    def f_ref(x, W):
        msg = ein @ W
        if has_x:
            msg = msg + jnp.take(x, snd, axis=0)
        out = seg.segment_sum(msg * w[:, None], rcv, N)
        return jnp.sum(out * tangent), out

    (_, out_k), (gx_k, gW_k) = jax.value_and_grad(
        f_k, argnums=(0, 1), has_aux=True
    )(x, W)
    (_, out_r), (gx_r, gW_r) = jax.value_and_grad(
        f_ref, argnums=(0, 1), has_aux=True
    )(x, W)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gW_k), np.asarray(gW_r),
                               atol=1e-4, rtol=1e-4)
    if has_x:
        np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                                   atol=1e-4, rtol=1e-4)
    else:
        assert not np.any(np.asarray(gx_k))


def test_fused_model_gradients_match_xla(rng):
    """End-to-end training gradients (incl. edge-embedding tables reached
    only through the fused kernel's accumulated dW) agree with XLA."""
    from pretrain_gnns_tpu.models.chem import GNN

    graphs, _ = molecule_dataset(6, seed=3, mean_atoms=10)
    blocked = G.pack_graphs_blocked(graphs, 4, 32, 96, 6, np_out=True)
    model = GNN(num_layer=2, emb_dim=16, gnn_type="gin")
    variables = model.init(jax.random.PRNGKey(0), blocked, train=False)

    def loss(params):
        out = model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}},
            blocked, train=False,
        )
        return jnp.sum(out ** 2)

    g_x = jax.grad(loss)(variables["params"])
    spmm.set_backend("pallas")
    try:
        g_k = jax.grad(loss)(variables["params"])
    finally:
        spmm.set_backend("xla")
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_k = dict(
        (jax.tree_util.keystr(kp), v)
        for kp, v in jax.tree_util.tree_leaves_with_path(g_k)
    )
    for kp, vx in flat_x:
        vk = flat_k[jax.tree_util.keystr(kp)]
        np.testing.assert_allclose(
            np.asarray(vk), np.asarray(vx), atol=2e-3, rtol=2e-3,
            err_msg=jax.tree_util.keystr(kp),
        )


@pytest.mark.parametrize("gnn_type", ["gin", "gcn", "graphsage"])
def test_model_blocked_vs_standard_packing(gnn_type, rng):
    """Same graphs, two packings, pallas vs xla: node representations of
    valid rows must agree."""
    from pretrain_gnns_tpu.models.chem import GNN

    graphs, _ = molecule_dataset(6, seed=11, mean_atoms=10)
    plain = G.pack_graphs([g for g in graphs], 128, 320, 6, np_out=True)
    blocked = G.pack_graphs_blocked(graphs, 4, 32, 96, 6, np_out=True)

    model = GNN(num_layer=2, emb_dim=16, gnn_type=gnn_type)
    variables = model.init(jax.random.PRNGKey(0), plain, train=False)

    out_plain = np.asarray(model.apply(variables, plain, train=False))
    spmm.set_backend("pallas")
    try:
        out_blocked = np.asarray(model.apply(variables, blocked,
                                             train=False))
    finally:
        spmm.set_backend("xla")

    # map rows: both packings order graphs identically (first-fit keeps
    # insertion order here since all fit block 0..3 sequentially)
    pg = np.asarray(plain.node_graph)[np.asarray(plain.node_mask)]
    bg = np.asarray(blocked.node_graph)[np.asarray(blocked.node_mask)]
    vp = out_plain[np.asarray(plain.node_mask)]
    vb = out_blocked[np.asarray(blocked.node_mask)]
    for gid in range(6):
        np.testing.assert_allclose(
            vp[pg == gid], vb[bg == gid], atol=5e-4, rtol=1e-3,
        )


def test_bio_gin_concat_blocked(rng):
    from pretrain_gnns_tpu.data.synthetic import bio_dataset
    from pretrain_gnns_tpu.models.bio import GNN as BioGNN

    graphs = bio_dataset(4, seed=5, mean_nodes=15)
    for g in graphs:
        g.extras.clear()
    plain = G.pack_graphs(graphs, 128, 512, 4, np_out=True)
    blocked = G.pack_graphs_blocked(graphs, 4, 32, 128, 4, np_out=True)
    model = BioGNN(num_layer=2, emb_dim=16, gnn_type="gin")
    variables = model.init(jax.random.PRNGKey(0), plain, train=False)
    out_plain = np.asarray(model.apply(variables, plain, train=False))
    spmm.set_backend("pallas")
    try:
        out_blocked = np.asarray(model.apply(variables, blocked,
                                             train=False))
    finally:
        spmm.set_backend("xla")
    pg = np.asarray(plain.node_graph)[np.asarray(plain.node_mask)]
    bg = np.asarray(blocked.node_graph)[np.asarray(blocked.node_mask)]
    vp = out_plain[np.asarray(plain.node_mask)]
    vb = out_blocked[np.asarray(blocked.node_mask)]
    for gid in range(4):
        np.testing.assert_allclose(
            vp[pg == gid], vb[bg == gid], atol=5e-4, rtol=1e-3,
        )


def test_sorted_segsum_scatter_matches_onehot(rng):
    """The receiver-sorted segment-sum experiment kernel
    (ops/pallas_spmm_sorted.py, VERDICT r3 item 6) must agree with the
    production one-hot kernel; docs/PERFORMANCE.md records why the
    one-hot variant remains the default."""
    import jax.numpy as jnp

    from pretrain_gnns_tpu.ops import pallas_spmm
    from pretrain_gnns_tpu.ops.pallas_spmm_sorted import (
        sort_block_edges, sorted_blocked_spmm,
    )

    BN, BE, NB, F = 32, 96, 4, 48
    N, E = NB * BN, NB * BE
    x = rng.normal(size=(N, F)).astype(np.float32)
    ee = rng.normal(size=(E, F)).astype(np.float32)
    snd = np.zeros(E, np.int32)
    rcv = np.zeros(E, np.int32)
    w = np.zeros(E, np.float32)
    for b in range(NB):
        ne = int(rng.integers(40, BE))
        snd[b * BE:b * BE + ne] = rng.integers(b * BN, (b + 1) * BN, ne)
        rcv[b * BE:b * BE + ne] = rng.integers(b * BN, (b + 1) * BN, ne)
        w[b * BE:b * BE + ne] = 1.0
    ref = pallas_spmm.blocked_spmm(
        jnp.asarray(x), jnp.asarray(ee), jnp.asarray(snd),
        jnp.asarray(rcv), jnp.asarray(w), BN, BE, jnp.float32, True,
    )
    s2, r2, w2, ee2 = sort_block_edges(
        jnp.asarray(snd), jnp.asarray(rcv), jnp.asarray(w),
        jnp.asarray(ee), NB, BE,
    )
    out = sorted_blocked_spmm(jnp.asarray(x), ee2, s2, r2, w2, BN, BE,
                              jnp.float32, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)
