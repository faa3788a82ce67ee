"""Fused Pallas GAT attention kernel (SDDMM + segment softmax + weighted
aggregation, interpret mode on CPU): forward must match the XLA reference
path, gradients must match (backward recomputes through XLA), and the full
GAT model must agree across packings/backends."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pretrain_gnns_tpu.core import graphs as G
from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.ops import attention, pallas_attention, spmm


def _blocked_batch(seed=3, n_graphs=10, block_nodes=32, block_edges=96,
                   n_blocks=4):
    graphs, _ = molecule_dataset(n_graphs, seed=seed, mean_atoms=10)
    return G.pack_graphs_blocked(
        graphs, n_blocks, block_nodes, block_edges, max_graphs=n_graphs,
        np_out=True,
    )


def _inputs(rng, p, H=2, D=20):
    N, E = p.node_feat.shape[0], p.senders.shape[0]
    return (
        rng.normal(size=(N, H, D)).astype(np.float32),
        rng.normal(size=(E, H, D)).astype(np.float32) * 0.3,
        rng.normal(size=(H, D)).astype(np.float32) * 0.3,
        rng.normal(size=(1, H, D)).astype(np.float32) * 0.2,
        rng.normal(size=(1, H, D)).astype(np.float32) * 0.2,
    )


def test_fused_forward_matches_xla(rng):
    p = _blocked_batch()
    x, e, e_self, a_i, a_j = _inputs(rng, p)
    N = x.shape[0]

    out_k = pallas_attention.blocked_gat_forward(
        jnp.array(x), jnp.array(e), jnp.array(e_self), jnp.array(a_i),
        jnp.array(a_j), jnp.array(p.senders), jnp.array(p.receivers),
        jnp.array(p.edge_mask, jnp.float32), 0.2,
        p.block_nodes, p.block_edges, jnp.float32, True,
    )
    out_r = attention.gat_attention_xla(
        jnp.array(x), jnp.array(e), jnp.array(e_self), jnp.array(a_i),
        jnp.array(a_j), jnp.array(p.senders), jnp.array(p.receivers),
        jnp.array(p.edge_mask), N, 0.2,
    )
    mask = np.asarray(p.node_mask)
    np.testing.assert_allclose(
        np.asarray(out_k)[mask], np.asarray(out_r)[mask],
        atol=1e-5, rtol=1e-5,
    )


def test_fused_gradients_match_xla(rng):
    p = _blocked_batch(seed=7)
    x, e, e_self, a_i, a_j = _inputs(rng, p, D=12)
    N = x.shape[0]
    tangent = rng.normal(size=(N, 2, 12)).astype(np.float32)
    tangent = tangent * np.asarray(p.node_mask)[:, None, None]
    args = tuple(map(jnp.array, (x, e, e_self, a_i, a_j)))

    def f_k(*a):
        out = attention._gat_blocked(
            *a, jnp.array(p.senders), jnp.array(p.receivers),
            jnp.array(p.edge_mask), N, 0.2, p.block_nodes, p.block_edges,
            jnp.float32, True,
        )
        return jnp.sum(out * tangent)

    def f_r(*a):
        out = attention.gat_attention_xla(
            *a, jnp.array(p.senders), jnp.array(p.receivers),
            jnp.array(p.edge_mask), N, 0.2,
        )
        return jnp.sum(out * tangent)

    gk = jax.grad(f_k, argnums=(0, 1, 2, 3, 4))(*args)
    gr = jax.grad(f_r, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_gat_model_blocked_vs_standard_packing(rng):
    from pretrain_gnns_tpu.models.chem import GNN

    graphs, _ = molecule_dataset(6, seed=11, mean_atoms=10)
    plain = G.pack_graphs([g for g in graphs], 128, 320, 6, np_out=True)
    blocked = G.pack_graphs_blocked(graphs, 4, 32, 96, 6, np_out=True)

    model = GNN(num_layer=2, emb_dim=16, gnn_type="gat")
    variables = model.init(jax.random.PRNGKey(0), plain, train=False)
    out_plain = np.asarray(model.apply(variables, plain, train=False))
    spmm.set_backend("pallas")
    try:
        out_blocked = np.asarray(
            model.apply(variables, blocked, train=False)
        )
    finally:
        spmm.set_backend("xla")
    pg = np.asarray(plain.node_graph)[np.asarray(plain.node_mask)]
    bg = np.asarray(blocked.node_graph)[np.asarray(blocked.node_mask)]
    vp = out_plain[np.asarray(plain.node_mask)]
    vb = out_blocked[np.asarray(blocked.node_mask)]
    for gid in range(6):
        np.testing.assert_allclose(
            vp[pg == gid], vb[bg == gid], atol=5e-4, rtol=1e-3,
        )


def test_bio_gat_blocked_vs_standard(rng):
    from pretrain_gnns_tpu.data.synthetic import bio_dataset
    from pretrain_gnns_tpu.models.bio import GNN as BioGNN

    graphs = bio_dataset(4, seed=5, mean_nodes=15)
    for g in graphs:
        g.extras.clear()
    plain = G.pack_graphs(graphs, 128, 512, 4, np_out=True)
    blocked = G.pack_graphs_blocked(graphs, 4, 32, 128, 4, np_out=True)
    model = BioGNN(num_layer=2, emb_dim=16, gnn_type="gat")
    variables = model.init(jax.random.PRNGKey(0), plain, train=False)
    out_plain = np.asarray(model.apply(variables, plain, train=False))
    spmm.set_backend("pallas")
    try:
        out_blocked = np.asarray(
            model.apply(variables, blocked, train=False)
        )
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


def test_fused_backward_kernel_matches_xla_grads(rng):
    """blocked_gat_backward (the fused Pallas backward, interpret mode)
    must reproduce the XLA reference VJP for every differentiable input."""
    p = _blocked_batch()
    x, e, e_self, a_i, a_j = _inputs(rng, p)
    N = x.shape[0]
    g = rng.normal(size=x.shape).astype(np.float32)

    def ref(x, e, e_self, a_i, a_j):
        return attention.gat_attention_xla(
            x, e, e_self, a_i, a_j, p.senders, p.receivers, p.edge_mask,
            N, 0.2,
        )

    _, vjp = jax.vjp(ref, jnp.asarray(x), jnp.asarray(e),
                     jnp.asarray(e_self), jnp.asarray(a_i),
                     jnp.asarray(a_j))
    want = vjp(jnp.asarray(g))

    got = pallas_attention.blocked_gat_backward(
        jnp.asarray(x), jnp.asarray(e), jnp.asarray(e_self),
        jnp.asarray(a_i), jnp.asarray(a_j), jnp.asarray(p.senders),
        jnp.asarray(p.receivers),
        jnp.asarray(p.edge_mask).astype(jnp.float32), jnp.asarray(g),
        0.2, p.block_nodes, p.block_edges, interpret=True,
    )
    names = ("dx", "de", "de_self", "da_i", "da_j")
    for name, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4,
            err_msg=name,
        )


def test_custom_vjp_uses_fused_backward(rng, monkeypatch):
    """End-to-end grads through the dispatch path with the Pallas backward
    active must equal the XLA path's grads."""
    monkeypatch.setenv("PGT_GAT_BWD", "pallas")
    p = _blocked_batch()
    x, e, e_self, a_i, a_j = _inputs(rng, p)
    N = x.shape[0]

    def loss_pallas(x, e, e_self, a_i, a_j):
        out = attention._gat_blocked(
            jnp.asarray(x), jnp.asarray(e), jnp.asarray(e_self),
            jnp.asarray(a_i), jnp.asarray(a_j), jnp.asarray(p.senders),
            jnp.asarray(p.receivers), jnp.asarray(p.edge_mask), N, 0.2,
            p.block_nodes, p.block_edges, jnp.float32, True,
        )
        return jnp.sum(out ** 2)

    def loss_ref(x, e, e_self, a_i, a_j):
        out = attention.gat_attention_xla(
            x, e, e_self, a_i, a_j, p.senders, p.receivers, p.edge_mask,
            N, 0.2,
        )
        return jnp.sum(out ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(x), jnp.asarray(e), jnp.asarray(e_self),
        jnp.asarray(a_i), jnp.asarray(a_j),
    )
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(x), jnp.asarray(e), jnp.asarray(e_self),
        jnp.asarray(a_i), jnp.asarray(a_j),
    )
    for i, (a, b) in enumerate(zip(gp, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4, err_msg=str(i))
