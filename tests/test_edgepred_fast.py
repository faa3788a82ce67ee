"""Edgepred fast path (r5): C++ negative sampling (flat + block-aligned
layouts) and the Pallas edge_dot scoring head.

The r4 pipeline was doubly bound: the numpy rejection sampler cost
2.5 ms/batch on the host, and the scoring head's take/scatter backward
serialized on TPU (~1.4 ms/step) — together 4.7 M vs masking's 7.4 M
e2e. The C++ sampler (native/packer.cpp) + blocked_edge_dot raised it to
~5.9 M (82% of masking, docs/PERFORMANCE.md §2)."""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.objectives.edgepred import sample_negative_edges
from pretrain_gnns_tpu.ops import spmm
from pretrain_gnns_tpu.train import pretrain


def _check_negatives(batch, pairs, mask, blocked_layout=None):
    ng = np.asarray(batch.node_graph)
    nm = np.asarray(batch.node_mask)
    snd = np.asarray(batch.senders)
    rcv = np.asarray(batch.receivers)
    em = np.asarray(batch.edge_mask)
    edge_set = set(zip(snd[em].tolist(), rcv[em].tolist()))
    sel = pairs[mask]
    assert len(sel) > 0
    assert len(set(map(tuple, sel.tolist()))) == len(sel), "duplicates"
    assert all(a != b for a, b in sel), "self-loops"
    assert all((a, b) not in edge_set for a, b in sel), "existing edges"
    assert all(nm[a] and nm[b] and ng[a] == ng[b] for a, b in sel), \
        "cross-graph or padded endpoints"
    eper = collections.Counter(ng[snd[em]].tolist())
    per = collections.Counter(ng[sel[:, 0]].tolist())
    assert all(per[g] <= eper[g] // 2 for g in per), "quota exceeded"
    if blocked_layout is not None:
        bn, half = blocked_layout
        for s, (a, b) in zip(np.nonzero(mask)[0], sel):
            assert s // half == a // bn == b // bn, \
                "pair not in its block"
    return len(sel), sum(v // 2 for v in eper.values())


def test_blocked_native_negatives_and_edge_dot_parity():
    """Block-aligned C++ negatives obey every NegativeEdge constraint,
    and the edgepred objective's Pallas scoring head (interpret mode)
    matches the XLA fallback in loss and every gradient leaf."""
    graphs, _ = molecule_dataset(128, num_tasks=1, seed=0, mean_atoms=23)
    cfg = pretrain.PretrainConfig(
        objective="edgepred", num_layer=2, emb_dim=16, batch_size=64,
        seed=0, scan_steps=4, packing="blocked", device_dataset="on",
    )
    loader = pretrain.build_loader(cfg, graphs)
    desc = next(iter(loader))
    if "negative_edges_blocked" not in desc:
        pytest.skip("native sampler unavailable (no toolchain)")
    batch = loader.prepare(desc)
    neg = np.asarray(batch.extras["negative_edges_blocked"])
    m = np.asarray(batch.extras["negative_edges_blocked_mask"])
    got, quota = _check_negatives(
        batch, neg, m,
        blocked_layout=(loader.blocks[1], loader.blocks[2] // 2),
    )
    assert got >= 0.98 * quota  # 2x-oversampled C++ draw fills ~always

    model = pretrain.build_objective(cfg)
    var = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    prev = spmm.get_backend()
    try:
        def loss(v, backend):
            spmm.set_backend(backend)
            return model.apply(v, batch, train=False)[0]

        l1 = loss(var, "pallas")
        g1 = jax.grad(lambda v: loss(v, "pallas"))(var)
        l0 = loss(var, "xla")
        g0 = jax.grad(lambda v: loss(v, "xla"))(var)
    finally:
        spmm.set_backend(prev)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g0),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(p),
        )


def test_flat_native_negatives():
    """Compacted-layout C++ sampler (standard packing) obeys the same
    constraints."""
    from pretrain_gnns_tpu.data.device_pack import DeviceBatchLoader
    from pretrain_gnns_tpu.data.flat import FlatGraphs

    graphs, _ = molecule_dataset(64, num_tasks=1, seed=1, mean_atoms=20)
    flat = FlatGraphs.from_graphs(graphs)
    dl = DeviceBatchLoader(flat, 64, 2048, 4096, seed=0,
                           neg_spec=dict(budget=2048))
    desc = next(iter(dl))
    batch = dl.prepare(desc)
    _check_negatives(
        batch, np.asarray(batch.extras["negative_edges"]),
        np.asarray(batch.extras["negative_edges_mask"]),
    )


def test_device_sampler_semantics():
    """On-device sample_negative_edges (jitted keyed-sort variant, used
    by transform_device='device') obeys the same constraints."""
    from pretrain_gnns_tpu.data.packing import PackedLoader

    graphs, _ = molecule_dataset(64, num_tasks=1, seed=0, mean_atoms=20)
    batch = next(iter(PackedLoader(graphs, 64, shuffle=False)))
    pairs, mask = jax.jit(
        lambda k, g: sample_negative_edges(k, g,
                                           g.senders.shape[0] // 2)
    )(jax.random.PRNGKey(0), batch)
    got, quota = _check_negatives(batch, np.asarray(pairs),
                                  np.asarray(mask))
    assert got >= 0.95 * quota
