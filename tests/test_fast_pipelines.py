"""Vectorized input pipelines for edgepred / bio masking / contextpred
(VERDICT r3 item 3): the batch-level transforms must reproduce the
per-graph reference semantics, and the presampled context loader must
produce the same pair structure as the per-epoch-BFS loader."""

import numpy as np

from pretrain_gnns_tpu.core import graphs as G
from pretrain_gnns_tpu.data import transforms
from pretrain_gnns_tpu.data.batch_transforms import (
    BatchMaskEdge, BatchNegativeEdge,
)
from pretrain_gnns_tpu.data.context_loader import (
    ContextPairLoader, PresampledContextLoader,
)
from pretrain_gnns_tpu.data.synthetic import bio_dataset, molecule_dataset


def _packed(n=24, mean_atoms=14, seed=0, bs=24, mn=512, me=1536):
    graphs, _ = molecule_dataset(n, num_tasks=1, seed=seed,
                                 mean_atoms=mean_atoms)
    return graphs, G.pack_graphs(graphs, mn, me, bs, np_out=True)


def test_batch_negative_edge_semantics():
    graphs, p = _packed()
    rng = np.random.default_rng(0)
    out = BatchNegativeEdge(edge_budget=768)(p, rng)
    neg = out.extras["negative_edges"]
    m = out.extras["negative_edges_mask"]
    a, b = neg[m, 0], neg[m, 1]
    node_graph = np.asarray(p.node_graph)
    node_mask = np.asarray(p.node_mask)
    # in-range valid slots of the SAME graph
    assert node_mask[a].all() and node_mask[b].all()
    np.testing.assert_array_equal(node_graph[a], node_graph[b])
    # no self-loops
    assert (a != b).all()
    # not existing directed (receiver, sender) edges
    emask = np.asarray(p.edge_mask)
    existing = set(zip(np.asarray(p.receivers)[emask].tolist(),
                       np.asarray(p.senders)[emask].tolist()))
    pairs = list(zip(a.tolist(), b.tolist()))
    assert not (set(pairs) & existing)
    # no duplicates
    assert len(set(pairs)) == len(pairs)
    # per-graph counts: exactly E_g // 2 when 5E candidates suffice
    # (guaranteed-ish at this density; assert <= always, == on average)
    eg = np.bincount(node_graph[np.asarray(p.receivers)[emask]],
                     minlength=p.max_graphs)
    got = np.bincount(node_graph[a], minlength=p.max_graphs)
    assert (got <= eg // 2).all()
    assert got.sum() >= 0.9 * (eg // 2).sum()


def test_batch_negative_edge_matches_per_graph_counts():
    """Single-graph batch: the vectorized pass and the per-graph reference
    transform draw from the same distribution — equal pick counts under
    the same candidate budget."""
    graphs, _ = molecule_dataset(1, num_tasks=1, seed=3, mean_atoms=20)
    g = graphs[0]
    ref = transforms.NegativeEdge()(g, np.random.default_rng(0))
    p = G.pack_graphs([g], 128, 384, 1, np_out=True)
    out = BatchNegativeEdge(edge_budget=192)(p, np.random.default_rng(0))
    n_ref = len(ref.extras["negative_edges"][0])
    n_new = int(out.extras["negative_edges_mask"].sum())
    assert n_ref == g.num_edges // 2
    assert n_new == g.num_edges // 2


def test_batch_mask_edge_matches_reference_semantics():
    graphs = bio_dataset(12, num_downstream=2, seed=1, mean_nodes=18)
    for g in graphs:
        g.extras = {}
    p = G.pack_graphs(graphs, 512, 4096, 12, np_out=True)
    rng = np.random.default_rng(0)
    out = BatchMaskEdge(mask_rate=0.15, budget=512)(p, rng)
    eidx = out.extras["masked_edge_idx"]
    m = out.extras["masked_edge_idx_mask"]
    labels = out.extras["mask_edge_label"]
    sel = eidx[m]
    # selected slots are even (per-bond representatives) and valid
    assert (sel % 2 == 0).all()
    assert np.asarray(p.edge_mask)[sel].all()
    # per-graph counts == int(E_undirected * rate) + 1
    node_graph = np.asarray(p.node_graph)
    rcv = np.asarray(p.receivers)
    emask = np.asarray(p.edge_mask)
    eg = np.bincount(node_graph[rcv[emask]], minlength=12)
    expect = (eg // 2 * 0.15).astype(int) + 1
    got = np.bincount(node_graph[rcv[sel]], minlength=12)
    np.testing.assert_array_equal(got[: len(graphs)],
                                  expect[: len(graphs)])
    # labels preserve the ORIGINAL features; both directions masked
    orig = np.asarray(p.edge_feat)
    np.testing.assert_array_equal(labels[m], orig[sel])
    mask_feat = np.zeros(orig.shape[1], orig.dtype)
    mask_feat[-1] = 1
    np.testing.assert_array_equal(out.edge_feat[sel],
                                  np.broadcast_to(mask_feat,
                                                  (len(sel),
                                                   orig.shape[1])))
    np.testing.assert_array_equal(out.edge_feat[sel + 1],
                                  np.broadcast_to(mask_feat,
                                                  (len(sel),
                                                   orig.shape[1])))
    # unmasked edges untouched
    untouched = emask.copy()
    untouched[sel] = False
    untouched[sel + 1] = False
    np.testing.assert_array_equal(out.edge_feat[untouched],
                                  orig[untouched])


def test_presampled_context_matches_direct_transform():
    """Variant 0 of the presampled loader holds exactly the pairs the
    transform emits under the loader's presample rng stream."""
    graphs, _ = molecule_dataset(20, num_tasks=1, seed=2, mean_atoms=14)
    t = transforms.ExtractSubstructureContextPair(3, 2, 4)
    ldr = PresampledContextLoader(graphs, 4, t, 256, 768, seed=7,
                                  variants=2, shuffle=False)
    rng = np.random.default_rng((7, 727272))
    subs, ovs = [], []
    for g in graphs:
        pair = t(g, rng)
        if pair is not None:
            subs.append(pair.substruct)
            ovs.append(np.asarray(
                pair.context.extras["overlap_context_substruct_idx"][0]
            ))
    assert len(ldr._sub[0]) == len(subs)
    np.testing.assert_array_equal(
        ldr._sub[0].node_feat,
        np.concatenate([s.node_feat for s in subs]),
    )
    np.testing.assert_array_equal(ldr._ov_flat[0], np.concatenate(ovs))


def test_presampled_context_batches_align_and_train():
    """Batches carry aligned (substruct, context) slots, in-range overlap
    and center indices, and feed ContextPredObjective end-to-end."""
    import jax

    from pretrain_gnns_tpu.objectives.contextpred import (
        ContextPredObjective,
    )

    graphs, _ = molecule_dataset(40, num_tasks=1, seed=4, mean_atoms=14)
    t = transforms.ExtractSubstructureContextPair(3, 2, 4)
    ldr = PresampledContextLoader(graphs, 8, t, 256, 768, seed=0,
                                  variants=3)
    batches = list(ldr)
    assert batches and ldr.last_epoch_stats["edges"] > 0
    model = ContextPredObjective(num_layer=3, emb_dim=16, csize=2)
    sub, ctx = batches[0]
    np.testing.assert_array_equal(np.asarray(sub.graph_mask),
                                  np.asarray(ctx.graph_mask))
    ov = ctx.extras["overlap_context_substruct_idx"]
    ovm = ctx.extras["overlap_context_substruct_idx_mask"]
    assert np.asarray(ctx.node_mask)[ov[ovm]].all()
    center = np.asarray(sub.extras["center_substruct_idx"])
    gm = np.asarray(sub.graph_mask)
    assert np.asarray(sub.node_mask)[center[gm]].all()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        sub, ctx, train=False,
    )
    (loss, metrics) = model.apply(variables, sub, ctx, train=False)
    assert np.isfinite(float(loss))
    # epochs cycle variants: epoch 1 uses variant 1's pair set
    b2 = list(ldr)
    assert len(b2) >= 1


def test_device_loader_negative_edges():
    """DeviceBatchLoader with neg_spec: descriptor-borne negatives obey
    the reference constraints (in-graph, no self-loops, not existing,
    no dups, E//2 per graph) and run_pretrain trains edgepred through the
    epoch-resident path."""
    from pretrain_gnns_tpu.data.device_pack import DeviceBatchLoader
    from pretrain_gnns_tpu.data.flat import FlatGraphs

    graphs, _ = molecule_dataset(32, num_tasks=1, seed=0, mean_atoms=14)
    flat = FlatGraphs.from_graphs(graphs)
    dl = DeviceBatchLoader(flat, 8, 256, 768, seed=0,
                           neg_spec=dict(budget=384))
    desc = next(iter(dl))
    p = dl.prepare(desc)
    neg = np.asarray(p.extras["negative_edges"])
    m = np.asarray(p.extras["negative_edges_mask"])
    a, b = neg[m, 0], neg[m, 1]
    node_graph = np.asarray(p.node_graph)
    assert np.asarray(p.node_mask)[a].all()
    np.testing.assert_array_equal(node_graph[a], node_graph[b])
    assert (a != b).all()
    emask = np.asarray(p.edge_mask)
    existing = set(zip(np.asarray(p.receivers)[emask].tolist(),
                       np.asarray(p.senders)[emask].tolist()))
    pairs = list(zip(a.tolist(), b.tolist()))
    assert not (set(pairs) & existing)
    assert len(set(pairs)) == len(pairs)
    eg = np.bincount(node_graph[np.asarray(p.receivers)[emask]],
                     minlength=8)
    got = np.bincount(node_graph[a], minlength=8)
    assert (got <= eg // 2).all() and got.sum() >= 0.9 * (eg // 2).sum()

    from pretrain_gnns_tpu.train import pretrain

    cfg = pretrain.PretrainConfig(
        objective="edgepred", num_layer=2, emb_dim=16, batch_size=8,
        seed=0, device_dataset="on", scan_steps=2, packing="standard",
    )
    res = pretrain.run_pretrain(cfg, graphs, log=None, epochs=2)
    assert type(res["loader"]).__name__ == "DeviceBatchLoader"
    assert all(np.isfinite(h["loss"]) for h in res["history"])


def test_device_context_loader_parity():
    """Device-materialized (sub, ctx) pair batches produce bit-identical
    objective losses to host-packed batches of the same ids — standard
    AND blocked layouts."""
    import jax

    from pretrain_gnns_tpu.data.context_loader import DeviceContextLoader
    from pretrain_gnns_tpu.objectives.contextpred import (
        ContextPredObjective,
    )

    graphs, _ = molecule_dataset(24, num_tasks=1, seed=4, mean_atoms=14)
    t = transforms.ExtractSubstructureContextPair(3, 2, 4)
    pl = PresampledContextLoader(graphs, 8, t, 256, 768, seed=0,
                                 variants=2)
    ids = np.arange(8)
    sub_h, ctx_h = pl._batch(0, ids)
    model = ContextPredObjective(num_layer=3, emb_dim=16, csize=2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        sub_h, ctx_h, train=False,
    )
    l_h, _ = model.apply(variables, sub_h, ctx_h, train=False)
    for blocked in (False, True):
        dl = DeviceContextLoader(graphs, 8, t, 256, 768, seed=0,
                                 variants=2, blocked=blocked)
        sub_d, ctx_d = dl.prepare(dl._descriptor(0, ids))
        l_d, _ = model.apply(variables, sub_d, ctx_d, train=False)
        np.testing.assert_allclose(float(l_h), float(l_d), rtol=2e-5)
        # full epoch-resident pipeline over every variant
        descs = list(dl)
        assert descs and dl.last_epoch_stats["edges"] > 0


def test_device_context_epoch_training():
    from pretrain_gnns_tpu.train import pretrain

    graphs, _ = molecule_dataset(40, num_tasks=1, seed=4, mean_atoms=14)
    cfg = pretrain.PretrainConfig(
        objective="contextpred", num_layer=3, emb_dim=16, csize=2,
        batch_size=8, seed=0, device_dataset="on", scan_steps=2,
        packing="standard", context_variants=2,
    )
    res = pretrain.run_pretrain(cfg, graphs, log=None, epochs=3)
    assert type(res["loader"]).__name__ == "DeviceContextLoader"
    assert all(np.isfinite(h["loss"]) for h in res["history"])
    assert res["history"][-1]["loss"] < res["history"][0]["loss"]


def test_device_loader_bio_masking():
    """Bio device residency: 0/1 float features survive the int32 chunk
    round-trip, masked bonds obey MaskEdge semantics (even-slot
    representatives, clean labels, both directions overwritten), and
    run_pretrain trains through the epoch-resident path."""
    from pretrain_gnns_tpu.data.device_pack import DeviceBatchLoader
    from pretrain_gnns_tpu.data.flat import FlatGraphs
    from pretrain_gnns_tpu.train import pretrain

    graphs = bio_dataset(32, num_downstream=2, seed=0, mean_nodes=20)
    for g in graphs:
        g.extras = {"center_node_idx": g.extras["center_node_idx"]}
    flat = FlatGraphs.from_graphs(graphs)
    dl = DeviceBatchLoader(flat, 8, 512, 4096, seed=0,
                           bio_mask_spec=dict(rate=0.15, budget=512))
    desc = next(iter(dl))
    p = dl.prepare(desc)
    assert p.edge_feat.dtype == np.float32
    assert p.node_feat.dtype == np.float32
    eidx = np.asarray(p.extras["masked_edge_idx"])
    m = np.asarray(p.extras["masked_edge_idx_mask"])
    sel = eidx[m]
    assert (sel % 2 == 0).all()
    ef = np.asarray(p.edge_feat)
    mask_feat = np.zeros(ef.shape[1], ef.dtype)
    mask_feat[-1] = 1
    assert (ef[sel] == mask_feat).all() and (ef[sel + 1] == mask_feat).all()
    labels = np.asarray(p.extras["mask_edge_label"])[m]
    assert not (labels == mask_feat).all(axis=1).any()
    # per-graph counts == int(E_undirected * rate) + 1
    node_graph = np.asarray(p.node_graph)
    rcv = np.asarray(p.receivers)
    em = np.asarray(p.edge_mask)
    eg = np.bincount(node_graph[rcv[em]], minlength=8)
    expect = (eg // 2 * 0.15).astype(int) + 1
    got = np.bincount(node_graph[rcv[sel]], minlength=8)
    np.testing.assert_array_equal(got[eg > 0], expect[eg > 0])
    # unmasked edges keep valid 0/1 indicator rows (dtype round-trip)
    untouched = em.copy()
    untouched[sel] = False
    untouched[sel + 1] = False
    assert np.isin(ef[untouched], (0.0, 1.0)).all()
    assert (ef[untouched][:, -1] == 0).all()  # mask flag only on masked

    cfg = pretrain.PretrainConfig(
        objective="masking", domain="bio", num_layer=2, emb_dim=16,
        batch_size=8, seed=0, device_dataset="on", scan_steps=2,
        packing="standard",
    )
    res = pretrain.run_pretrain(cfg, graphs, log=None, epochs=2)
    assert type(res["loader"]).__name__ == "DeviceBatchLoader"
    assert all(np.isfinite(h["loss"]) for h in res["history"])


def test_bio_context_device_parity():
    """Bio context pairs (whole-ego-graph substructs, center root) through
    the device context loader: bit-identical objective loss vs the
    host-packed pair batches, and e2e training on the epoch path."""
    import jax

    from pretrain_gnns_tpu.data.context_loader import DeviceContextLoader
    from pretrain_gnns_tpu.models import bio as bio_models
    from pretrain_gnns_tpu.objectives.contextpred import (
        ContextPredObjective,
    )
    from pretrain_gnns_tpu.train import pretrain

    graphs = bio_dataset(24, num_downstream=2, seed=0, mean_nodes=25)
    for g in graphs:
        g.extras = {"center_node_idx": g.extras["center_node_idx"]}
    t = transforms.BioExtractSubstructureContextPair(1, True)
    dl = DeviceContextLoader(graphs, 8, t, 512, 4096, seed=0, variants=2)
    pl = PresampledContextLoader(graphs, 8, t, 512, 4096, seed=0,
                                 variants=2)
    ids = np.arange(8)
    sub_d, ctx_d = dl.prepare(dl._descriptor(0, ids))
    sub_h, ctx_h = pl._batch(0, ids)
    model = ContextPredObjective(num_layer=2, emb_dim=16, csize=3,
                                 trunk=bio_models.GNN)
    import jax as _jax

    variables = model.init(
        {"params": _jax.random.PRNGKey(0),
         "mask": _jax.random.PRNGKey(1)},
        sub_h, ctx_h, train=False,
    )
    l_h, _ = model.apply(variables, sub_h, ctx_h, train=False)
    l_d, _ = model.apply(variables, sub_d, ctx_d, train=False)
    np.testing.assert_allclose(float(l_h), float(l_d), rtol=2e-5)

    cfg = pretrain.PretrainConfig(
        objective="contextpred", domain="bio", num_layer=2, emb_dim=16,
        batch_size=8, seed=0, device_dataset="on", scan_steps=2,
        packing="standard", context_variants=2,
    )
    res = pretrain.run_pretrain(cfg, graphs, log=None, epochs=2)
    assert type(res["loader"]).__name__ == "DeviceContextLoader"
    assert all(np.isfinite(h["loss"]) for h in res["history"])


def test_bio_supervised_center_device_parity():
    """Bio supervised on the device-resident path: the center-node slot
    shipped in the descriptor must index each graph's own center row and
    yield a GraphPred forward bit-identical to host packing."""
    import dataclasses as dc

    import jax

    from pretrain_gnns_tpu.data.device_pack import DeviceBatchLoader
    from pretrain_gnns_tpu.data.flat import FlatGraphs
    from pretrain_gnns_tpu.objectives import losses as L
    from pretrain_gnns_tpu.train import finetune as ft

    graphs = bio_dataset(24, num_downstream=3, seed=0, mean_nodes=20)
    graphs = [
        dc.replace(g, extras={
            "center_node_idx": g.extras["center_node_idx"],
        })
        for g in graphs
    ]
    flat = FlatGraphs.from_graphs(graphs)
    dl = DeviceBatchLoader(flat, 8, 512, 4096, seed=0, center_spec=True)
    desc = next(iter(dl))
    p = dl.prepare(desc)
    center = np.asarray(p.extras["center_node_idx"])
    gm = np.asarray(p.graph_mask)
    assert np.asarray(p.node_mask)[center[gm]].all()
    np.testing.assert_array_equal(
        np.asarray(p.node_graph)[center[gm]], np.arange(gm.sum())
    )
    cfg = ft.FinetuneConfig(domain="bio", num_tasks=3, num_layer=2,
                            emb_dim=16, dropout_ratio=0.0, batch_size=8,
                            packing="standard")
    model = ft.build_model(cfg)
    host = flat.pack(desc["gid"][gm], 512, 4096, 8,
                     extra_pad={"center_node_idx": 8})
    variables = model.init(jax.random.PRNGKey(0), host, train=False)
    lh = float(L.plain_bce(model.apply(variables, host, train=False),
                           host.y, host.graph_mask))
    ld = float(L.plain_bce(model.apply(variables, p, train=False),
                           p.y, p.graph_mask))
    np.testing.assert_allclose(lh, ld, rtol=2e-5)
