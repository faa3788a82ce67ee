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
