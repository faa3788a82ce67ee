"""Data-parallel training on the 8-device virtual CPU mesh: gradient psum
correctness (DP step == single-device step on the concatenated batch) and
multi-device execution."""

import numpy as np
import jax
import jax.numpy as jnp

from pretrain_gnns_tpu.data.packing import PackedLoader
from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.models.chem import GNNGraphPred
from pretrain_gnns_tpu.parallel import dp, mesh as meshlib
import optax

from pretrain_gnns_tpu.train import finetune, optim
from pretrain_gnns_tpu.train.state import TrainState


def _make(n_graphs, batch, num_tasks=2, seed=0):
    graphs, _ = molecule_dataset(n_graphs, num_tasks=num_tasks, seed=seed)
    loader = PackedLoader(graphs, batch, shuffle=False, drop_last=True,
                          max_nodes=512, max_edges=1280)
    return list(loader)


def test_dp_matches_single_device():
    assert len(jax.devices()) >= 4
    m = meshlib.make_mesh(4)
    batches = _make(64, 8)[:4]

    model = GNNGraphPred(num_layer=2, emb_dim=16, num_tasks=2,
                         gnn_type="gin", drop_ratio=0.0)
    tx = optax.sgd(0.1)  # linear in grads: Adam would amplify reduction-order noise
    variables = model.init(jax.random.PRNGKey(0), batches[0], train=False)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))

    # DP step over 4 devices
    gb = dp.stack_local_batches(batches)
    gb = dp.shard_global_batch(gb, m)
    step = dp.make_dp_train_step(model, tx, m)
    new_state, loss = step(state, gb)

    # single-device: average of the 4 per-batch grads == grad of mean loss;
    # emulate by accumulating grads over the same 4 batches
    def loss_fn(params, batch):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(9)},
        )
        from pretrain_gnns_tpu.objectives import losses

        return losses.masked_task_bce(out, batch.y, batch.graph_mask)

    grads = [
        jax.grad(loss_fn)(state.params, b) for b in batches
    ]
    mean_grads = jax.tree_util.tree_map(
        lambda *g: sum(g) / len(g), *grads
    )
    updates, _ = tx.update(mean_grads, state.opt_state, state.params)
    ref_params = optax.apply_updates(state.params, updates)

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(new_state.params),
        jax.tree_util.tree_leaves_with_path(ref_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=str(pa)
        )
    assert np.isfinite(float(loss))


def test_dp_eval_step_shapes():
    m = meshlib.make_mesh(8)
    batches = _make(128, 8, seed=4)[:8]
    model = GNNGraphPred(num_layer=2, emb_dim=16, num_tasks=2,
                         gnn_type="gcn")
    variables = model.init(jax.random.PRNGKey(0), batches[0], train=False)
    state = TrainState.create(variables, optim.adam(), jax.random.PRNGKey(1))
    gb = dp.shard_global_batch(dp.stack_local_batches(batches), m)
    ev = dp.make_dp_eval_step(model, m)
    out = np.asarray(ev(state, gb))
    assert out.shape == (8, 8, 2) and np.isfinite(out).all()


def test_dp_pretrain_masking_runs_and_matches_shapes():
    """run_pretrain with dp_devices=2 on the CPU mesh: loss finite,
    params replicated, metrics aggregated."""
    import jax
    from pretrain_gnns_tpu.data.synthetic import molecule_dataset
    from pretrain_gnns_tpu.train import pretrain

    graphs, _ = molecule_dataset(96, seed=3, mean_atoms=12)
    cfg = pretrain.PretrainConfig(
        objective="masking", num_layer=2, emb_dim=16, batch_size=16,
        epochs=1, dp_devices=2, packing="standard",
    )
    res = pretrain.run_pretrain(cfg, graphs, log=None)
    assert np.isfinite(res["history"][0]["loss"])
    # replicated across the mesh: one logical value
    p0 = jax.tree_util.tree_leaves(res["state"].params)[0]
    assert np.asarray(p0).ndim >= 1


def test_dp_pretrain_matches_single_device_first_step():
    """One DP step (2 devices x batch B) must equal one single-device step
    over the concatenated 2B batch up to BN-stat semantics: with identical
    params/batches, psum-averaged grads == full-batch grads when the two
    local batches are identical."""
    import jax
    import jax.numpy as jnp
    from pretrain_gnns_tpu.data.packing import PackedLoader
    from pretrain_gnns_tpu.data.synthetic import molecule_dataset
    from pretrain_gnns_tpu.parallel import dp
    from pretrain_gnns_tpu.parallel.mesh import make_mesh
    from pretrain_gnns_tpu.train import optim, pretrain
    from pretrain_gnns_tpu.train.state import TrainState

    graphs, _ = molecule_dataset(32, seed=9, mean_atoms=10)
    cfg = pretrain.PretrainConfig(
        objective="edgepred", num_layer=2, emb_dim=16, batch_size=16,
        epochs=1, packing="standard",
    )
    model = pretrain.build_objective(cfg)
    loader = pretrain.build_loader(cfg, graphs)
    b = next(iter(loader))

    variables = model.init(jax.random.PRNGKey(0), b, train=False)
    if "batch_stats" not in variables:
        variables = dict(variables, batch_stats={})
    tx = optim.adam(1e-3)

    # single device step on batch b
    s1 = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    step1 = pretrain.make_pretrain_step(model, tx)
    s1b, loss1, _ = step1(s1, b)

    # dp over two IDENTICAL local batches -> same mean grads -> same update
    mesh = make_mesh(2)
    s2 = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    s2 = jax.device_put(
        s2, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    step2 = dp.make_dp_pretrain_step(model, tx, mesh)
    gb = dp.shard_global_batch(dp.stack_local_batches([b, b]), mesh)
    s2b, loss2, _ = step2(s2, gb)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(s1b.params),
                    jax.tree_util.tree_leaves(s2b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-5, atol=2e-6)
