"""Mixed-precision mode (PGT_MODEL_DTYPE=bfloat16): activations flow in
bf16, parameters/BN statistics/losses stay f32. Checks dtype plumbing and
loose numerical agreement with the f32 path on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pretrain_gnns_tpu.core import graphs as G
from pretrain_gnns_tpu.data.synthetic import molecule_dataset, bio_dataset
from pretrain_gnns_tpu.models import inits
from pretrain_gnns_tpu.objectives import losses


@pytest.fixture
def bf16_mode():
    inits.set_compute_dtype("bfloat16_act")
    try:
        yield
    finally:
        inits.set_compute_dtype("float32")


@pytest.mark.parametrize("gnn_type", ["gin", "gcn", "graphsage", "gat"])
def test_chem_trunk_bf16_close_to_f32(gnn_type, bf16_mode):
    from pretrain_gnns_tpu.models.chem import GNN

    graphs, _ = molecule_dataset(6, seed=1, mean_atoms=12)
    p = G.pack_graphs(graphs, 128, 320, 6, np_out=True)
    model = GNN(num_layer=2, emb_dim=16, gnn_type=gnn_type)
    variables = model.init(jax.random.PRNGKey(0), p, train=False)
    # params created under the bf16 knob must still be f32
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    out_bf = model.apply(variables, p, train=False)

    inits.set_compute_dtype("float32")
    out_f32 = model.apply(variables, p, train=False)
    scale = np.maximum(np.abs(np.asarray(out_f32)), 1.0)
    err = np.abs(np.asarray(out_bf, np.float32) - np.asarray(out_f32)) / scale
    assert err.max() < 0.15, err.max()  # bf16 has ~3 decimal digits


def test_bio_trunk_bf16_runs(bf16_mode):
    from pretrain_gnns_tpu.models.bio import GNN as BioGNN

    graphs = bio_dataset(4, seed=2, mean_nodes=12)
    for g in graphs:
        g.extras.clear()
    p = G.pack_graphs(graphs, 128, 512, 4, np_out=True)
    model = BioGNN(num_layer=2, emb_dim=16, gnn_type="gin")
    variables = model.init(jax.random.PRNGKey(0), p, train=False)
    out = model.apply(variables, p, train=False)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_train_step_bf16_grads_f32(bf16_mode):
    """Gradients and Adam state stay f32; loss is finite."""
    from pretrain_gnns_tpu.train import finetune, optim
    from pretrain_gnns_tpu.train.state import TrainState
    from pretrain_gnns_tpu.data.packing import PackedLoader

    graphs, _ = molecule_dataset(32, num_tasks=3, seed=0, mean_atoms=12)
    cfg = finetune.FinetuneConfig(num_tasks=3, num_layer=2, emb_dim=16,
                                  batch_size=8, packing="standard")
    model = finetune.build_model(cfg)
    batches = list(PackedLoader(graphs, 8, shuffle=False, drop_last=True))
    variables = model.init(jax.random.PRNGKey(0), batches[0], train=False)
    tx = optim.adam(1e-3)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    step = finetune.make_train_step(model, tx, "chem")
    state, loss = step(state, batches[0])
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_losses_upcast_bf16_logits():
    logits = jnp.array([[0.5, -1.0]], jnp.bfloat16)
    y = jnp.array([[1.0, -1.0]])
    out = losses.masked_task_bce(logits, y, jnp.array([True]))
    assert out.dtype == jnp.float32
