"""Halo-executed SSL pretraining objectives (parallel/halo_ssl.py).

VERDICT r4 missing #2: the edge-partitioned executor must run the SSL
objectives themselves — the giant-ego-network workloads it was built for
(bio/pretrain_masking.py:29-66, bio/pretrain_edgepred.py:26-42, infomax
analogues). Each config's full halo optimizer step (train-mode psum BN,
grads through the collectives, SGD update) must match the single-device
flax objective step.
"""

import jax
import numpy as np
import optax
import pytest

from pretrain_gnns_tpu.data.synthetic import bio_dataset, molecule_dataset
from pretrain_gnns_tpu.parallel import halo, halo_ssl
from pretrain_gnns_tpu.parallel import mesh as meshlib
from pretrain_gnns_tpu.train import pretrain
from pretrain_gnns_tpu.train.state import TrainState

N_SHARDS = 4


def _cfg(domain, objective, **kw):
    return pretrain.PretrainConfig(
        objective=objective, domain=domain, num_layer=2, emb_dim=16,
        batch_size=8, packing="standard", device_dataset="off",
        scan_steps=1, seed=0, **kw,
    )


def _graphs(domain):
    if domain == "bio":
        return bio_dataset(16, num_downstream=3, seed=7, mean_nodes=24)
    return molecule_dataset(24, num_tasks=1, seed=3, mean_atoms=20)[0]


def _first_batch(cfg, graphs):
    loader = pretrain.build_loader(cfg, graphs, node_multiple=N_SHARDS * 8)
    batch = next(iter(loader))
    assert batch.node_feat.shape[0] % N_SHARDS == 0
    return batch


CONFIGS = [
    ("chem", "masking", {"mask_edge": True}),
    ("chem", "edgepred", {}),
    ("chem", "infomax", {}),
    ("bio", "masking", {}),
    ("bio", "edgepred", {}),
    ("bio", "infomax", {}),
]


@pytest.mark.parametrize("domain,objective,kw", CONFIGS)
def test_halo_ssl_step_matches_single_device(domain, objective, kw):
    cfg = _cfg(domain, objective, **kw)
    graphs = _graphs(domain)
    batch = _first_batch(cfg, graphs)

    model = pretrain.build_objective(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(5), "mask": jax.random.PRNGKey(6)},
        batch, train=False,
    )
    if "batch_stats" not in variables:
        variables = dict(variables, batch_stats={})
    # SGD keeps the update linear in the gradient (same rationale as
    # test_halo.py::test_halo_train_step_matches_single_device)
    tx = optax.sgd(0.1)

    ref_state = TrainState.create(variables, tx, jax.random.PRNGKey(9))
    ref_step = pretrain.make_pretrain_step(model, tx)

    halo_state = TrainState.create(variables, tx, jax.random.PRNGKey(9))
    m = meshlib.make_mesh(N_SHARDS, axis_name="edge")
    halo_step = halo_ssl.make_halo_ssl_train_step(
        m, tx, objective, domain=domain, num_layer=cfg.num_layer,
        gnn_type=cfg.gnn_type,
    )
    prepped = halo_ssl.prepare_ssl_extras(batch, objective, domain)
    sharded = halo.put_sharded(
        halo.shard_packed(prepped, N_SHARDS), m
    )

    for it in range(3):
        ref_state, ref_loss, ref_metrics = ref_step(ref_state, batch)
        halo_state, halo_loss, halo_metrics = halo_step(halo_state,
                                                        sharded)
        np.testing.assert_allclose(float(halo_loss), float(ref_loss),
                                   rtol=2e-5, err_msg=f"step {it}")
        for k, v in ref_metrics.items():
            np.testing.assert_allclose(
                float(halo_metrics[k]), float(v), rtol=1e-4, atol=1e-6,
                err_msg=f"metric {k} step {it}",
            )
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


def test_halo_ssl_rejects_contextpred():
    with pytest.raises(ValueError, match="contextpred"):
        halo_ssl._loss_fn("contextpred", "chem")


def test_halo_ssl_scan_step_matches_per_batch():
    """K sharded batches through one lax.scan dispatch == K per-batch
    dispatches (the dispatch-amortized halo path)."""
    cfg = _cfg("bio", "masking")
    graphs = _graphs("bio")
    loader = pretrain.build_loader(cfg, graphs,
                                   node_multiple=N_SHARDS * 8)
    batches = [
        halo_ssl.prepare_ssl_extras(b, "masking", "bio")
        for b in loader
    ][:2]
    assert len(batches) == 2

    model = pretrain.build_objective(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(5), "mask": jax.random.PRNGKey(6)},
        batches[0], train=False,
    )
    tx = optax.sgd(0.1)
    m = meshlib.make_mesh(N_SHARDS, axis_name="edge")
    step = halo_ssl.make_halo_ssl_train_step(
        m, tx, "masking", domain="bio", num_layer=cfg.num_layer,
    )
    sharder = halo.HaloSharder(N_SHARDS, m)
    sharder.reserve(batches)
    sharded = [sharder.shard_put(b) for b in batches]

    s1 = TrainState.create(variables, tx, jax.random.PRNGKey(9))
    losses1 = []
    for b in sharded:
        s1, loss, _ = step(s1, b)
        losses1.append(float(loss))

    s2 = TrainState.create(variables, tx, jax.random.PRNGKey(9))
    scan_step = halo_ssl.make_halo_ssl_scan_step(step)
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *sharded
    )
    s2, losses2, _ = scan_step(s2, stacked)
    np.testing.assert_allclose(losses1, np.asarray(losses2), rtol=1e-6)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s1.params),
        jax.tree_util.tree_leaves_with_path(s2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7, err_msg=str(pa))


def test_run_pretrain_halo_checkpoint_resume(tmp_path):
    """Halo SSL checkpoint/resume (r5 review fix): an interrupted run
    restores the latest step and continues at the right epoch, and the
    transform_device='device' masking variant is routed to the host
    batch transform (the jitted-step variant ships no extras)."""
    cfg = _cfg("chem", "masking", mask_edge=False,
               transform_device="device")
    graphs = _graphs("chem")
    d = str(tmp_path / "ck")

    logs = []
    res1 = pretrain.run_pretrain_halo(
        cfg, graphs, N_SHARDS, log=logs.append, epochs=2,
        checkpoint_dir=d, checkpoint_every=1,
    )
    assert len(res1["history"]) == 2
    res2 = pretrain.run_pretrain_halo(
        cfg, graphs, N_SHARDS, log=logs.append, epochs=3,
        checkpoint_dir=d,
    )
    assert any("resumed from step" in m for m in logs)
    assert [h["epoch"] for h in res2["history"]] == [3]
    assert int(res2["state"].step) > int(res1["state"].step)
