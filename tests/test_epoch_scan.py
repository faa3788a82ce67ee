"""Epoch-resident scan trainer (train/pretrain.py::_run_epoch_mode).

The whole-epoch ``lax.scan`` path must be training-dynamics identical to
the per-step device-loader path (same descriptors, same rng stream), the
static-cap padding must be a true no-op, and the DP variant's per-step
math must equal the hand-computed grad-average/sync-BN update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.train import optim, pretrain
from pretrain_gnns_tpu.train.state import TrainState


def _cfg(**kw):
    base = dict(
        objective="masking", num_layer=2, emb_dim=16, batch_size=8,
        mask_edge=True, seed=0, device_dataset="on", packing="standard",
    )
    base.update(kw)
    return pretrain.PretrainConfig(**base)


def _leaves_equal(a, b, tol=0.0):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=tol, rtol=tol
        )


def test_epoch_scan_matches_per_step():
    graphs, _ = molecule_dataset(64, num_tasks=1, seed=0, mean_atoms=12)
    r_step = pretrain.run_pretrain(
        _cfg(scan_steps=1), graphs, log=None, epochs=2
    )
    r_epoch = pretrain.run_pretrain(
        _cfg(scan_steps=4), graphs, log=None, epochs=2
    )
    assert type(r_step["loader"]).__name__ == "DeviceBatchLoader"
    assert type(r_epoch["loader"]).__name__ == "DeviceBatchLoader"
    l1 = [h["loss"] for h in r_step["history"]]
    l2 = [h["loss"] for h in r_epoch["history"]]
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    _leaves_equal(r_step["state"].params, r_epoch["state"].params)
    assert int(r_step["state"].step) == int(r_epoch["state"].step)


def _setup_single(graphs, cfg):
    model = pretrain.build_objective(cfg)
    loader = pretrain.build_loader(cfg, graphs)
    desc0 = next(iter(loader))
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng, mask_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": init_rng, "mask": mask_rng}, loader.prepare(desc0),
        train=False,
    )
    if "batch_stats" not in variables:
        variables = dict(variables, batch_stats={})
    tx = optim.adam(cfg.lr, cfg.decay)
    return model, loader, tx, TrainState.create(variables, tx, rng)


def test_epoch_padding_is_noop():
    graphs, _ = molecule_dataset(32, num_tasks=1, seed=0, mean_atoms=12)
    cfg = _cfg(scan_steps=2)
    model, loader, tx, state = _setup_single(graphs, cfg)
    step = pretrain.make_epoch_pretrain_step(
        model, tx, loader.prepare_pure, loader.dev
    )
    n = len(loader)
    assert n >= 2
    exact = loader.epoch_stack(steps_cap=n)
    loader._epoch -= 1  # replay the same epoch (same shuffle + mask rng)
    padded = loader.epoch_stack(steps_cap=n + 3)
    assert padded["n_steps"] == n and not padded["overflow"]
    assert padded["valid"].sum() == n and len(padded["valid"]) == n + 3
    s1, l1, m1 = step(state, exact["stacked"], exact["valid"])
    s2, l2, m2 = step(state, padded["stacked"], padded["valid"])
    _leaves_equal(s1.params, s2.params)
    _leaves_equal(s1.opt_state, s2.opt_state)
    assert int(s1.step) == int(s2.step) == n
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2)[:n])
    assert np.all(np.asarray(l2)[n:] == 0.0)
    # rng of padded steps must not advance
    np.testing.assert_array_equal(np.asarray(s1.rng), np.asarray(s2.rng))


def test_epoch_overflow_dispatch():
    """Batches beyond the static cap run via length-1 scans with identical
    results to one uncapped scan."""
    graphs, _ = molecule_dataset(32, num_tasks=1, seed=0, mean_atoms=12)
    cfg = _cfg(scan_steps=2)
    model, loader, tx, state = _setup_single(graphs, cfg)
    step = pretrain.make_epoch_pretrain_step(
        model, tx, loader.prepare_pure, loader.dev
    )
    n = len(loader)
    full = loader.epoch_stack(steps_cap=n)
    loader._epoch -= 1
    capped = loader.epoch_stack(steps_cap=n - 1)
    assert len(capped["overflow"]) == 1
    s1, l1, _ = step(state, full["stacked"], full["valid"])
    s2, l2, _ = step(state, capped["stacked"], capped["valid"])
    ov = jax.tree_util.tree_map(
        lambda x: np.asarray(x)[None], capped["overflow"][0]
    )
    s2, lov, _ = step(s2, ov, np.ones(1, bool))
    _leaves_equal(s1.params, s2.params)
    np.testing.assert_allclose(
        np.asarray(l1), np.concatenate([np.asarray(l2), np.asarray(lov)])
    )


@pytest.mark.skipif(jax.device_count() < 2, reason="needs 2 devices")
def test_epoch_dp_step_math():
    """One DP epoch-scan step == hand-averaged per-batch grads + pmean'd
    BN stats + one Adam update (dropout off; masking rides descriptors,
    so per-device rngs are inert)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pretrain_gnns_tpu.parallel.mesh import make_mesh

    graphs, _ = molecule_dataset(32, num_tasks=1, seed=0, mean_atoms=12)
    cfg = _cfg(scan_steps=2, dp_devices=2)
    model, loader, _, state = _setup_single(graphs, cfg)
    # SGD: Adam's g/sqrt(v) normalization amplifies f32 reduction-order
    # noise on near-zero-grad coords to O(lr), masking real errors
    tx = optax.sgd(1e-2)
    state = state.replace(opt_state=tx.init(state.params))
    mesh = make_mesh(2)
    dev = jax.device_put(loader.dev, NamedSharding(mesh, P()))
    state = jax.device_put(state, NamedSharding(mesh, P()))
    pack = loader.epoch_stack(n_dev=2)
    stacked = {
        k: jax.device_put(v[:1], NamedSharding(mesh, P(None, "data")))
        for k, v in pack["stacked"].items()
    }
    valid = jax.device_put(
        np.ones(1, bool), NamedSharding(mesh, P())
    )
    dp_step = pretrain.make_epoch_dp_pretrain_step(
        model, tx, mesh, loader.prepare_pure, dev
    )
    s1, losses, _ = dp_step(state, stacked, valid)

    # manual two-batch emulation at the same params
    def loss_fn(params, batch):
        (loss, _), mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(9),
                  "mask": jax.random.PRNGKey(9)},
        )
        return loss, mut["batch_stats"]

    grads_list, stats_list, losses_list = [], [], []
    for d in range(2):
        desc = {k: np.asarray(v)[0, d] for k, v in pack["stacked"].items()}
        batch = loader.prepare(desc)
        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch)
        grads_list.append(grads)
        stats_list.append(stats)
        losses_list.append(float(loss))
    grads = jax.tree_util.tree_map(
        lambda a, b: (a + b) / 2, *grads_list
    )
    stats = jax.tree_util.tree_map(
        lambda a, b: (a + b) / 2, *stats_list
    )
    updates, _ = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    # tolerance covers f32 reduction-order differences between the
    # shard_map-compiled and eager-emulated graphs; a grad-averaging or
    # BN-sync bug would be orders of magnitude larger
    _leaves_equal(s1.params, params, tol=1e-5)
    _leaves_equal(s1.batch_stats, stats, tol=1e-5)
    np.testing.assert_allclose(
        float(np.asarray(losses)[0]), np.mean(losses_list), rtol=1e-5
    )


def test_grouped_overflow_falls_back_per_epoch():
    """A dispatch group containing overflow batches must preserve step
    order by dispatching per epoch — asserted bit-exact against the
    ungrouped run on a loader whose advertised length forces overflow."""
    from pretrain_gnns_tpu.train.pretrain import (_run_epoch_mode,
                                              _sharding_put)

    graphs, _ = molecule_dataset(64, num_tasks=1, seed=0, mean_atoms=12)
    cfg = _cfg(scan_steps=4, batch_size=16)

    class CappedLen:
        """Advertises one batch fewer than real -> steps_cap short by one
        -> every epoch carries one overflow batch."""

        def __init__(self, inner):
            self.inner = inner

        def __len__(self):
            return len(self.inner) - 1

        def epoch_stack(self, steps_cap, n_dev):
            return self.inner.epoch_stack(steps_cap=steps_cap,
                                          n_dev=n_dev)

    def run(group_e):
        model, loader, tx, st = _setup_single(graphs, cfg)
        step = pretrain.make_epoch_pretrain_step(
            model, tx, loader.prepare_pure, loader.dev
        )
        history = []
        st = _run_epoch_mode(
            CappedLen(loader), st, step, _sharding_put(None),
            _sharding_put(None), 1, history,
            None, 1, 3, None, 0, epoch_group=group_e,
        )
        assert all("overflow" not in str(h) for h in history)
        return history, st

    h1, s1 = run(1)
    h2, s2 = run(3)
    assert [h["epoch"] for h in h1] == [h["epoch"] for h in h2] == [1, 2, 3]
    np.testing.assert_allclose(
        [h["loss"] for h in h1], [h["loss"] for h in h2], rtol=1e-6
    )
    _leaves_equal(s1.params, s2.params)
