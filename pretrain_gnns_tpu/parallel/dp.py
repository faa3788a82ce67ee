"""Graph-data-parallel training over a device mesh.

Each device owns one fully-packed local batch (a :class:`PackedGraphs` with
identical static shapes on every device); the global batch is the stack of
local batches along a leading ``data`` axis. Inside ``shard_map`` every
device computes its local loss/gradients; gradients are ``psum``-averaged
over the mesh's ICI/DCN links and the (replicated) optimizer applies the
same update everywhere — the jax.sharding equivalent of DDP, which the
reference never had (SURVEY.md §2.8).

BatchNorm: batch statistics are ``pmean``-synchronized across replicas
(sync-BN). Documented deviation: torch DDP default leaves per-replica
running stats unsynchronized; syncing is both closer to the single-device
reference math (stats over the full global batch) and required for keeping
the state replicated.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from pretrain_gnns_tpu.core.graphs import PackedGraphs
from pretrain_gnns_tpu.objectives import losses
from pretrain_gnns_tpu.train.state import TrainState


def stack_local_batches(batches) -> PackedGraphs:
    """[n_dev] list of identically-shaped PackedGraphs -> leading-axis stack."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs], axis=0), *batches
    )


def shard_global_batch(global_batch: PackedGraphs, mesh: Mesh,
                       axis: str = "data") -> PackedGraphs:
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), global_batch
    )


def make_dp_train_step(
    model: Any,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    loss_of: Callable = losses.masked_task_bce,
    axis: str = "data",
):
    """Build a jitted data-parallel train step.

    The returned function takes (replicated TrainState, leading-axis-sharded
    global PackedGraphs) and returns (new TrainState, mean loss).
    """
    rep = P()
    shd = P(axis)

    def per_device(state: TrainState, local: PackedGraphs):
        local = jax.tree_util.tree_map(lambda x: x[0], local)  # drop dev axis
        my_idx = jax.lax.axis_index(axis)
        rng = jax.random.fold_in(state.rng, my_idx)
        rng, drop_rng = jax.random.split(rng)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                local,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": drop_rng},
            )
            return loss_of(out, local.y, local.graph_mask), mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # shard_map auto-psums the cotangent of replicated (P()) inputs, so
        # `grads` is already the cross-device SUM; divide for the mean.
        n_dev = mesh.shape[axis]
        grads = jax.tree_util.tree_map(lambda g: g / n_dev, grads)
        loss = jax.lax.pmean(loss, axis)
        stats = jax.lax.pmean(mutated["batch_stats"], axis)  # sync-BN

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_rng = jax.random.split(state.rng)[0]  # same on all devices
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=stats,
            opt_state=opt_state,
            rng=new_rng,
        )
        return new_state, loss

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(rep, shd),
        out_specs=(rep, rep),
    )
    return jax.jit(sharded)


def make_dp_pretrain_step(
    model: Any,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
):
    """Data-parallel version of train.pretrain.make_pretrain_step: the
    objective module computes (loss, metrics) per device over its local
    batch (or batch tuple, for contextpred); grads are psum-averaged,
    BN stats pmean-synced, metrics pmean'd. Works for every SSL objective
    because the objective IS the model's forward."""

    def per_device(state: TrainState, *batch):
        batch = tuple(
            jax.tree_util.tree_map(lambda x: x[0], b) for b in batch
        )
        my_idx = jax.lax.axis_index(axis)
        rng = jax.random.fold_in(state.rng, my_idx)
        _, drop_rng, mask_rng = jax.random.split(rng, 3)

        def loss_fn(params):
            (loss, metrics), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                *batch,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": drop_rng, "mask": mask_rng},
            )
            return loss, (metrics, mutated)

        (loss, (metrics, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        n_dev = mesh.shape[axis]
        grads = jax.tree_util.tree_map(lambda g: g / n_dev, grads)
        loss = jax.lax.pmean(loss, axis)
        metrics = jax.tree_util.tree_map(
            lambda m: jax.lax.pmean(m, axis), metrics
        )
        stats = jax.lax.pmean(mutated["batch_stats"], axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=stats,
            opt_state=opt_state,
            rng=jax.random.split(state.rng)[0],
        )
        return new_state, loss, metrics

    def wrapper(state, *batch):
        sharded = shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(),) + (P(axis),) * len(batch),
            out_specs=(P(), P(), P()),
        )
        return sharded(state, *batch)

    return jax.jit(wrapper)


def make_dp_eval_step(model: Any, mesh: Mesh, axis: str = "data"):
    """Data-parallel forward: returns per-device logits stacked on the
    leading axis (same layout as the input batch)."""

    def per_device(state: TrainState, local: PackedGraphs):
        local = jax.tree_util.tree_map(lambda x: x[0], local)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            local,
            train=False,
        )
        return out[None]

    return jax.jit(
        shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=P(axis),
        )
    )
