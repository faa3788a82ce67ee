"""Pretraining entry library — the reference's chem/pretrain_*.py scripts
unified over one loop (SURVEY.md §2.6).

Objectives: masking | edgepred | infomax | contextpred | supervised. Each
reference script seeds torch/np to 0, builds dataset+transform, one Adam per
submodule (== one Adam over the union), runs 100 epochs and saves the trunk
only; this module reproduces that with optax + our PackedLoader pipelines.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pretrain_gnns_tpu.core.graphs import Graph
from pretrain_gnns_tpu.data import transforms
from pretrain_gnns_tpu.data.context_loader import ContextPairLoader
from pretrain_gnns_tpu.data.packing import (
    PackedLoader, buffer_sizes, choose_blocks,
)
from pretrain_gnns_tpu.objectives.contextpred import ContextPredObjective
from pretrain_gnns_tpu.objectives.edgepred import EdgePredObjective
from pretrain_gnns_tpu.objectives.infomax import InfomaxObjective
from pretrain_gnns_tpu.objectives.masking import MaskingObjective
from pretrain_gnns_tpu.train import optim
from pretrain_gnns_tpu.train.state import TrainState


@dataclasses.dataclass
class PretrainConfig:
    """Shared argparse surface of the pretrain scripts
    (chem/pretrain_masking.py:85-122 etc.)."""

    objective: str = "masking"
    domain: str = "chem"  # chem | bio
    num_layer: int = 5
    emb_dim: int = 300
    jk: str = "last"
    dropout_ratio: float = 0.0
    gnn_type: str = "gin"
    lr: float = 1e-3
    decay: float = 0.0
    batch_size: int = 256
    epochs: int = 100
    seed: int = 0
    # masking
    mask_rate: float = 0.15
    mask_edge: bool = True
    num_atom_type: int = 119
    num_edge_type: int = 5
    # contextpred
    csize: int = 3
    mode: str = "cbow"
    neg_samples: int = 1
    context_pooling: str = "mean"
    # bio contextpred (bio/pretrain_contextpred.py: --l1 default 1, --center)
    l1: int = 1
    center: bool = True
    # batch layout: auto = block-diagonal (Pallas kernels) on accelerators
    packing: str = "auto"  # auto | standard | blocked
    # graph-data parallelism: devices in the mesh's "data" axis
    # (0 = all local devices, 1 = single-device)
    dp_devices: int = 1


def build_objective(cfg: PretrainConfig):
    common = dict(
        num_layer=cfg.num_layer, emb_dim=cfg.emb_dim, jk=cfg.jk,
        drop_ratio=cfg.dropout_ratio, gnn_type=cfg.gnn_type,
    )
    bio = cfg.domain == "bio"
    trunk_kw = {}
    if bio:
        from pretrain_gnns_tpu.models import bio as bio_models

        trunk_kw = {"trunk": bio_models.GNN}
    if cfg.objective == "masking":
        if bio:
            from pretrain_gnns_tpu.objectives.masking import (
                BioMaskEdgeObjective,
            )

            return BioMaskEdgeObjective(**common)
        return MaskingObjective(mask_edge=cfg.mask_edge, **common)
    if cfg.objective == "edgepred":
        return EdgePredObjective(**common, **trunk_kw)
    if cfg.objective == "infomax":
        return InfomaxObjective(**common, **trunk_kw)
    if cfg.objective == "contextpred":
        # bio context encoder is fixed at 3 layers
        # (bio/pretrain_contextpred.py:156)
        return ContextPredObjective(
            csize=3 if bio else cfg.csize, mode=cfg.mode,
            neg_samples=cfg.neg_samples,
            context_pooling=cfg.context_pooling, **common, **trunk_kw,
        )
    raise ValueError(cfg.objective)


def build_loader(cfg: PretrainConfig, graphs: Sequence[Graph],
                 drop_last: bool = True):
    """Dataset pipeline per objective (transform placement mirrors the
    reference's DataLoader workers, SURVEY.md §1)."""
    mn, me = buffer_sizes(graphs, cfg.batch_size)
    blocks = choose_blocks(graphs, cfg.batch_size, cfg.packing)
    if blocks is not None:
        n_blocks, bn, be = blocks
        mn, me = n_blocks * bn, n_blocks * be
    # bio graphs carry a per-graph center_node_idx extra that must be padded
    base_pad = (
        {"center_node_idx": cfg.batch_size} if cfg.domain == "bio" else {}
    )
    if cfg.objective == "masking" and cfg.domain == "bio":
        t = transforms.MaskEdge(cfg.mask_rate)
        n_masked = int(me // 2 * cfg.mask_rate) + cfg.batch_size + 8
        return PackedLoader(
            graphs, cfg.batch_size, mn, me, seed=cfg.seed, transform=t,
            blocks=blocks,
            extra_pad={"masked_edge_idx": n_masked,
                       "mask_edge_label": n_masked, **base_pad},
            drop_last=drop_last,
        )
    if cfg.objective == "masking":
        t = transforms.MaskAtom(
            cfg.num_atom_type, cfg.num_edge_type, cfg.mask_rate,
            cfg.mask_edge,
        )
        n_masked = int(mn * cfg.mask_rate) + cfg.batch_size + 8
        extra_pad = {
            "masked_atom_indices": n_masked,
            "mask_node_label": n_masked,
            "connected_edge_indices": me // 2,
            "mask_edge_label": me // 2,
        }
        return PackedLoader(graphs, cfg.batch_size, mn, me, seed=cfg.seed,
                            transform=t, extra_pad=extra_pad,
                            blocks=blocks, drop_last=drop_last)
    if cfg.objective == "edgepred":
        t = transforms.NegativeEdge()
        return PackedLoader(graphs, cfg.batch_size, mn, me, seed=cfg.seed,
                            transform=t,
                            extra_pad={"negative_edges": me // 2,
                                       **base_pad},
                            blocks=blocks, drop_last=drop_last)
    if cfg.objective == "infomax":
        return PackedLoader(graphs, cfg.batch_size, mn, me, seed=cfg.seed,
                            extra_pad=base_pad or None,
                            blocks=blocks, drop_last=drop_last)
    if cfg.objective == "contextpred":
        if cfg.domain == "bio":
            t = transforms.BioExtractSubstructureContextPair(
                cfg.l1, cfg.center
            )
        else:
            l1 = cfg.num_layer - 1
            l2 = l1 + cfg.csize
            t = transforms.ExtractSubstructureContextPair(
                cfg.num_layer, l1, l2
            )
        return ContextPairLoader(graphs, cfg.batch_size, t, mn, me,
                                 seed=cfg.seed, drop_last=drop_last)
    raise ValueError(cfg.objective)


def make_pretrain_step(model, tx):
    @jax.jit
    def step(state: TrainState, *batch):
        rng, drop_rng = jax.random.split(state.rng)

        def loss_fn(params):
            (loss, metrics), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                *batch,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": drop_rng},
            )
            return loss, (metrics, mutated)

        (loss, (metrics, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=mutated["batch_stats"],
            opt_state=opt_state,
            rng=rng,
        )
        return new_state, loss, metrics

    return step


def run_pretrain(
    cfg: PretrainConfig,
    graphs: Sequence[Graph],
    log: Optional[Callable[[str], None]] = print,
    epochs: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
) -> Dict[str, Any]:
    """Train one SSL objective. With ``checkpoint_dir``, orbax step
    checkpoints are written every ``checkpoint_every`` epochs (and at the
    end), and an interrupted run resumes from the latest step."""
    model = build_objective(cfg)
    loader = build_loader(cfg, graphs)
    first = next(iter(loader))
    batch0 = first if isinstance(first, tuple) else (first,)

    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    variables = model.init(init_rng, *batch0, train=False)
    if "batch_stats" not in variables:
        variables = dict(variables, batch_stats={})
    tx = optim.adam(cfg.lr, cfg.decay)
    state = TrainState.create(variables, tx, rng)
    n_dev = cfg.dp_devices if cfg.dp_devices > 0 else jax.device_count()
    mesh = None
    if n_dev > 1:
        from pretrain_gnns_tpu.parallel import dp
        from pretrain_gnns_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_dev)
        step = dp.make_dp_pretrain_step(model, tx, mesh)
        state = jax.device_put(
            state, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()
            )
        )
    else:
        step = make_pretrain_step(model, tx)

    mgr = None
    start_epoch = 1
    steps_per_epoch = max(len(loader), 1) if hasattr(loader, "__len__") \
        else None
    if checkpoint_dir:
        from pretrain_gnns_tpu.train.checkpoints import CheckpointManager

        mgr = CheckpointManager(checkpoint_dir)
        latest = mgr.latest_step()
        if latest is not None:
            state = mgr.restore(state, latest)
            if steps_per_epoch:
                start_epoch = int(latest) // steps_per_epoch + 1
            if log:
                log(f"resumed from step {latest} (epoch {start_epoch})")

    history = []
    for epoch in range(start_epoch, (epochs or cfg.epochs) + 1):
        tot, nb = 0.0, 0
        agg: Dict[str, float] = {}
        items = iter(loader)
        if mesh is not None:
            from pretrain_gnns_tpu.parallel import dp

            def grouped(it):
                """n_dev consecutive local batches -> one sharded global
                batch per tuple element (leftovers dropped)."""
                while True:
                    group = []
                    for _ in range(n_dev):
                        nxt = next(it, None)
                        if nxt is None:
                            return
                        group.append(
                            nxt if isinstance(nxt, tuple) else (nxt,)
                        )
                    stacked = tuple(
                        dp.shard_global_batch(
                            dp.stack_local_batches([g[i] for g in group]),
                            mesh,
                        )
                        for i in range(len(group[0]))
                    )
                    yield stacked

            items = grouped(items)
        for item in items:
            batch = item if isinstance(item, tuple) else (item,)
            state, loss, metrics = step(state, *batch)
            tot += float(loss)
            nb += 1
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        row = {"epoch": epoch, "loss": tot / max(nb, 1)}
        row.update({k: v / max(nb, 1) for k, v in agg.items()})
        history.append(row)
        if log:
            log(" ".join(f"{k}={v:.4f}" if isinstance(v, float) else
                         f"{k}={v}" for k, v in row.items()))
        if mgr and checkpoint_every and epoch % checkpoint_every == 0:
            mgr.save(int(state.step), state)
    if mgr:
        mgr.save(int(state.step), state)
        mgr.close()
    return {"state": state, "history": history, "model": model}


def trunk_variables(state: TrainState, trunk_name: str = "gnn") -> Dict:
    """Extract the trunk for the reference checkpoint contract (trunk-only
    save, chem/pretrain_masking.py:146-147)."""
    return {
        "params": state.params[trunk_name],
        "batch_stats": (state.batch_stats or {}).get(trunk_name, {}),
    }
