"""Downstream fine-tuning — the reference's chem/finetune.py as a library.

Pipeline (SURVEY.md §3.1): dataset → split → PackedLoader → GNNGraphPred
(optionally trunk-initialized from a pretrained checkpoint) → masked BCE →
Adam(lr_scale groups) → per-epoch train/val/test ROC-AUC → post-hoc model
selection = test AUC at the argmax-val-AUC epoch (chem/parse_result.py:7-20).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pretrain_gnns_tpu.core.graphs import Graph, PackedGraphs
from pretrain_gnns_tpu.data.packing import (
    PackedLoader, choose_blocks, make_loader,
)
from pretrain_gnns_tpu.data.prefetch import prefetch
from pretrain_gnns_tpu.models.chem import GNNGraphPred
from pretrain_gnns_tpu.objectives import losses
from pretrain_gnns_tpu.train import metrics, optim
from pretrain_gnns_tpu.train.state import TrainState

# Reference task counts (chem/finetune.py:125-144)
NUM_TASKS = {
    "tox21": 12, "hiv": 1, "pcba": 128, "muv": 17, "bace": 1, "bbbp": 1,
    "toxcast": 617, "sider": 27, "clintox": 2, "mutag": 1, "ptc_mr": 1,
}


@dataclasses.dataclass
class FinetuneConfig:
    """Mirrors the argparse surface of chem/finetune.py:83-115 and
    bio/finetune.py:70-106 (``domain`` selects the model family)."""

    domain: str = "chem"  # chem | bio
    num_tasks: int = 1
    num_layer: int = 5
    emb_dim: int = 300
    dropout_ratio: float = 0.5
    graph_pooling: str = "mean"
    jk: str = "last"
    gnn_type: str = "gin"
    lr: float = 1e-3
    lr_scale: float = 1.0
    decay: float = 0.0
    batch_size: int = 32
    epochs: int = 100
    seed: int = 0  # split seed
    runseed: int = 0  # init / shuffle seed
    packing: str = "auto"  # auto | standard | blocked (Pallas layout)
    loss_kind: Optional[str] = None  # default: chem masked BCE | bio plain
    # edge-partitioned halo execution (parallel/halo.py): shard each packed
    # batch's node rows over this many devices; 1 = single-device
    halo_devices: int = 1
    # also evaluate (and report) the train-split AUC each epoch
    # (reference --eval_train, chem/finetune.py:205-210)
    eval_train: bool = False

    def __post_init__(self):
        if self.loss_kind is None:
            self.loss_kind = "bio" if self.domain == "bio" else "chem"


def build_model(cfg: FinetuneConfig):
    if cfg.domain == "bio":
        from pretrain_gnns_tpu.models import bio as bio_models

        return bio_models.GNNGraphPred(
            num_layer=cfg.num_layer,
            emb_dim=cfg.emb_dim,
            num_tasks=cfg.num_tasks,
            jk=cfg.jk,
            drop_ratio=cfg.dropout_ratio,
            graph_pooling=cfg.graph_pooling,
            gnn_type=cfg.gnn_type,
        )
    return GNNGraphPred(
        num_layer=cfg.num_layer,
        emb_dim=cfg.emb_dim,
        num_tasks=cfg.num_tasks,
        jk=cfg.jk,
        drop_ratio=cfg.dropout_ratio,
        graph_pooling=cfg.graph_pooling,
        gnn_type=cfg.gnn_type,
    )


def make_train_step(model, tx, loss_kind: str = "chem"):
    loss_fn_map = {
        "chem": losses.masked_task_bce,
        "bio": losses.plain_bce,
    }
    loss_of = loss_fn_map[loss_kind]

    @jax.jit
    def step(state: TrainState, batch: PackedGraphs):
        rng, drop_rng = jax.random.split(state.rng)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": drop_rng},
            )
            return loss_of(out, batch.y, batch.graph_mask), mutated

        (loss, mutated), grads = jax.value_and_grad(
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
        return new_state, loss

    return step


def make_scan_train_step(model, tx, loss_kind: str = "chem"):
    """Device-side multi-step trainer: one dispatch runs K train steps via
    ``lax.scan`` over a stacked batch pytree (leaves ``[K, ...]``).
    Amortizes host dispatch latency — the TPU-native replacement for the
    reference's per-batch python loop."""
    single = make_train_step(model, tx, loss_kind)

    @jax.jit
    def scan_steps(state: TrainState, stacked: PackedGraphs):
        def body(st, batch):
            st, loss = single(st, batch)
            return st, loss

        state, losses = jax.lax.scan(body, state, stacked)
        return state, losses

    return scan_steps


def stack_batches(batches) -> PackedGraphs:
    """[K] identically-shaped PackedGraphs -> leaves stacked on axis 0."""
    import numpy as np

    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs], axis=0), *batches
    )


def make_halo_steps(cfg: "FinetuneConfig", tx):
    """Edge-partitioned train/eval steps (parallel/halo.py): each packed
    batch is node-sharded over ``cfg.halo_devices`` devices per step, with
    boundary-only all-to-all feature exchange inside every conv layer.
    Returns (train_step, eval_step, sharder): the steps accept HOST
    batches and shard through the returned ``HaloSharder`` — reserve it
    with dataset-level batches first so every shard has identical static
    shapes and the jitted steps compile once."""
    from pretrain_gnns_tpu.parallel import halo as halolib
    from pretrain_gnns_tpu.parallel import mesh as meshlib

    if cfg.jk != "last" or cfg.graph_pooling != "mean":
        raise NotImplementedError(
            "halo execution implements the protocol default head "
            "(JK=last, mean pool)"
        )
    n = cfg.halo_devices
    hmesh = meshlib.make_mesh(n, axis_name="edge")
    step_raw = halolib.make_halo_train_step(
        hmesh, tx, num_layer=cfg.num_layer, gnn_type=cfg.gnn_type,
        domain=cfg.domain, drop_ratio=cfg.dropout_ratio,
    )
    apply_raw = halolib.make_halo_graphpred_apply(
        hmesh, cfg.num_layer, gnn_type=cfg.gnn_type, domain=cfg.domain,
    )
    sharder = halolib.HaloSharder(n, hmesh)

    def train_step(state, batch):
        if isinstance(batch, PackedGraphs) and batch.node_feat.ndim == 2:
            batch = sharder.shard_put(batch)
        return step_raw(state, batch)

    def eval_step(state, batch):
        if isinstance(batch, PackedGraphs) and batch.node_feat.ndim == 2:
            batch = sharder.shard_put(batch)
        return apply_raw(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
        )

    return train_step, eval_step, sharder


def make_eval_step(model):
    @jax.jit
    def logits(state: TrainState, batch: PackedGraphs):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            train=False,
        )

    return logits


def evaluate(eval_step, state, loader: PackedLoader,
             metric: str = "chem_auc", return_tasks: bool = False):
    """Run the model over a loader, collect valid-graph scores/labels, and
    compute the protocol metric on host (chem/finetune.py:49-77). Items
    may be ``(host_batch, device_batch)`` pairs — the pre-sharded halo
    eval path — in which case labels come from the host copy and the step
    consumes the device copy. ``return_tasks`` additionally returns the
    per-task AUC array (bio metric; None otherwise) — the data behind
    bio/result_analysis.py's pairwise scatter plots."""
    ys, ss = [], []
    for batch in loader:
        if isinstance(batch, tuple):
            host, dev = batch
        else:
            host = dev = batch
        out = np.asarray(eval_step(state, dev))
        m = np.asarray(host.graph_mask)
        ys.append(np.asarray(host.y)[m])
        ss.append(out[m])
    y = np.concatenate(ys)
    s = np.concatenate(ss)
    if metric == "chem_auc":
        out = metrics.chem_mean_auc(y, s)
        return (out, None) if return_tasks else out
    if metric == "bio_auc":
        arr = metrics.bio_auc_array(y, s)
        out = float(np.nanmean(arr))
        return (out, arr) if return_tasks else out
    if metric == "accuracy":
        out = metrics.accuracy_from_scores(y[:, 0], s[:, 0])
        return (out, None) if return_tasks else out
    raise ValueError(metric)


def init_state(
    cfg: FinetuneConfig,
    model,
    sample_batch: PackedGraphs,
    pretrained_trunk: Optional[Dict[str, Any]] = None,
) -> Tuple[TrainState, Any]:
    rng = jax.random.PRNGKey(cfg.runseed)
    rng, init_rng = jax.random.split(rng)
    # jitted init (eager init is pathologically slow over remote TPU)
    variables = jax.jit(
        lambda k, b: model.init(k, b, train=False)
    )(init_rng, sample_batch)
    if pretrained_trunk is not None:
        from pretrain_gnns_tpu.compat import import_params

        variables = import_params.graphpred_variables_with_trunk(
            variables, pretrained_trunk
        )
    tx = optim.finetune_adam(cfg.lr, cfg.lr_scale, cfg.decay)
    return TrainState.create(variables, tx, rng), tx


def run_finetune(
    cfg: FinetuneConfig,
    train_graphs: Sequence[Graph],
    valid_graphs: Sequence[Graph],
    test_graphs: Sequence[Graph],
    pretrained_trunk: Optional[Dict[str, Any]] = None,
    metric: Optional[str] = None,
    log: Optional[Callable[[str], None]] = print,
    extra_test: Optional[Dict[str, Sequence[Graph]]] = None,
) -> Dict[str, Any]:
    """Full fine-tune run; returns per-epoch AUC curves plus the
    best-val-epoch test AUC (the protocol headline number)."""
    metric = metric or ("chem_auc" if cfg.loss_kind == "chem" else "bio_auc")
    model = build_model(cfg)

    extra_pad = (
        {"center_node_idx": cfg.batch_size} if cfg.domain == "bio" else None
    )
    all_graphs = (list(train_graphs) + list(valid_graphs)
                  + list(test_graphs))
    blocks = choose_blocks(all_graphs, cfg.batch_size, cfg.packing)
    train_loader = make_loader(
        train_graphs, cfg.batch_size, shuffle=True, seed=cfg.runseed,
        extra_pad=extra_pad, blocks=blocks,
    )
    mn, me = train_loader.max_nodes, train_loader.max_edges
    kw = dict(max_nodes=mn, max_edges=me, shuffle=False,
              extra_pad=extra_pad, blocks=blocks)
    val_loader = make_loader(valid_graphs, cfg.batch_size, **kw)
    test_loader = make_loader(test_graphs, cfg.batch_size, **kw)
    extra_loaders = {
        name: make_loader(gs, cfg.batch_size, **kw)
        for name, gs in (extra_test or {}).items() if gs
    }
    if cfg.eval_train:
        extra_loaders["train"] = make_loader(
            train_graphs, cfg.batch_size, **kw
        )

    sample = next(iter(val_loader))
    state, tx = init_state(cfg, model, sample, pretrained_trunk)
    eval_sets = dict(val=val_loader, test=test_loader, **extra_loaders)
    train_iter = lambda: prefetch(train_loader)
    if cfg.halo_devices > 1:
        train_step, eval_step, sharder = make_halo_steps(cfg, tx)
        # replicate the state onto the halo mesh up-front — the first
        # step would otherwise compile twice (uncommitted vs replicated
        # argument shardings)
        state = jax.device_put(
            state, jax.sharding.NamedSharding(
                sharder.mesh, jax.sharding.PartitionSpec()
            )
        )
        # static halo buffers from DATASET-level maxima, derived ONCE: the
        # deterministic eval loaders plus one unshuffled pass over the
        # train set (r3 sized them per batch -> a recompile per distinct
        # shard shape on heavy-tailed data). Each loader is packed once:
        # the materialized batch lists feed both the reserve and the
        # shard+upload precompute, and eval_train's loader doubles as the
        # train prescan.
        eval_batches = {
            name: list(ldr) for name, ldr in eval_sets.items()
        }

        def all_batches():
            for batches in eval_batches.values():
                yield from batches
            if "train" not in eval_batches:
                yield from make_loader(train_graphs, cfg.batch_size, **kw)

        sharder.reserve(all_batches())
        # eval batches re-pack identically every epoch: shard + upload
        # them ONCE, keep the host copy for labels/masks
        eval_sets = {
            name: [(b, sharder.shard_put(b)) for b in batches]
            for name, batches in eval_batches.items()
        }
        # train batches are sharded on the prefetch thread, overlapped
        # with the in-flight device step
        train_iter = lambda: prefetch(
            map(sharder.shard_put, train_loader)
        )
    else:
        train_step = make_train_step(model, tx, cfg.loss_kind)
        eval_step = make_eval_step(model)

    curves = {"train_loss": [], "val": [], "test": []}
    curves_tasks: Dict[str, list] = {}  # bio: per-task AUC arrays/epoch
    for name in extra_loaders:
        curves[name] = []
    for epoch in range(1, cfg.epochs + 1):
        # losses stay on device; one readback per epoch keeps dispatch
        # asynchronous (the per-step float(loss) host sync was the
        # bench-vs-production gap)
        step_losses, nb = [], 0
        for batch in train_iter():
            state, loss = train_step(state, batch)
            step_losses.append(loss)
            nb += 1
        tot = float(jnp.sum(jnp.stack(step_losses))) if step_losses else 0.0
        track_tasks = metric == "bio_auc"
        val_auc = evaluate(eval_step, state, eval_sets["val"], metric)
        test_auc, test_tasks = evaluate(
            eval_step, state, eval_sets["test"], metric, return_tasks=True
        )
        curves["train_loss"].append(tot / max(nb, 1))
        curves["val"].append(val_auc)
        curves["test"].append(test_auc)
        if track_tasks:
            curves_tasks.setdefault("test", []).append(test_tasks)
        if epoch == 1 and log:
            stats = getattr(train_loader, "last_epoch_stats", None)
            if stats:
                log(f"loader: {stats['batches']} batches, "
                    f"{stats['graphs_per_batch']:.1f} graphs/batch "
                    f"(batch_size={cfg.batch_size})")
        for name in extra_loaders:
            auc, tasks = evaluate(
                eval_step, state, eval_sets[name], metric,
                return_tasks=True,
            )
            curves[name].append(auc)
            if track_tasks:
                curves_tasks.setdefault(name, []).append(tasks)
        if log:
            log(
                f"epoch {epoch}: loss {curves['train_loss'][-1]:.4f} "
                f"val {val_auc:.4f} test {test_auc:.4f}"
            )

    best_epoch = int(np.argmax(curves["val"]))
    out = {
        "curves": curves,
        "best_epoch": best_epoch + 1,
        "val_auc": curves["val"][best_epoch],
        "test_auc": curves["test"][best_epoch],
        "state": state,
    }
    if curves_tasks:
        # per-task AUCs at the selected epoch (the data behind
        # bio/result_analysis.py:84-139's pairwise scatter plots)
        out["task_auc"] = {
            name: arrs[best_epoch] for name, arrs in curves_tasks.items()
        }
    return out


def run_finetune_cv(
    cfg: FinetuneConfig,
    graphs: Sequence[Graph],
    fold_idx: int = 0,
    n_splits: int = 10,
    pretrained_trunk: Optional[Dict[str, Any]] = None,
    log: Optional[Callable[[str], None]] = print,
) -> Dict[str, Any]:
    """10-fold CV variant for mutag/ptc_mr (chem/finetune_mutag_ptc.py):
    StratifiedKFold on the single task's labels, metric = accuracy of
    sign(score) (:65-78); no test split — validation doubles as the
    reported metric."""
    labels = [float(np.asarray(g.y).reshape(-1)[0]) for g in graphs]
    from pretrain_gnns_tpu.data import splitters

    tr_idx, va_idx = splitters.cv_random_split(
        labels, fold_idx=fold_idx, n_splits=n_splits, seed=cfg.seed
    )
    train_g = [graphs[i] for i in tr_idx]
    val_g = [graphs[i] for i in va_idx]
    res = run_finetune(
        cfg, train_g, val_g, val_g, pretrained_trunk=pretrained_trunk,
        metric="accuracy", log=log,
    )
    res["fold_idx"] = fold_idx
    return res
