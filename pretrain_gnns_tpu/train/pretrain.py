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
    # supervised (chem/pretrain_supervised.py / bio analogue)
    num_tasks: int = 1
    graph_pooling: str = "mean"
    # contextpred
    csize: int = 3
    mode: str = "cbow"
    neg_samples: int = 1
    context_pooling: str = "mean"
    # bio contextpred (bio/pretrain_contextpred.py: --l1 default 1, --center)
    l1: int = 1
    center: bool = True
    # contextpred fast path: presampled (root, context) variants cycled
    # per epoch (data/context_loader.py::PresampledContextLoader)
    context_variants: int = 8
    # batch layout: auto = block-diagonal (Pallas kernels) on accelerators
    packing: str = "auto"  # auto | standard | blocked
    # graph-data parallelism: devices in the mesh's "data" axis
    # (0 = all local devices, 1 = single-device)
    dp_devices: int = 1
    # device-side multi-step trainer: fuse this many train steps into one
    # lax.scan dispatch (0 = auto: 16 on accelerators, off on CPU)
    scan_steps: int = 0
    # where the chem masking transform runs:
    #   "host"   per-graph python in the loader (reference-worker style)
    #   "batch"  ONE vectorized numpy pass over each packed batch in the
    #            prefetch thread, emitting the same compact extras
    #            (data/batch_transforms.py) — same objective module,
    #            zero device overhead; the default
    #   "device" fused into the jitted step (FusedMaskingObjective)
    #   "auto"   -> "batch"
    transform_device: str = "auto"
    # device-resident dataset (data/device_pack.py): keep the whole flat
    # dataset in HBM and materialize batches on device from ~10 KB
    # descriptors. "auto" = on for accelerators (chem masking/infomax,
    # single-device); "on"/"off" force it
    device_dataset: str = "auto"
    # epochs fused per scan dispatch in the epoch-resident trainer
    # (0 = auto: ~256 steps/dispatch on accelerators, 1 on CPU)
    epoch_group: int = 0


def masking_mode(cfg: PretrainConfig) -> str:
    """Resolve the masking-transform placement for chem masking."""
    if cfg.objective != "masking" or cfg.domain != "chem":
        return "host"
    mode = cfg.transform_device
    return "batch" if mode == "auto" else mode


def use_device_transform(cfg: PretrainConfig) -> bool:
    return masking_mode(cfg) == "device"


def use_device_dataset(cfg: PretrainConfig) -> bool:
    if cfg.device_dataset == "off":
        return False
    if cfg.dp_devices != 1 and resolve_scan_steps(cfg.scan_steps) <= 1:
        # without the epoch scan, the DP path consumes host-packed
        # batches (grouped + shard_global_batch), not descriptors
        return False
    ok = (
        cfg.objective in ("masking", "infomax", "edgepred", "contextpred",
                          "supervised")
        if cfg.domain == "chem"
        # bio indicator features ride the int32 chunk layout (cast back
        # at materialize time); the SSL trunks never read the center
        # extra, so the extras-free device loader is sufficient
        # (contextpred carries center_substruct_idx in the descriptors)
        else cfg.objective in ("masking", "edgepred", "infomax",
                               "contextpred", "supervised")
    )
    if not ok:
        return False
    if cfg.device_dataset == "on":
        return True
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


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
        if use_device_transform(cfg):
            from pretrain_gnns_tpu.objectives.masking import (
                FusedMaskingObjective,
            )

            return FusedMaskingObjective(
                mask_edge=cfg.mask_edge, mask_rate=cfg.mask_rate,
                mask_atom_token=cfg.num_atom_type,
                mask_bond_token=cfg.num_edge_type, **common,
            )
        return MaskingObjective(mask_edge=cfg.mask_edge, **common)
    if cfg.objective == "edgepred":
        return EdgePredObjective(**common, **trunk_kw)
    if cfg.objective == "infomax":
        return InfomaxObjective(**common, **trunk_kw)
    if cfg.objective == "supervised":
        from pretrain_gnns_tpu.objectives.supervised import (
            SupervisedObjective,
        )

        return SupervisedObjective(
            num_tasks=cfg.num_tasks, graph_pooling=cfg.graph_pooling,
            domain=cfg.domain, **common,
        )
    if cfg.objective == "contextpred":
        # bio context encoder is fixed at 3 layers
        # (bio/pretrain_contextpred.py:156)
        return ContextPredObjective(
            csize=3 if bio else cfg.csize, mode=cfg.mode,
            neg_samples=cfg.neg_samples,
            context_pooling=cfg.context_pooling, **common, **trunk_kw,
        )
    raise ValueError(cfg.objective)


def _try_device_loader(cfg, graphs, blocks, mn, me, drop_last,
                       mask_spec=None, neg_spec=None,
                       bio_mask_spec=None, center_spec=False):
    """DeviceBatchLoader when the dataset flattens cleanly; None = fall
    back to the host packers."""
    from pretrain_gnns_tpu.data.device_pack import DeviceBatchLoader
    from pretrain_gnns_tpu.data.flat import FlatGraphs

    try:
        flat = FlatGraphs.from_graphs(list(graphs))
        return DeviceBatchLoader(
            flat, cfg.batch_size, mn, me, seed=cfg.seed, blocks=blocks,
            drop_last=drop_last, mask_spec=mask_spec, neg_spec=neg_spec,
            bio_mask_spec=bio_mask_spec, center_spec=center_spec,
        )
    except (ValueError, IndexError) as e:
        # legitimate fallbacks exist (ragged extras, non-integral
        # features) but a silent one hides config regressions as a pure
        # perf loss — say why the slow path was taken
        print(f"[pretrain] device-resident dataset unavailable ({e}); "
              "using the host packing pipeline", flush=True)
        return None


def build_loader(cfg: PretrainConfig, graphs: Sequence[Graph],
                 drop_last: bool = True, node_multiple: int = 1):
    """Dataset pipeline per objective (transform placement mirrors the
    reference's DataLoader workers, SURVEY.md §1). ``node_multiple``
    rounds the node buffer up (halo execution needs N divisible by the
    shard count)."""
    mn, me = buffer_sizes(graphs, cfg.batch_size)
    blocks = choose_blocks(graphs, cfg.batch_size, cfg.packing)
    if blocks is not None:
        n_blocks, bn, be = blocks
        mn, me = n_blocks * bn, n_blocks * be
    elif node_multiple > 1:
        mn = (mn + node_multiple - 1) // node_multiple * node_multiple
    # bio graphs carry a per-graph center_node_idx extra that must be padded
    base_pad = (
        {"center_node_idx": cfg.batch_size} if cfg.domain == "bio" else {}
    )
    if cfg.objective == "masking" and cfg.domain == "bio":
        n_masked = int(me // 2 * cfg.mask_rate) + cfg.batch_size + 8
        if cfg.transform_device == "host":
            # reference-worker style per-graph transform
            t = transforms.MaskEdge(cfg.mask_rate)
            return PackedLoader(
                graphs, cfg.batch_size, mn, me, seed=cfg.seed, transform=t,
                blocks=blocks,
                extra_pad={"masked_edge_idx": n_masked,
                           "mask_edge_label": n_masked, **base_pad},
                drop_last=drop_last,
            )
        if use_device_dataset(cfg):
            # device-resident bio dataset: indicator features stored as
            # int32 chunks, masking rides the descriptors
            dl = _try_device_loader(
                cfg, graphs, blocks, mn, me, drop_last,
                bio_mask_spec=dict(rate=cfg.mask_rate, budget=n_masked),
            )
            if dl is not None:
                return dl
        # flat/C++ packer + ONE vectorized masking pass per batch
        from pretrain_gnns_tpu.data.batch_transforms import BatchMaskEdge
        from pretrain_gnns_tpu.data.packing import make_loader

        return make_loader(
            graphs, cfg.batch_size, mn, me, seed=cfg.seed, blocks=blocks,
            drop_last=drop_last, extra_pad=base_pad or None,
            post_transform=BatchMaskEdge(cfg.mask_rate, budget=n_masked),
        )
    if cfg.objective == "masking":
        mode = masking_mode(cfg)
        if mode in ("batch", "device"):
            node_budget = int(mn * cfg.mask_rate) + cfg.batch_size + 8
            if use_device_dataset(cfg):
                dl = _try_device_loader(
                    cfg, graphs, blocks, mn, me, drop_last,
                    mask_spec=(
                        dict(rate=cfg.mask_rate, mask_edge=cfg.mask_edge,
                             node_budget=node_budget, edge_budget=me // 2,
                             atom_token=cfg.num_atom_type,
                             bond_token=cfg.num_edge_type)
                        if mode == "batch" else None
                    ),
                )
                if dl is not None:
                    return dl
            # clean batches on the flat/C++ packer fast path; "batch" adds
            # the vectorized masking pass in the prefetch thread
            from pretrain_gnns_tpu.data.packing import make_loader

            post = None
            if mode == "batch":
                from pretrain_gnns_tpu.data.batch_transforms import (
                    BatchMaskAtom,
                )

                post = BatchMaskAtom(
                    num_atom_type=cfg.num_atom_type,
                    num_edge_type=cfg.num_edge_type,
                    mask_rate=cfg.mask_rate, mask_edge=cfg.mask_edge,
                    node_budget=node_budget,
                    edge_budget=me // 2,
                )
            return make_loader(graphs, cfg.batch_size, mn, me,
                               seed=cfg.seed, blocks=blocks,
                               drop_last=drop_last, post_transform=post)
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
        if cfg.transform_device == "host":
            t = transforms.NegativeEdge()
            return PackedLoader(graphs, cfg.batch_size, mn, me,
                                seed=cfg.seed, transform=t,
                                extra_pad={"negative_edges": me // 2,
                                           **base_pad},
                                blocks=blocks, drop_last=drop_last)
        if use_device_dataset(cfg):
            # device-resident dataset. transform_device="device" samples
            # negatives INSIDE the jitted step
            # (objectives/edgepred.py::sample_negative_edges) — clean
            # descriptors; otherwise the host rejection sampler ships
            # them in the descriptors (neg_spec)
            dl = _try_device_loader(
                cfg, graphs, blocks, mn, me, drop_last,
                neg_spec=(None if cfg.transform_device == "device"
                          else dict(budget=me // 2)),
            )
            if dl is not None:
                return dl
        # flat/C++ packer + ONE vectorized negative-sampling pass
        from pretrain_gnns_tpu.data.batch_transforms import (
            BatchNegativeEdge,
        )
        from pretrain_gnns_tpu.data.packing import make_loader

        return make_loader(
            graphs, cfg.batch_size, mn, me, seed=cfg.seed, blocks=blocks,
            drop_last=drop_last, extra_pad=base_pad or None,
            post_transform=BatchNegativeEdge(edge_budget=me // 2),
        )
    if cfg.objective in ("infomax", "supervised"):
        if use_device_dataset(cfg):
            dl = _try_device_loader(
                cfg, graphs, blocks, mn, me, drop_last,
                # bio supervised: the GraphPred head concatenates the
                # center-node representation
                center_spec=(cfg.domain == "bio"
                             and cfg.objective == "supervised"),
            )
            if dl is not None:
                return dl
        # transform-free: rides the flat/C++ packer fast path
        from pretrain_gnns_tpu.data.packing import make_loader

        return make_loader(graphs, cfg.batch_size, mn, me, seed=cfg.seed,
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
        if cfg.transform_device == "host":
            # per-epoch per-sample BFS (reference-worker style)
            return ContextPairLoader(graphs, cfg.batch_size, t, mn, me,
                                     seed=cfg.seed, drop_last=drop_last)
        from pretrain_gnns_tpu.data.context_loader import (
            DeviceContextLoader, PresampledContextLoader,
        )

        if use_device_dataset(cfg):
            return DeviceContextLoader(
                graphs, cfg.batch_size, t, mn, me, seed=cfg.seed,
                drop_last=drop_last, variants=cfg.context_variants,
                blocked=blocks is not None,
            )
        return PresampledContextLoader(
            graphs, cfg.batch_size, t, mn, me, seed=cfg.seed,
            drop_last=drop_last, variants=cfg.context_variants,
        )
    raise ValueError(cfg.objective)


def _make_step_body(model, tx, prepare=None):
    """Shared train-step body. ``prepare(dev, desc)`` (optional) is the
    on-device batch materialization of the device-resident dataset path;
    ``dev`` is threaded through as a TRACED argument — never a closure
    (closure-captured arrays become HLO constants: the whole dataset would
    be baked into the executable)."""

    def body(state: TrainState, dev, batch):
        if prepare is not None:
            out = prepare(dev, batch[0])
            batch = out if isinstance(out, tuple) else (out,)
        rng, drop_rng, mask_rng = jax.random.split(state.rng, 3)

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

    return body


def make_pretrain_step(model, tx, prepare=None, dev=None):
    body = _make_step_body(model, tx, prepare)
    if prepare is None:
        @jax.jit
        def step(state: TrainState, *batch):
            return body(state, None, batch)

        return step

    jit_step = jax.jit(
        lambda state, dev_args, desc: body(state, dev_args, (desc,))
    )

    def step(state: TrainState, *batch):
        return jit_step(state, dev, batch[0])

    return step


def _masked_step(step_fn, state, xs):
    """Run one scan-element step; when ``v`` is False the step is a no-op
    (state passed through via a cheap elementwise select — padded steps
    must not advance rng/Adam moments/BN stats)."""
    import jax.numpy as jnp

    desc, v = xs
    st2, loss, metrics = step_fn(state, desc)
    st2 = jax.tree_util.tree_map(
        lambda a, b: jnp.where(v, a, b), st2, state
    )
    loss = jnp.where(v, loss, jnp.zeros_like(loss))
    metrics = jax.tree_util.tree_map(
        lambda m: jnp.where(v, m, jnp.zeros_like(m)), metrics
    )
    return st2, (loss, metrics)


def make_epoch_pretrain_step(model, tx, prepare, dev):
    """Epoch-resident trainer: the WHOLE epoch's descriptor stream lives in
    HBM (``DeviceBatchLoader.epoch_stack``) and one ``lax.scan`` dispatch
    runs every train step of the epoch — zero per-step host involvement
    (the reference re-enters python per batch, chem/pretrain_masking.py:42).
    Returns (state, losses [cap], metrics {k: [cap]}); padded steps
    contribute zeros and leave the state untouched."""
    step_body = _make_step_body(model, tx, prepare)

    @jax.jit
    def epoch_dev(state: TrainState, dev_args, stacked, valid):
        def body(st, xs):
            return _masked_step(
                lambda s, d: step_body(s, dev_args, (d,)), st, xs
            )

        return jax.lax.scan(body, state, (stacked, valid))

    def run(state: TrainState, stacked, valid):
        state, (losses, metrics) = epoch_dev(state, dev, stacked, valid)
        return state, losses, metrics

    return run


def make_epoch_dp_pretrain_step(model, tx, mesh, prepare, dev,
                                axis: str = "data"):
    """Data-parallel epoch-resident trainer: descriptors ``[cap, n_dev,
    ...]`` sharded over the mesh's data axis, resident arrays replicated;
    the scan runs INSIDE one shard_map so the per-step collectives
    (grad psum, sync-BN pmean) ride ICI with no per-step host dispatch.
    RNG/optimizer semantics mirror ``dp.make_dp_pretrain_step``."""
    import optax as _optax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def whole(state: TrainState, dev_args, stacked, valid):
        def per_device_step(st: TrainState, desc):
            local = jax.tree_util.tree_map(lambda x: x[0], desc)
            my_idx = jax.lax.axis_index(axis)
            rng = jax.random.fold_in(st.rng, my_idx)
            _, drop_rng, mask_rng = jax.random.split(rng, 3)
            out = prepare(dev_args, local)
            batch = out if isinstance(out, tuple) else (out,)

            def loss_fn(params):
                (loss, metrics), mutated = model.apply(
                    {"params": params, "batch_stats": st.batch_stats},
                    *batch,
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": drop_rng, "mask": mask_rng},
                )
                return loss, (metrics, mutated)

            (loss, (metrics, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(st.params)
            # shard_map auto-psums the cotangent of replicated (P())
            # inputs: `grads` is already the cross-device SUM (an extra
            # pmean would be identity on the replicated value) — divide
            # for the mean, as in dp.make_dp_pretrain_step
            n_dev = mesh.shape[axis]
            grads = jax.tree_util.tree_map(lambda g: g / n_dev, grads)
            loss = jax.lax.pmean(loss, axis)
            metrics = jax.tree_util.tree_map(
                lambda m: jax.lax.pmean(m, axis), metrics
            )
            stats = jax.lax.pmean(mutated["batch_stats"], axis)
            updates, opt_state = tx.update(grads, st.opt_state,
                                           st.params)
            params = _optax.apply_updates(st.params, updates)
            return st.replace(
                step=st.step + 1,
                params=params,
                batch_stats=stats,
                opt_state=opt_state,
                rng=jax.random.split(st.rng)[0],
            ), loss, metrics

        def body(st, xs):
            return _masked_step(per_device_step, st, xs)

        return jax.lax.scan(body, state, (stacked, valid))

    sharded = jax.jit(shard_map(
        whole,
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis), P()),
        out_specs=(P(), (P(), P())),
    ))

    def run(state: TrainState, stacked, valid):
        state, (losses, metrics) = sharded(state, dev, stacked, valid)
        return state, losses, metrics

    return run


def make_scan_pretrain_step(model, tx, prepare=None, dev=None):
    """Device-side multi-step trainer: one dispatch runs K objective train
    steps via ``lax.scan`` over a stacked batch pytree (tuple-of-batches
    leaves ``[K, ...]``). Returns (state, losses [K], metrics {k: [K]})."""
    step_body = _make_step_body(model, tx, prepare)

    @jax.jit
    def scan_dev(state: TrainState, dev_args, stacked):
        def body(st, batch):
            st, loss, metrics = step_body(st, dev_args, batch)
            return st, (loss, metrics)

        state, (losses, metrics) = jax.lax.scan(body, state, stacked)
        return state, losses, metrics

    def scan_steps(state: TrainState, stacked):
        return scan_dev(state, dev, stacked)

    return scan_steps


def _stack(batches):
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs], axis=0), *batches
    )


def resolve_scan_steps(scan_steps: int) -> int:
    if scan_steps > 0:
        return scan_steps
    try:
        return 16 if jax.default_backend() != "cpu" else 1
    except Exception:
        return 1


def resolve_epoch_group(epoch_group: int, steps_cap: int) -> int:
    """Epochs fused per scan dispatch: the per-dispatch tunnel roundtrip
    (~25 ms on the axon runtime) is amortized over
    ``group * steps_cap`` steps. Auto targets ~256 steps/dispatch on
    accelerators; CPU keeps one epoch per dispatch (test parity)."""
    if epoch_group > 0:
        return epoch_group
    try:
        if jax.default_backend() == "cpu":
            return 1
    except Exception:
        return 1
    return max(1, min(8, 256 // max(steps_cap, 1)))


def _sharding_put(sharding):
    """Default (single-process) epoch-mode transfer: plain device_put."""
    if sharding is None:
        return jax.device_put
    return lambda tree: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def _run_epoch_mode(loader, state, epoch_step, put_desc,
                    put_valid, group_w, history, log, start_epoch,
                    last_epoch, mgr, checkpoint_every,
                    epoch_group: int = 0, save_fn=None):
    """Epoch-resident training loop. Per dispatch GROUP (``epoch_group``
    epochs, auto ~256 steps) the host does exactly: (a) build the
    descriptor stacks on the prefetch thread (overlapped with in-flight
    device compute), (b) ONE device_put, (c) one scan dispatch over the
    concatenated epochs, (d) the PREVIOUS group's loss readback —
    deferred until after the next dispatch so the device never drains.
    Grouping is bit-exact vs per-epoch dispatch (the concatenated scan
    runs the identical step sequence); groups containing overflow
    batches fall back to per-epoch dispatch to preserve step order."""
    from pretrain_gnns_tpu.data.prefetch import prefetch

    steps_cap = max(len(loader) // group_w, 1)
    group_e = resolve_epoch_group(epoch_group, steps_cap)
    if checkpoint_every:
        # checkpoints happen at group boundaries; don't let grouping
        # silently coarsen an explicitly requested cadence
        group_e = min(group_e, checkpoint_every)

    if save_fn is None:
        save_fn = lambda st: mgr.save(int(st.step), st)  # noqa: E731

    def payloads():
        """Yield (epochs, dispatches): ``epochs`` = [(ep, pack)] rows of
        the group; ``dispatches`` = [(stacked, valid, packs)] — one
        concatenated entry normally, per-epoch entries when overflow
        forces order preservation."""
        group = []
        for ep in range(start_epoch, last_epoch + 1):
            pack = loader.epoch_stack(steps_cap=steps_cap, n_dev=group_w)
            if pack is None:
                if group:
                    yield _emit(group)
                    group = []
                yield [(ep, None)], []
                continue
            group.append((ep, pack))
            if len(group) == group_e:
                yield _emit(group)
                group = []
        if group:
            yield _emit(group)

    def _emit(group):
        packs = [p for _, p in group]
        if group_e > 1 and any(p["overflow"] for p in packs):
            # overflow batches must run between their epoch's scan and
            # the next epoch's — per-epoch dispatch preserves the order
            return group, [
                (put_desc(p["stacked"]), put_valid(p["valid"]), [p])
                for p in packs
            ]
        stacked = {
            k: np.concatenate([p["stacked"][k] for p in packs])
            for k in packs[0]["stacked"]
        }
        valid = np.concatenate([p["valid"] for p in packs])
        if len(packs) < group_e:
            # pad short tail groups with valid=False steps so every
            # group dispatch compiles to the SAME scan length
            pad = (group_e - len(packs)) * steps_cap
            stacked = {
                k: np.concatenate(
                    [v, np.zeros((pad,) + v.shape[1:], v.dtype)]
                )
                for k, v in stacked.items()
            }
            valid = np.concatenate([valid, np.zeros(pad, bool)])
        return group, [
            (put_desc(stacked), put_valid(valid), packs)
        ]

    def finalize(p):
        ep, loss_sum, metric_sums, nb, stats = p
        row = {"epoch": ep, "loss": float(loss_sum) / max(nb, 1)}
        if stats:
            row["edges"] = stats["edges"]  # benches sum exact windows
        row.update(
            {k: float(v) / max(nb, 1) for k, v in metric_sums.items()}
        )
        if ep == start_epoch and log and stats:
            over = stats["batches"] - steps_cap * group_w
            log(f"loader: {stats['batches']} batches, "
                f"{stats['graphs_per_batch']:.1f} graphs/batch "
                f"(epoch-resident scan, {steps_cap} steps/epoch, "
                f"{group_e} epochs/dispatch"
                + (f", +{over} overflow batches single-step"
                   if over > 0 else "") + ")")
        history.append(row)
        if log:
            log(" ".join(f"{k}={v:.4f}" if isinstance(v, float) else
                         f"{k}={v}" for k, v in row.items()))

    pending = []
    for epochs, dispatches in prefetch(payloads(), depth=2):
        if dispatches == [] and epochs and epochs[0][1] is None:
            for p in pending:
                finalize(p)
            pending = []
            finalize((epochs[0][0], 0.0, {}, 0, None))
            continue
        rows = []
        ep_iter = iter(epochs)
        for stacked, valid, packs in dispatches:
            state, losses, metrics = epoch_step(state, stacked, valid)
            for i, pack in enumerate(packs):
                ep, _ = next(ep_iter)
                sl = slice(i * steps_cap, (i + 1) * steps_cap)
                loss_sum = jnp.sum(losses[sl])
                metric_sums = {
                    k: jnp.sum(v[sl]) for k, v in metrics.items()
                }
                nb = pack["n_steps"]
                for ov in pack["overflow"]:
                    # surplus batches beyond the static cap: same
                    # per-step shapes, dispatched as a length-1 scan
                    ovs = put_desc(
                        jax.tree_util.tree_map(
                            lambda x: np.asarray(x)[None], ov
                        )
                    )
                    ovalid = put_valid(np.ones(1, bool))
                    state, l1, m1 = epoch_step(state, ovs, ovalid)
                    loss_sum = loss_sum + jnp.sum(l1)
                    metric_sums = {
                        k: metric_sums[k] + jnp.sum(m1[k])
                        for k in metric_sums
                    }
                    nb += 1
                rows.append((ep, loss_sum, metric_sums, nb,
                             pack["stats"]))
        for p in pending:
            finalize(p)
        pending = rows
        if mgr and checkpoint_every and rows and any(
            r[0] % checkpoint_every == 0 for r in rows
        ):
            save_fn(state)
    for p in pending:
        finalize(p)
    return state


def run_pretrain(
    cfg: PretrainConfig,
    graphs: Sequence[Graph],
    log: Optional[Callable[[str], None]] = print,
    epochs: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    pretrained_trunk: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Train one SSL objective. With ``checkpoint_dir``, orbax step
    checkpoints are written every ``checkpoint_every`` epochs (and at the
    end), and an interrupted run resumes from the latest step."""
    model = build_objective(cfg)
    loader = build_loader(cfg, graphs)
    prepare = getattr(loader, "prepare_pure", None)
    dev = getattr(loader, "dev", None)
    first = next(iter(loader))
    batch0 = first if isinstance(first, tuple) else (first,)

    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng, mask_rng = jax.random.split(rng, 3)
    # jitted init: eager init dispatches every op separately, which is
    # seconds-to-minutes over remote-attached TPU runtimes
    if prepare is not None:
        def _init(k1, k2, d, desc):
            out = prepare(d, desc)
            out = out if isinstance(out, tuple) else (out,)
            return model.init({"params": k1, "mask": k2}, *out,
                              train=False)

        variables = jax.jit(_init)(init_rng, mask_rng, dev, batch0[0])
    else:
        variables = jax.jit(
            lambda k1, k2, *b: model.init(
                {"params": k1, "mask": k2}, *b, train=False
            )
        )(init_rng, mask_rng, *batch0)
    if "batch_stats" not in variables:
        variables = dict(variables, batch_stats={})
    if pretrained_trunk is not None:
        # supervised stage initialized from an SSL trunk — the reference's
        # from_pretrained chain (chem/pretrain_supervised.py:132-133)
        variables = graft_trunk(variables, pretrained_trunk,
                                trunk_path(cfg))
    tx = optim.adam(cfg.lr, cfg.decay)
    state = TrainState.create(variables, tx, rng)
    n_dev = cfg.dp_devices if cfg.dp_devices > 0 else jax.device_count()
    mesh = None
    scan_k = resolve_scan_steps(cfg.scan_steps)
    # epoch-resident trainer: whole epoch of descriptors in HBM, one scan
    # dispatch per epoch (composes with DP: descriptors sharded over the
    # data axis, resident arrays replicated)
    epoch_mode = prepare is not None and scan_k > 1
    group_w = n_dev if n_dev > 1 else 1

    from pretrain_gnns_tpu.parallel import multihost

    multi = jax.process_count() > 1
    if multi:
        # SPMD multi-process (parallel.multihost): global mesh over every
        # process's devices; this process feeds its own columns only
        if not epoch_mode:
            raise RuntimeError(
                "multi-process training rides the device-resident "
                "epoch-scan path; set device_dataset='on' and scan_steps>1"
            )
        if n_dev != jax.device_count():
            raise ValueError(
                f"multi-process runs span all {jax.device_count()} global "
                f"devices (got dp_devices={cfg.dp_devices})"
            )
        if not multihost.is_main():
            log = None  # process-0-only logging

    # checkpoint manager + restore BEFORE device placement (a
    # multi-process run restores into the host-side template on every
    # process, then replicates onto the global mesh)
    mgr = None
    start_epoch = 1
    save_fn = None
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
        if multi:
            def save_fn(st):
                # state is fully replicated: process 0 writes the host
                # copy; everyone else waits at the barrier
                if multihost.is_main():
                    mgr.save(int(st.step), multihost.to_host(st))
                multihost.sync("checkpoint")

    if n_dev > 1:
        from pretrain_gnns_tpu.parallel import dp
        from pretrain_gnns_tpu.parallel.mesh import make_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(n_dev)
        if multi:
            nd, lo, hi = multihost.local_cols(mesh)
            if not hasattr(loader, "shard_cols"):
                raise RuntimeError(
                    "multi-process training needs the DeviceBatchLoader "
                    f"descriptor pipeline (got {type(loader).__name__})"
                )
            loader.shard_cols = (nd, lo, hi)
            host = lambda t: jax.tree_util.tree_map(np.asarray, t)
            state = multihost.put_replicated(host(state), mesh)
            dev = multihost.put_replicated(host(dev), mesh)
            epoch_step = make_epoch_dp_pretrain_step(
                model, tx, mesh, prepare, dev
            )
            put_desc = lambda t: multihost.put_col_sharded(t, mesh, lo)
            put_valid = lambda t: multihost.put_replicated(t, mesh)
            step = None
        else:
            state = jax.device_put(state, NamedSharding(mesh, P()))
            if epoch_mode:
                dev = jax.device_put(dev, NamedSharding(mesh, P()))
                epoch_step = make_epoch_dp_pretrain_step(
                    model, tx, mesh, prepare, dev
                )
                put_desc = _sharding_put(
                    NamedSharding(mesh, P(None, "data"))
                )
                put_valid = _sharding_put(NamedSharding(mesh, P()))
                step = None
            else:
                step = dp.make_dp_pretrain_step(model, tx, mesh)
    elif epoch_mode:
        epoch_step = make_epoch_pretrain_step(model, tx, prepare, dev)
        put_desc = put_valid = _sharding_put(None)
        step = None
    else:
        step = make_pretrain_step(model, tx, prepare, dev)

    from pretrain_gnns_tpu.data.prefetch import chunked, prefetch

    history = []
    if epoch_mode:
        state = _run_epoch_mode(
            loader, state, epoch_step, put_desc, put_valid,
            group_w, history, log, start_epoch, epochs or cfg.epochs,
            mgr, checkpoint_every, epoch_group=cfg.epoch_group,
            save_fn=save_fn,
        )
        if mgr:
            (save_fn or (lambda st: mgr.save(int(st.step), st)))(state)
            mgr.close()
        return {"state": state, "history": history, "model": model,
                "loader": loader}

    scan_k = scan_k if mesh is None else 1
    scan_step = (
        make_scan_pretrain_step(model, tx, prepare, dev)
        if scan_k > 1 else None
    )

    for epoch in range(start_epoch, (epochs or cfg.epochs) + 1):
        # device-side accumulation; ONE host readback per epoch (per-step
        # float(loss) would serialize dispatch with compute)
        loss_parts, nb = [], 0
        agg: Dict[str, list] = {}

        def collect(loss, metrics, k=1):
            nonlocal nb
            loss_parts.append(jnp.sum(loss))
            nb += k
            for key, v in metrics.items():
                agg.setdefault(key, []).append(jnp.sum(v))

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

            for batch in grouped(items):
                state, loss, metrics = step(state, *batch)
                collect(loss, metrics)
        else:
            def make_groups(raw):
                """Producer (runs on the prefetch thread): normalize,
                group, stack, and INITIATE the host->device transfer —
                everything overlaps the in-flight scan dispatches."""
                norm = (
                    item if isinstance(item, tuple) else (item,)
                    for item in raw
                )
                if scan_step is None:
                    for b in norm:
                        yield ("single", b)
                    return
                for group in chunked(norm, scan_k):
                    if len(group) == scan_k:
                        stacked = tuple(
                            jax.device_put(_stack([g[i] for g in group]))
                            for i in range(len(group[0]))
                        )
                        yield ("scan", stacked)
                    else:  # short tail: per-step path, same shapes
                        for b in group:
                            yield ("single", b)

            for kind, payload in prefetch(make_groups(items), depth=2):
                if kind == "scan":
                    state, losses, metrics = scan_step(state, payload)
                    collect(losses, metrics, k=scan_k)
                else:
                    state, loss, metrics = step(state, *payload)
                    collect(loss, metrics)

        tot = float(jnp.sum(jnp.stack(loss_parts))) if loss_parts else 0.0
        row = {"epoch": epoch, "loss": tot / max(nb, 1)}
        row.update({
            k: float(jnp.sum(jnp.stack(v))) / max(nb, 1)
            for k, v in agg.items()
        })
        if epoch == start_epoch and log:
            stats = getattr(loader, "last_epoch_stats", None)
            if stats:
                log(f"loader: {stats['batches']} batches, "
                    f"{stats['graphs_per_batch']:.1f} graphs/batch "
                    f"(batch_size={cfg.batch_size})")
        history.append(row)
        if log:
            log(" ".join(f"{k}={v:.4f}" if isinstance(v, float) else
                         f"{k}={v}" for k, v in row.items()))
        if mgr and checkpoint_every and epoch % checkpoint_every == 0:
            mgr.save(int(state.step), state)
    if mgr:
        mgr.save(int(state.step), state)
        mgr.close()
    return {"state": state, "history": history, "model": model,
            "loader": loader}


def run_pretrain_halo(
    cfg: PretrainConfig,
    graphs: Sequence[Graph],
    halo_devices: int,
    log: Optional[Callable[[str], None]] = print,
    epochs: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
) -> Dict[str, Any]:
    """Edge-partitioned SSL pretraining: each packed batch is node-sharded
    over ``halo_devices`` devices with boundary-only all-to-all exchange
    per conv layer (parallel/halo_ssl.py) — the giant-ego-network scaling
    path the north star names (bio/pretrain_masking.py etc.). Batches ride
    the host packing pipeline (the halo layout replaces the device-resident
    descriptors) and are dispatched ``scan_steps`` at a time through one
    ``lax.scan`` (the r4 dispatch-amortization lesson, applied here)."""
    import dataclasses as dc

    from pretrain_gnns_tpu.data.prefetch import chunked, prefetch
    from pretrain_gnns_tpu.parallel import halo_ssl
    from pretrain_gnns_tpu.parallel.halo import HaloSharder
    from pretrain_gnns_tpu.parallel.mesh import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    if cfg.objective not in halo_ssl.HALO_SSL_OBJECTIVES:
        raise ValueError(
            f"--halo_devices supports {halo_ssl.HALO_SSL_OBJECTIVES} "
            f"(and supervised via train.finetune), not {cfg.objective!r}"
        )
    # halo batches are host-packed: the jitted-step masking variant
    # ("device") has no extras for the halo losses to consume — route it
    # through the vectorized host pass instead
    td = ("batch" if (cfg.objective == "masking"
                      and cfg.transform_device == "device")
          else cfg.transform_device)
    hcfg = dc.replace(cfg, device_dataset="off", packing="standard",
                      transform_device=td)
    loader = build_loader(hcfg, graphs, node_multiple=halo_devices * 8)
    model = build_objective(hcfg)
    prep = lambda b: halo_ssl.prepare_ssl_extras(
        b, cfg.objective, cfg.domain
    )

    mesh = make_mesh(halo_devices, axis_name="edge")
    sharder = HaloSharder(halo_devices, mesh)
    # ONE streaming pass sizes the shard buffers (route_stats only) and
    # keeps the first batch for init — O(1 batch) host memory, not
    # O(epoch) (the giant-graph datasets halo exists for don't fit)
    first_holder = []

    def sizing_pass():
        for b in loader:
            pb = prep(b)
            if not first_holder:
                first_holder.append(pb)
            yield pb

    sharder.reserve(sizing_pass())
    if not first_holder:
        raise ValueError("empty dataset")

    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng, mask_rng = jax.random.split(rng, 3)
    variables = jax.jit(
        lambda k1, k2, b: model.init({"params": k1, "mask": k2}, b,
                                     train=False)
    )(init_rng, mask_rng, first_holder[0])
    if "batch_stats" not in variables:
        variables = dict(variables, batch_stats={})
    tx = optim.adam(cfg.lr, cfg.decay)
    state = TrainState.create(variables, tx, rng)

    mgr = None
    start_epoch = 1
    steps_per_epoch = max(len(loader), 1)
    if checkpoint_dir:
        from pretrain_gnns_tpu.train.checkpoints import CheckpointManager

        mgr = CheckpointManager(checkpoint_dir)
        latest = mgr.latest_step()
        if latest is not None:
            state = mgr.restore(state, latest)
            start_epoch = int(latest) // steps_per_epoch + 1
            if log:
                log(f"resumed from step {latest} (epoch {start_epoch})")

    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = halo_ssl.make_halo_ssl_train_step(
        mesh, tx, cfg.objective, domain=cfg.domain,
        num_layer=cfg.num_layer, gnn_type=cfg.gnn_type,
        drop_ratio=cfg.dropout_ratio,
    )
    scan_k = resolve_scan_steps(cfg.scan_steps)
    scan_step = (
        halo_ssl.make_halo_ssl_scan_step(step) if scan_k > 1 else None
    )
    desc_sh = NamedSharding(mesh, P(None, "edge"))
    batch_sh = NamedSharding(mesh, P("edge"))

    def payloads(batches):
        """Producer (prefetch thread): host-shard, group into scan_k
        stacks, initiate the H2D transfer."""
        host_sharded = map(sharder.shard, batches)
        if scan_step is None:
            for hb in host_sharded:
                yield ("single", jax.device_put(hb, batch_sh))
            return
        for group in chunked(host_sharded, scan_k):
            if len(group) == scan_k:
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs]),
                    *group,
                )
                yield ("scan", jax.device_put(stacked, desc_sh))
            else:
                for hb in group:
                    yield ("single", jax.device_put(hb, batch_sh))

    history = []
    for epoch in range(start_epoch, (epochs or cfg.epochs) + 1):
        batches = map(prep, iter(loader))
        loss_parts, nb = [], 0
        agg: Dict[str, list] = {}
        for kind, payload in prefetch(payloads(batches), depth=2):
            if kind == "scan":
                state, losses_, metrics = scan_step(state, payload)
                k = scan_k
            else:
                state, losses_, metrics = step(state, payload)
                k = 1
            loss_parts.append(jnp.sum(losses_))
            nb += k
            for key, v in metrics.items():
                agg.setdefault(key, []).append(jnp.sum(v))
        tot = float(jnp.sum(jnp.stack(loss_parts))) if loss_parts else 0.0
        row = {"epoch": epoch, "loss": tot / max(nb, 1)}
        row.update({
            k: float(jnp.sum(jnp.stack(v))) / max(nb, 1)
            for k, v in agg.items()
        })
        if epoch == start_epoch and log:
            stats = getattr(loader, "last_epoch_stats", None)
            if stats:
                log(f"loader: {stats['batches']} batches "
                    f"(halo x{halo_devices}, "
                    f"{scan_k if scan_step else 1} steps/dispatch, "
                    f"reshard {sharder.host_ms_per_batch:.1f} ms/batch)")
        history.append(row)
        if log:
            log(" ".join(f"{k}={v:.4f}" if isinstance(v, float) else
                         f"{k}={v}" for k, v in row.items()))
        if mgr and checkpoint_every and epoch % checkpoint_every == 0:
            mgr.save(int(state.step), state)
    if mgr:
        mgr.save(int(state.step), state)
        mgr.close()
    return {"state": state, "history": history, "model": model,
            "loader": loader, "sharder": sharder}


def trunk_path(cfg: PretrainConfig) -> Tuple[str, ...]:
    """Where the trunk lives in the objective's parameter tree."""
    if cfg.objective == "supervised":
        from pretrain_gnns_tpu.objectives.supervised import TRUNK_PATH

        return TRUNK_PATH
    if cfg.objective == "contextpred":
        return ("gnn_substruct",)
    return ("gnn",)


def graft_trunk(variables: Dict[str, Any], trunk: Dict[str, Any],
                path: Tuple[str, ...]) -> Dict[str, Any]:
    """Overwrite the trunk subtree at ``path`` with pretrained weights —
    the single implementation of the reference checkpoint contract
    (heads stay freshly initialized, SURVEY.md §3.4); compat's
    GraphPred import path delegates here with path ("gnn",)."""
    def set_in(tree, keys, value):
        tree = dict(tree)
        if len(keys) == 1:
            tree[keys[0]] = value
        else:
            tree[keys[0]] = set_in(tree[keys[0]], keys[1:], value)
        return tree

    out = dict(variables)
    out["params"] = set_in(out["params"], list(path), trunk["params"])
    if trunk.get("batch_stats"):
        out["batch_stats"] = set_in(
            dict(out.get("batch_stats", {})), list(path),
            trunk["batch_stats"],
        )
    return out


def trunk_variables(state: TrainState, trunk_name="gnn") -> Dict:
    """Extract the trunk for the reference checkpoint contract (trunk-only
    save, chem/pretrain_masking.py:146-147). ``trunk_name`` may be a
    nested path tuple (supervised: ("pred", "gnn"))."""
    path = (trunk_name,) if isinstance(trunk_name, str) else trunk_name

    def get_in(tree, keys):
        for k in keys:
            tree = tree[k] if tree else {}
        return tree or {}

    return {
        "params": get_in(state.params, path),
        "batch_stats": get_in(state.batch_stats or {}, path),
    }
