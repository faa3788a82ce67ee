"""Pretraining CLI — unifies the reference's five chem/bio pretrain scripts
(chem/pretrain_{masking,edgepred,deepgraphinfomax,contextpred,supervised}.py
and bio analogues) behind ``--objective``.

Example:
  python -m pretrain_gnns_tpu.cli.pretrain --objective masking \
      --dataset synthetic --epochs 5 --output_model_file trunk

Saves the trunk (reference torch-legacy layout, loadable by the unmodified
reference) to ``<output_model_file>.pth``; with ``--checkpoint_dir`` also
writes orbax step checkpoints with resume.
"""

from __future__ import annotations

import argparse
import dataclasses
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--objective", default="masking",
                   choices=["masking", "edgepred", "infomax", "contextpred",
                            "supervised"])
    p.add_argument("--domain", default="chem", choices=["chem", "bio"])
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data_root", default="dataset")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--decay", type=float, default=0.0)
    p.add_argument("--num_layer", type=int, default=5)
    p.add_argument("--emb_dim", type=int, default=300)
    p.add_argument("--dropout_ratio", type=float, default=None,
                   help="default: 0.2 for supervised "
                        "(chem/pretrain_supervised.py:99), else 0.0")
    p.add_argument("--split", default="species",
                   choices=["species", "random"],
                   help="bio supervised pretrain-set construction "
                        "(bio/pretrain_supervised.py:83-101)")
    p.add_argument("--JK", dest="jk", default="last")
    p.add_argument("--gnn_type", default="gin")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp_devices", type=int, default=1,
                   help="data-parallel devices (0 = all local devices)")
    p.add_argument("--halo_devices", type=int, default=1,
                   help="edge-partitioned halo execution: node-shard each "
                        "batch over N devices (supervised + "
                        "masking/edgepred/infomax in both domains)")
    p.add_argument("--packing", default="auto",
                   choices=["auto", "standard", "blocked"],
                   help="batch layout: auto = block-diagonal (Pallas) on TPU")
    p.add_argument("--num_workers", type=int, default=0,
                   help="accepted for reference-CLI parity (unused)")
    p.add_argument("--scan_steps", type=int, default=0,
                   help="train steps fused per device dispatch "
                        "(0 = auto: 16 on accelerators)")
    p.add_argument("--transform_device", default="auto",
                   choices=["auto", "host", "batch", "device"],
                   help="SSL transform placement (chem masking): per-graph "
                        "in the loader (host), one vectorized pass per "
                        "batch (batch, the auto default), or fused into "
                        "the jitted step (device)")
    p.add_argument("--device_dataset", default="auto",
                   choices=["auto", "on", "off"],
                   help="keep the whole flat dataset in HBM and "
                        "materialize batches on device (auto = on for "
                        "accelerators; chem masking/infomax)")
    # masking
    p.add_argument("--mask_rate", type=float, default=0.15)
    p.add_argument("--mask_edge", type=int, default=0)
    # contextpred
    p.add_argument("--csize", type=int, default=3)
    p.add_argument("--mode", default="cbow", choices=["cbow", "skipgram"])
    p.add_argument("--neg_samples", type=int, default=1)
    p.add_argument("--context_pooling", default="mean")
    p.add_argument("--l1", type=int, default=1)
    p.add_argument("--center", type=int, default=1)
    # supervised
    p.add_argument("--input_model_file", default="",
                   help="SSL trunk to initialize from (supervised stage)")
    p.add_argument("--output_model_file", default="")
    p.add_argument("--checkpoint_dir", default="")
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="orbax save every N epochs (0 = end only)")
    p.add_argument("--n_synthetic", type=int, default=2000)
    return p


def resolve_dropout(args) -> float:
    """Reference defaults: supervised pretrain 0.2
    (chem/pretrain_supervised.py:99), all SSL objectives 0.0."""
    if args.dropout_ratio is not None:
        return args.dropout_ratio
    return 0.2 if args.objective == "supervised" else 0.0


def bio_supervised_pretrain_indices(species: "np.ndarray", split: str,
                                    seed: int):
    """The reference's supervised pretrain-set construction
    (bio/pretrain_supervised.py:83-101): species split -> pretrain set =
    7 train/valid species PLUS the easy ("broad") half of the human test
    set (chosen with the same seeded random_split fine-tuning later calls
    "test_easy"); the "random" branch instead pools the random split's
    train+valid fractions."""
    import numpy as np

    from pretrain_gnns_tpu.data import splitters

    n = len(species)
    if split == "random":
        tr, va, _ = splitters.random_split(n, seed=seed)
        return list(tr) + list(va)
    if split != "species":
        raise ValueError(f"Unknown split name. ({split})")
    tv, te = splitters.species_split(np.asarray(species))
    easy_idx, _, _ = splitters.random_split(
        len(te), frac_train=0.5, frac_valid=0.5, frac_test=0.0, seed=seed
    )
    return list(tv) + [te[i] for i in easy_idx]


def _supervised(args, graphs, meta):
    """Supervised pretraining = GNN_graphpred on the pretrain label set
    (chem/pretrain_supervised.py:120-148, bio/pretrain_supervised.py:108-131);
    trunk-only save, heads discarded."""
    import dataclasses as dc

    import numpy as np

    from pretrain_gnns_tpu.train import finetune as ft
    from pretrain_gnns_tpu.train.checkpoints import load_trunk_any
    import jax

    if args.domain == "bio":
        species = np.array(
            [g.extras["species_id"][0][0] for g in graphs]
        )
        keep = bio_supervised_pretrain_indices(species, args.split,
                                               args.seed)
        graphs = [graphs[i] for i in keep]
        graphs = [
            dc.replace(g, y=np.asarray(g.extras["go_target_pretrain"][0],
                                       np.float32))
            for g in graphs
        ]
    num_tasks = graphs[0].y.shape[0]

    if getattr(args, "halo_devices", 1) <= 1:
        # supervised rides the production pretrain pipeline (device-
        # resident dataset incl. the label table and, for bio, the
        # center-node slots; epoch scan, DP); halo keeps its
        # edge-partitioned executor
        from pretrain_gnns_tpu.train import pretrain as pt

        # bio: strip ragged extras the flat layout can't carry (labels
        # already moved into y; the head needs only center_node_idx)
        if args.domain == "bio":
            graphs = [
                dc.replace(g, extras={
                    "center_node_idx": g.extras["center_node_idx"],
                })
                for g in graphs
            ]
        pcfg = pt.PretrainConfig(
            objective="supervised", domain=args.domain,
            num_layer=args.num_layer, emb_dim=args.emb_dim, jk=args.jk,
            dropout_ratio=args.dropout_ratio, gnn_type=args.gnn_type,
            lr=args.lr, decay=args.decay, batch_size=args.batch_size,
            epochs=args.epochs, seed=args.seed, num_tasks=num_tasks,
            packing=args.packing, dp_devices=args.dp_devices,
            scan_steps=args.scan_steps,
            device_dataset=getattr(args, "device_dataset", "auto"),
        )
        trunk = load_trunk_any(args.input_model_file) \
            if args.input_model_file else None
        res = pt.run_pretrain(
            pcfg, graphs, log=lambda m: print(m, flush=True),
            pretrained_trunk=trunk,
            checkpoint_dir=args.checkpoint_dir or None,
            checkpoint_every=args.checkpoint_every,
        )
        return (
            pt.trunk_variables(res["state"], pt.trunk_path(pcfg)),
            res["history"],
        )

    if args.checkpoint_dir:
        raise SystemExit(
            "--checkpoint_dir is not supported with --halo_devices for "
            "the supervised objective (the halo GraphPred loop has no "
            "mid-run checkpointing); drop one of the flags"
        )
    cfg = ft.FinetuneConfig(
        domain=args.domain, num_tasks=num_tasks, num_layer=args.num_layer,
        emb_dim=args.emb_dim, dropout_ratio=args.dropout_ratio,
        jk=args.jk, gnn_type=args.gnn_type, lr=args.lr, decay=args.decay,
        batch_size=args.batch_size, epochs=args.epochs, runseed=args.seed,
        halo_devices=getattr(args, "halo_devices", 1),
    )
    model = ft.build_model(cfg)
    extra_pad = (
        {"center_node_idx": cfg.batch_size} if args.domain == "bio" else None
    )
    from pretrain_gnns_tpu.data.packing import choose_blocks, make_loader
    from pretrain_gnns_tpu.data.prefetch import prefetch
    import jax.numpy as jnp

    blocks = choose_blocks(graphs, cfg.batch_size, args.packing)
    loader = make_loader(graphs, cfg.batch_size, seed=args.seed,
                         drop_last=True, extra_pad=extra_pad,
                         blocks=blocks)
    sample = next(iter(loader))
    trunk = load_trunk_any(args.input_model_file) \
        if args.input_model_file else None
    state, tx = ft.init_state(cfg, model, sample, trunk)
    n_dev = args.dp_devices if args.dp_devices > 0 else jax.device_count()
    mesh = None
    if cfg.halo_devices > 1:
        step, _, sharder = ft.make_halo_steps(cfg, tx)
        state = jax.device_put(
            state, jax.sharding.NamedSharding(
                sharder.mesh, jax.sharding.PartitionSpec()
            )
        )
        # static shard buffers from one deterministic pass (single compile
        # across all epochs)
        sharder.reserve(iter(make_loader(
            graphs, cfg.batch_size, seed=args.seed, drop_last=True,
            extra_pad=extra_pad, blocks=blocks, shuffle=False,
        )))
    elif n_dev > 1:
        # graph-data parallelism for the supervised stage
        # (chem/pretrain_supervised.py has no distributed path; ours DDPs
        # the masked/plain BCE like every other objective)
        from pretrain_gnns_tpu.objectives import losses
        from pretrain_gnns_tpu.parallel import dp
        from pretrain_gnns_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_dev)
        loss_of = (losses.plain_bce if args.domain == "bio"
                   else losses.masked_task_bce)
        step = dp.make_dp_train_step(model, tx, mesh, loss_of=loss_of)
        state = jax.device_put(
            state, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()
            )
        )
    else:
        step = ft.make_train_step(model, tx, cfg.loss_kind)

    history = []
    for epoch in range(1, args.epochs + 1):
        loss_parts, nb = [], 0
        if mesh is not None:
            from pretrain_gnns_tpu.parallel import dp

            it = iter(loader)
            while True:
                group = [b for _, b in zip(range(n_dev), it)]
                if len(group) < n_dev:
                    break
                gb = dp.shard_global_batch(
                    dp.stack_local_batches(group), mesh
                )
                state, loss = step(state, gb)
                loss_parts.append(loss)
                nb += 1
        else:
            for batch in prefetch(loader):
                state, loss = step(state, batch)
                loss_parts.append(loss)
                nb += 1
        tot = (float(jnp.sum(jnp.stack(loss_parts))) if loss_parts else 0.0)
        history.append({"epoch": epoch, "loss": tot / max(nb, 1)})
        print(json.dumps(history[-1]))
    trunk_vars = {
        "params": state.params["gnn"],
        "batch_stats": (state.batch_stats or {}).get("gnn", {}),
    }
    return trunk_vars, history


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.dropout_ratio = resolve_dropout(args)

    # multi-host bootstrap (no-op unless PGT_COORDINATOR /
    # PGT_NUM_PROCESSES / PGT_PROCESS_ID are set — see parallel.multihost)
    from pretrain_gnns_tpu.parallel import multihost

    multihost.initialize()

    from pretrain_gnns_tpu.data import datasets
    from pretrain_gnns_tpu.train import pretrain
    from pretrain_gnns_tpu.train.checkpoints import (
        save_trunk_reference_format,
    )

    if args.domain == "bio" and args.dataset == "synthetic":
        args.dataset = "synthetic_bio"
    graphs, _, meta = datasets.load_dataset(
        args.dataset, args.data_root, args.n_synthetic, seed=args.seed
    )

    if args.objective == "supervised":
        trunk_vars, history = _supervised(args, graphs, meta)
    else:
        cfg = pretrain.PretrainConfig(
            objective=args.objective, domain=args.domain,
            num_layer=args.num_layer, emb_dim=args.emb_dim, jk=args.jk,
            dropout_ratio=args.dropout_ratio, gnn_type=args.gnn_type,
            lr=args.lr, decay=args.decay, batch_size=args.batch_size,
            epochs=args.epochs, seed=args.seed, mask_rate=args.mask_rate,
            mask_edge=bool(args.mask_edge), csize=args.csize,
            mode=args.mode, neg_samples=args.neg_samples,
            context_pooling=args.context_pooling, l1=args.l1,
            center=bool(args.center), packing=args.packing,
            dp_devices=args.dp_devices, scan_steps=args.scan_steps,
            transform_device=args.transform_device,
            device_dataset=args.device_dataset,
        )
        if getattr(args, "halo_devices", 1) > 1:
            # edge-partitioned SSL pretraining (parallel/halo_ssl.py):
            # the giant-ego-network scaling path
            res = pretrain.run_pretrain_halo(
                cfg, graphs, args.halo_devices,
                log=lambda s: print(s, flush=True),
                checkpoint_dir=args.checkpoint_dir or None,
                checkpoint_every=args.checkpoint_every,
            )
        else:
            res = pretrain.run_pretrain(
                cfg, graphs, log=lambda s: print(s, flush=True),
                checkpoint_dir=args.checkpoint_dir or None,
                checkpoint_every=args.checkpoint_every,
            )
        history = res["history"]
        trunk_name = (
            "gnn_substruct" if args.objective == "contextpred" else "gnn"
        )
        trunk_vars = pretrain.trunk_variables(res["state"], trunk_name)

    if args.output_model_file and multihost.is_main():
        # process-0 only: in an N-host run every process holds the same
        # replicated trunk; concurrent writes would tear the file
        path = args.output_model_file + ".pth"
        save_trunk_reference_format(trunk_vars, path)
        print(f"saved trunk -> {path}")
    return history


if __name__ == "__main__":
    main()
