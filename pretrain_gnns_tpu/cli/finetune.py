"""Fine-tune CLI — the reference's chem/finetune.py & bio/finetune.py
(argparse surfaces at chem/finetune.py:83-115, bio/finetune.py:70-106).

Example:
  python -m pretrain_gnns_tpu.cli.finetune --dataset synthetic \
      --gnn_type gin --epochs 20 --input_model_file trunk.pth

Results are written as JSON (per-epoch AUC curves + best-val-epoch test
AUC) to ``<run_dir>/result.json`` — the aggregation CLI consumes these —
and optionally as TensorBoard scalars named like the reference
(``data/{train,val,test} auc``, chem/finetune.py:222-224).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--domain", default="chem", choices=["chem", "bio"])
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data_root", default="dataset")
    p.add_argument("--batch_size", type=int, default=0,
                   help="0 = protocol default: 32 (chem/finetune.py:87), "
                        "8 under --cv_fold (finetune_mutag_ptc.py:87); "
                        "finetune_tune.sh's second block sweeps 8 and 64")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr_scale", type=float, default=1.0)
    p.add_argument("--decay", type=float, default=0.0)
    p.add_argument("--num_layer", type=int, default=5)
    p.add_argument("--emb_dim", type=int, default=300)
    p.add_argument("--dropout_ratio", type=float, default=0.5)
    p.add_argument("--graph_pooling", default="mean")
    p.add_argument("--JK", dest="jk", default="last")
    p.add_argument("--gnn_type", default="gin")
    p.add_argument("--input_model_file", default="")
    p.add_argument("--seed", type=int, default=42,
                   help="split seed (bio random split)")
    p.add_argument("--runseed", type=int, default=0,
                   help="init/minibatch seed")
    p.add_argument("--packing", default="auto",
                   choices=["auto", "standard", "blocked"],
                   help="batch layout: auto = block-diagonal (Pallas) on TPU")
    p.add_argument("--halo_devices", type=int, default=1,
                   help="edge-partitioned halo execution: node-shard each "
                        "batch over N devices (giant-graph path)")
    p.add_argument("--split", default="scaffold",
                   choices=["scaffold", "random", "random_scaffold",
                            "species"])
    p.add_argument("--eval_train", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=0,
                   help="accepted for reference-CLI parity (unused)")
    p.add_argument("--run_dir", default="runs/finetune")
    p.add_argument("--filename", default="", help="result tag")
    p.add_argument("--tensorboard", type=int, default=0)
    p.add_argument("--n_synthetic", type=int, default=800)
    p.add_argument("--cv_fold", type=int, default=-1,
                   help=">=0: 10-fold CV protocol (mutag/ptc_mr)")
    return p


def split_dataset(args, graphs, scaffolds):
    import numpy as np

    from pretrain_gnns_tpu.data import splitters

    if args.split == "scaffold":
        tr, va, te = splitters.scaffold_split(scaffolds)
    elif args.split == "random":
        tr, va, te = splitters.random_split(len(graphs), seed=args.seed)
    elif args.split == "random_scaffold":
        tr, va, te = splitters.random_scaffold_split(
            scaffolds, seed=args.seed
        )
    elif args.split == "species":
        species = np.array(
            [g.extras["species_id"][0][0] for g in graphs]
        )
        tv, te = splitters.species_split(species)
        # bio protocol (bio/finetune.py:116-119): val = 15% of trainval;
        # human test split 50/50 into easy ("broad", overlaps the
        # supervised-pretrain set) and hard
        tr_idx, va_idx, _ = splitters.random_split(
            len(tv), frac_train=0.85, frac_valid=0.15, frac_test=0.0,
            seed=args.seed,
        )
        easy_idx, hard_idx, _ = splitters.random_split(
            len(te), frac_train=0.5, frac_valid=0.5, frac_test=0.0,
            seed=args.seed,
        )
        pick = lambda idx: [graphs[i] for i in idx]
        return (
            pick([tv[i] for i in tr_idx]),
            pick([tv[i] for i in va_idx]),
            pick([te[i] for i in easy_idx]),
            {"test_hard": pick([te[i] for i in hard_idx])},
        )
    pick = lambda idx: [graphs[i] for i in idx]
    return pick(tr), pick(va), pick(te), None


def main(argv=None):
    args = build_parser().parse_args(argv)

    # multi-host bootstrap (no-op unless PGT_* env is set)
    from pretrain_gnns_tpu.parallel import multihost

    multihost.initialize()

    from pretrain_gnns_tpu.data import datasets
    from pretrain_gnns_tpu.train import finetune
    from pretrain_gnns_tpu.train.checkpoints import load_trunk_any

    graphs, scaffolds, meta = datasets.load_dataset(
        args.dataset, args.data_root, args.n_synthetic, seed=args.seed
    )
    num_tasks = meta.get("num_tasks") or finetune.NUM_TASKS.get(
        args.dataset, 1
    )
    if args.domain == "bio" and args.split == "scaffold":
        args.split = "species"
    train_g, val_g, test_g, extra_test = split_dataset(
        args, graphs, scaffolds
    )

    cfg = finetune.FinetuneConfig(
        domain=args.domain, num_tasks=num_tasks, num_layer=args.num_layer,
        emb_dim=args.emb_dim, dropout_ratio=args.dropout_ratio,
        graph_pooling=args.graph_pooling, jk=args.jk,
        gnn_type=args.gnn_type, lr=args.lr, lr_scale=args.lr_scale,
        decay=args.decay,
        batch_size=args.batch_size or (8 if args.cv_fold >= 0 else 32),
        epochs=args.epochs,
        seed=args.seed, runseed=args.runseed, packing=args.packing,
        halo_devices=args.halo_devices, eval_train=bool(args.eval_train),
    )
    trunk = load_trunk_any(args.input_model_file) if args.input_model_file \
        else None
    if args.cv_fold >= 0:
        res = finetune.run_finetune_cv(
            cfg, graphs, fold_idx=args.cv_fold, pretrained_trunk=trunk,
        )
        out = {"dataset": args.dataset, "fold": args.cv_fold,
               "val_acc": res["val_auc"], "acc": res["test_auc"],
               "best_epoch": res["best_epoch"]}
        # full result.json so cli.aggregate can fold-aggregate the
        # mutag/ptc block like the seeds of the main block
        run_dir = os.path.join(
            args.run_dir,
            f"{args.dataset}_drop{args.dropout_ratio:g}"
            f"_bsize{cfg.batch_size}_fold{args.cv_fold}"
            + (f"_{args.filename}" if args.filename else ""),
        )
        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(run_dir, "result.json"), "w") as f:
            json.dump({
                "dataset": (f"{args.dataset}_drop{args.dropout_ratio:g}"
                            f"_bsize{cfg.batch_size}"),
                "fold": args.cv_fold,
                "config": {k: v for k, v in vars(args).items()},
                "val": res["curves"]["val"],
                "test": res["curves"]["test"],
                "metric": "accuracy",
                "best_epoch": res["best_epoch"],
            }, f)
        print(json.dumps(out))
        return out

    writer = None
    run_dir = os.path.join(
        args.run_dir, f"{args.dataset}_seed{args.runseed}"
        + (f"_{args.filename}" if args.filename else "")
    )
    os.makedirs(run_dir, exist_ok=True)
    if args.tensorboard:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(run_dir)

    res = finetune.run_finetune(cfg, train_g, val_g, test_g,
                                pretrained_trunk=trunk,
                                extra_test=extra_test)
    if writer is not None:
        for i, (v, t) in enumerate(
            zip(res["curves"]["val"], res["curves"]["test"]), 1
        ):
            writer.add_scalar("data/val auc", v, i)
            writer.add_scalar("data/test auc", t, i)
        # reference logs train AUC only under --eval_train
        # (chem/finetune.py:205-210, 222)
        for i, tr in enumerate(res["curves"].get("train", []), 1):
            writer.add_scalar("data/train auc", tr, i)
        writer.close()

    out = {
        "dataset": args.dataset,
        "config": {k: v for k, v in vars(args).items()},
        "val": res["curves"]["val"],
        "test": res["curves"]["test"],
        "train_loss": res["curves"]["train_loss"],
        "best_epoch": res["best_epoch"],
        "val_auc": res["val_auc"],
        "test_auc": res["test_auc"],
    }
    for name in (extra_test or {}):
        out[name] = res["curves"][name]
        out[f"{name}_auc"] = res["curves"][name][res["best_epoch"] - 1]
    if "train" in res["curves"]:
        out["train"] = res["curves"]["train"]
    for name, arr in (res.get("task_auc") or {}).items():
        # bio per-task AUCs at the selected epoch (NaN -> null in JSON;
        # feeds cli.aggregate's pairwise scatter, result_analysis.py:84+)
        out[f"{name}_task_auc"] = [
            None if not np.isfinite(v) else float(v) for v in arr
        ]
    with open(os.path.join(run_dir, "result.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps({"val_auc": res["val_auc"],
                      "test_auc": res["test_auc"],
                      "best_epoch": res["best_epoch"],
                      "run_dir": run_dir}))
    return out


if __name__ == "__main__":
    main()
