"""Sweep driver — the reference's finetune_tune.sh reproduction protocol
(chem/finetune_tune.sh:1-35, bio/finetune_tune.sh): seeds x datasets x
pretrain configs, each running the fine-tune CLI and dropping a
``result.json``; aggregate with ``python -m pretrain_gnns_tpu.cli.aggregate``.

Example (synthetic smoke of the full protocol shape):
  python -m pretrain_gnns_tpu.cli.sweep --datasets synthetic \
      --seeds 0 1 2 --configs nopretrain masking --epochs 5
"""

from __future__ import annotations

import argparse
import json
import os

CHEM_DATASETS = ["bace", "bbbp", "clintox", "hiv", "muv", "sider", "tox21",
                 "toxcast"]
# the 10 GIN configs of finetune_tune.sh:5-8
GIN_CONFIGS = ["nopretrain", "infomax", "edgepred", "masking",
               "contextpred", "supervised", "supervised_infomax",
               "supervised_edgepred", "supervised_masking",
               "supervised_contextpred"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--domain", default="chem", choices=["chem", "bio"])
    p.add_argument("--datasets", nargs="+", default=["synthetic"])
    p.add_argument("--seeds", type=int, nargs="+",
                   default=list(range(10)))
    p.add_argument("--configs", nargs="+", default=["nopretrain"])
    p.add_argument("--gnn_type", default="gin")
    p.add_argument("--model_dir", default="models",
                   help="directory holding <config>.pth trunks")
    p.add_argument("--result_dir", default="runs/sweep")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--dropout_ratio", type=float, default=0.5)
    p.add_argument("--split", default=None)
    p.add_argument("--n_synthetic", type=int, default=800)
    args = p.parse_args(argv)

    from pretrain_gnns_tpu.cli import finetune as ft_cli

    split = args.split or ("species" if args.domain == "bio" else "scaffold")
    results = []
    for dataset in args.datasets:
        for config in args.configs:
            model_file = ""
            if config != "nopretrain":
                cand = os.path.join(args.model_dir, f"{config}.pth")
                if os.path.exists(cand):
                    model_file = cand
                else:
                    print(f"[sweep] missing trunk {cand}; running "
                          f"{config} from scratch")
            for seed in args.seeds:
                run_dir = os.path.join(
                    args.result_dir, dataset, config
                )
                argv_ft = [
                    "--domain", args.domain,
                    "--dataset", dataset,
                    "--runseed", str(seed),
                    "--split", split,
                    "--gnn_type", args.gnn_type,
                    "--epochs", str(args.epochs),
                    "--batch_size", str(args.batch_size),
                    "--dropout_ratio", str(args.dropout_ratio),
                    "--run_dir", run_dir,
                    "--filename", config,
                    "--n_synthetic", str(args.n_synthetic),
                ]
                if model_file:
                    argv_ft += ["--input_model_file", model_file]
                out = ft_cli.main(argv_ft)
                results.append(
                    {"dataset": dataset, "config": config, "seed": seed,
                     "test_auc": out["test_auc"],
                     "val_auc": out["val_auc"]}
                )
    os.makedirs(args.result_dir, exist_ok=True)
    with open(os.path.join(args.result_dir, "sweep_summary.json"),
              "w") as f:
        json.dump(results, f)
    print(f"[sweep] {len(results)} runs -> {args.result_dir}")


if __name__ == "__main__":
    main()
