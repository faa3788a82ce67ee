"""Result aggregation — the reference's chem/parse_result.py and
bio/result_analysis.py over our JSON results.

Model selection rule (chem/parse_result.py:7-20): for each run, report the
test AUC at the epoch with the highest validation AUC; aggregate mean ± std
over seeds per (dataset, config).

  python -m pretrain_gnns_tpu.cli.aggregate --result_dir runs/sweep
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from collections import defaultdict

import numpy as np


def collect(result_dir: str):
    rows = []
    for path in glob.glob(
        os.path.join(result_dir, "**", "result.json"), recursive=True
    ):
        with open(path) as f:
            r = json.load(f)
        val = np.asarray(r["val"])
        test = np.asarray(r["test"])
        best = int(np.argmax(val))  # argmax-val-epoch selection
        rows.append({
            "dataset": r["dataset"],
            "config": r["config"].get("filename") or "default",
            "seed": r["config"].get("runseed", 0),
            "best_epoch": best + 1,
            "val_auc": float(val[best]),
            "test_auc": float(test[best]),
        })
    return rows


def summarize(rows):
    by = defaultdict(list)
    for r in rows:
        by[(r["dataset"], r["config"])].append(r["test_auc"])
    table = []
    for (dataset, config), aucs in sorted(by.items()):
        table.append({
            "dataset": dataset,
            "config": config,
            "n_seeds": len(aucs),
            "mean_test_auc": float(np.mean(aucs)),
            "std_test_auc": float(np.std(aucs)),
        })
    return table


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--result_dir", default="runs/sweep")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)
    rows = collect(args.result_dir)
    table = summarize(rows)
    for t in table:
        print(
            f"{t['dataset']:>12} {t['config']:>24} "
            f"{t['mean_test_auc']:.4f} ± {t['std_test_auc']:.4f} "
            f"({t['n_seeds']} seeds)"
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"runs": rows, "summary": table}, f)
    return table


if __name__ == "__main__":
    main()
