"""Full two-block reproduction-protocol smoke (VERDICT r3 item 7):
finetune_tune.sh block 1 (seeds x datasets x configs) + block 2 (mutag/ptc
grid x CV folds), then aggregation with fold grouping, pairwise data, and
scatter plots."""

import json
import os

import numpy as np

from pretrain_gnns_tpu.cli import aggregate as agg_cli
from pretrain_gnns_tpu.cli import sweep as sweep_cli


def test_two_block_sweep_and_aggregate(tmp_path):
    result_dir = str(tmp_path / "sweep")
    sweep_cli.main([
        "--datasets", "synthetic", "--seeds", "0", "1",
        "--configs", "nopretrain", "masking",
        "--epochs", "2", "--n_synthetic", "64", "--split", "random",
        "--result_dir", result_dir,
        "--cv_block", "1", "--cv_datasets", "synthetic",
        "--cv_batch_sizes", "8", "--cv_dropouts", "0.0", "0.5",
        "--cv_folds", "0", "1",
    ])
    summary = json.load(
        open(os.path.join(result_dir, "sweep_summary.json"))
    )
    # block 1: 1 dataset x 2 configs x 2 seeds; block 2: 1 x 2 dropouts x
    # 2 configs x 2 folds
    assert len(summary) == 4 + 8
    cv_rows = [r for r in summary if "fold" in r]
    assert {r["dataset"] for r in cv_rows} == {
        "synthetic_drop0_bsize8", "synthetic_drop0.5_bsize8"
    }
    assert all(0.0 <= r["acc"] <= 1.0 for r in cv_rows)

    plots_dir = str(tmp_path / "figs")
    out_json = str(tmp_path / "agg.json")
    table = agg_cli.main([
        "--result_dir", result_dir, "--out", out_json,
        "--plots_dir", plots_dir,
    ])
    names = {(t["dataset"], t["config"]) for t in table}
    # both blocks aggregated: per-seed chem rows AND per-fold CV cells
    assert ("synthetic", "masking") in names
    assert ("synthetic_drop0_bsize8", "masking") in names
    cv_cell = next(t for t in table
                   if t["dataset"] == "synthetic_drop0.5_bsize8"
                   and t["config"] == "nopretrain")
    assert cv_cell["n_seeds"] == 2  # two folds aggregated as "seeds"

    agg = json.load(open(out_json))
    assert agg["pairwise"], "pairwise comparison data must be emitted"
    per_seed = [d for d in agg["pairwise"] if d["kind"] == "per_seed"]
    assert any(d["dataset"] == "synthetic" for d in per_seed)
    # scatter plots rendered (matplotlib is in the image)
    assert os.path.isdir(plots_dir) and len(os.listdir(plots_dir)) >= 1


def test_pairwise_per_task_points():
    """bio-style rows with per-task AUC arrays produce per-task scatter
    data + the reference's negative-transfer-task count
    (bio/result_analysis.py:139)."""
    rng = np.random.default_rng(0)
    rows = []
    base_tasks = rng.uniform(0.4, 0.9, size=10)
    for seed in range(3):
        rows.append({
            "dataset": "bio", "config": "nopretrain", "seed": seed,
            "test_auc": float(base_tasks.mean()),
            "test_hard_task_auc": (
                base_tasks + rng.normal(0, 0.01, 10)
            ).tolist(),
        })
        rows.append({
            "dataset": "bio", "config": "masking", "seed": seed,
            "test_auc": float(base_tasks.mean()) + 0.05,
            "test_hard_task_auc": (
                base_tasks + 0.05 + rng.normal(0, 0.01, 10)
            ).tolist(),
        })
    pairs = agg_cli.pairwise_points(rows, "nopretrain")
    per_task = [d for d in pairs if d["kind"].startswith("per_task")]
    assert len(per_task) == 1
    d = per_task[0]
    assert len(d["x"]) == 10 and len(d["y"]) == 10
    # masking gains +0.05 everywhere: no negative transfer
    assert d["negative_transfer_tasks"] == 0
    assert np.mean(np.asarray(d["y"]) - np.asarray(d["x"])) > 0.03
