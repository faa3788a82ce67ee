"""CV fine-tune variant (mutag/ptc protocol) and telemetry meters."""

import numpy as np

from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.train import finetune, telemetry


def test_run_finetune_cv():
    graphs, _ = molecule_dataset(60, num_tasks=1, seed=6)
    cfg = finetune.FinetuneConfig(
        num_tasks=1, num_layer=2, emb_dim=16, batch_size=8, epochs=2,
        dropout_ratio=0.0,
    )
    res = finetune.run_finetune_cv(cfg, graphs, fold_idx=0, log=None)
    assert 0.0 <= res["test_auc"] <= 1.0  # accuracy metric
    assert res["fold_idx"] == 0
    res2 = finetune.run_finetune_cv(cfg, graphs, fold_idx=1, log=None)
    assert res2["fold_idx"] == 1


def test_throughput_meter():
    from pretrain_gnns_tpu.core import graphs as G
    from pretrain_gnns_tpu.data.packing import PackedLoader

    graphs, _ = molecule_dataset(32, seed=7)
    meter = telemetry.ThroughputMeter(n_chips=2)
    for batch in PackedLoader(graphs, 16, shuffle=False):
        meter.tick(**telemetry.ThroughputMeter.counts_of(batch))
    rep = meter.report()
    assert rep["steps"] == 2
    assert rep["edges_per_sec"] > 0
    assert abs(
        rep["edges_per_sec_per_chip"] - rep["edges_per_sec"] / 2
    ) < 1.0


def test_scaling_efficiency():
    assert telemetry.scaling_efficiency(100, 1, 800, 8) == 1.0
    assert abs(telemetry.scaling_efficiency(100, 1, 640, 8) - 0.8) < 1e-9
