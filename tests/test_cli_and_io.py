"""CLI entry points, dataset npz round-trip, torch-legacy writer, and
orbax checkpoint/resume."""

import json
import os

import numpy as np
import pytest

from pretrain_gnns_tpu.compat.torch_reader import load_torch_checkpoint
from pretrain_gnns_tpu.compat.torch_writer import save_state_dict
from pretrain_gnns_tpu.data import datasets
from pretrain_gnns_tpu.data.synthetic import bio_dataset, molecule_dataset


def test_npz_dataset_roundtrip(tmp_path):
    graphs, scaffolds = molecule_dataset(20, num_tasks=3, seed=1)
    d = str(tmp_path / "processed_tpu")
    datasets.save_graphs(graphs, d, scaffolds=scaffolds,
                         meta={"num_tasks": 3})
    back, scafs2, meta = datasets.load_graphs(d)
    assert meta["num_tasks"] == 3 and scafs2 == scaffolds
    for a, b in zip(graphs, back):
        np.testing.assert_array_equal(a.node_feat, b.node_feat)
        np.testing.assert_array_equal(a.edge_index, b.edge_index)
        np.testing.assert_array_equal(a.edge_feat, b.edge_feat)
        np.testing.assert_array_equal(a.y, b.y)


def test_npz_dataset_roundtrip_bio_extras(tmp_path):
    graphs = bio_dataset(8, seed=2, mean_nodes=15)
    d = str(tmp_path / "processed_tpu")
    datasets.save_graphs(graphs, d, meta={"num_tasks": 40})
    back, _, _ = datasets.load_graphs(d)
    for a, b in zip(graphs, back):
        for k in a.extras:
            np.testing.assert_array_equal(
                np.atleast_1d(a.extras[k][0]),
                np.atleast_1d(b.extras[k][0]), err_msg=k,
            )
            assert a.extras[k][1] == b.extras[k][1]


def test_legacy_writer_roundtrip(tmp_path):
    sd = {
        "w": np.random.default_rng(0).normal(size=(4, 6)).astype(np.float32),
        "n": np.array(3, np.int64),
    }
    path = str(tmp_path / "t.pth")
    save_state_dict(sd, path)
    back = load_torch_checkpoint(path)
    for k in sd:
        assert back[k].shape == sd[k].shape
        np.testing.assert_array_equal(back[k], sd[k])


def test_pretrain_then_finetune_cli(tmp_path):
    from pretrain_gnns_tpu.cli import finetune as ft_cli
    from pretrain_gnns_tpu.cli import pretrain as pt_cli

    trunk = str(tmp_path / "trunk")
    pt_cli.main([
        "--objective", "masking", "--dataset", "synthetic",
        "--epochs", "1", "--num_layer", "2", "--emb_dim", "16",
        "--batch_size", "32", "--n_synthetic", "96",
        "--output_model_file", trunk,
    ])
    assert os.path.exists(trunk + ".pth")
    out = ft_cli.main([
        "--dataset", "synthetic", "--epochs", "2", "--num_layer", "2",
        "--emb_dim", "16", "--batch_size", "32", "--n_synthetic", "96",
        "--input_model_file", trunk + ".pth",
        "--run_dir", str(tmp_path / "runs"),
        "--filename", "masking",
    ])
    assert np.isfinite(out["test_auc"])
    # and the trunk is readable by torch itself (reference interop)
    import torch

    sd = torch.load(trunk + ".pth", map_location="cpu", weights_only=True)
    assert "x_embedding1.weight" in sd


def test_supervised_pretrain_cli(tmp_path):
    from pretrain_gnns_tpu.cli import pretrain as pt_cli

    trunk = str(tmp_path / "sup")
    hist = pt_cli.main([
        "--objective", "supervised", "--dataset", "synthetic",
        "--epochs", "1", "--num_layer", "2", "--emb_dim", "16",
        "--batch_size", "32", "--n_synthetic", "96",
        "--output_model_file", trunk,
    ])
    assert os.path.exists(trunk + ".pth")
    assert np.isfinite(hist[-1]["loss"])


def test_sweep_and_aggregate_cli(tmp_path):
    from pretrain_gnns_tpu.cli import aggregate as ag_cli
    from pretrain_gnns_tpu.cli import sweep as sw_cli

    rd = str(tmp_path / "sweep")
    sw_cli.main([
        "--datasets", "synthetic", "--seeds", "0", "1",
        "--configs", "nopretrain", "--epochs", "2",
        "--result_dir", rd, "--n_synthetic", "96",
        "--dropout_ratio", "0.1",
    ])
    table = ag_cli.main(["--result_dir", rd])
    assert len(table) == 1
    assert table[0]["n_seeds"] == 2
    assert 0.0 <= table[0]["mean_test_auc"] <= 1.0


def test_orbax_checkpoint_resume(tmp_path):
    import jax

    from pretrain_gnns_tpu.data.packing import PackedLoader
    from pretrain_gnns_tpu.train import finetune, optim
    from pretrain_gnns_tpu.train.checkpoints import CheckpointManager
    from pretrain_gnns_tpu.train.state import TrainState

    graphs, _ = molecule_dataset(32, num_tasks=2, seed=0)
    batch = next(iter(PackedLoader(graphs, 16, shuffle=False)))
    cfg = finetune.FinetuneConfig(num_tasks=2, num_layer=2, emb_dim=16)
    model = finetune.build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    tx = optim.adam(1e-3)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    step = finetune.make_train_step(model, tx, "chem")
    state, _ = step(state, batch)
    state, _ = step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(int(state.step), state)
    assert mgr.latest_step() == 2
    template = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    restored = mgr.restore(template)
    mgr.close()
    assert int(restored.step) == 2
    np.testing.assert_allclose(
        np.asarray(restored.params["graph_pred_linear"]["bias"]),
        np.asarray(state.params["graph_pred_linear"]["bias"]),
    )
    # restored state continues training
    restored, loss = step(restored, batch)
    assert np.isfinite(float(loss))


def test_aggregate_extra_splits_and_negative_transfer(tmp_path):
    """bio test_easy/test_hard columns + negative-transfer counts
    (bio/result_analysis.py:39-81, 84-139)."""
    import json
    from pretrain_gnns_tpu.cli import aggregate

    def write(config, seed, val, test, hard=None):
        d = tmp_path / f"{config}_{seed}"
        d.mkdir()
        r = {"dataset": "bio", "config": {"filename": config,
                                          "runseed": seed},
             "val": val, "test": test}
        if hard is not None:
            r["test_hard"] = hard
        (d / "result.json").write_text(json.dumps(r))

    # best val epoch = 2 (0-indexed 1)
    write("nopretrain", 0, [0.5, 0.7, 0.6], [0.60, 0.62, 0.5], [0.5, 0.55, 0.4])
    write("nopretrain", 1, [0.5, 0.7, 0.6], [0.60, 0.64, 0.5], [0.5, 0.56, 0.4])
    write("masking", 0, [0.5, 0.8, 0.6], [0.60, 0.70, 0.5], [0.5, 0.60, 0.4])
    write("masking", 1, [0.5, 0.8, 0.6], [0.60, 0.61, 0.5], [0.5, 0.50, 0.4])

    rows = aggregate.collect(str(tmp_path))
    assert all(r["best_epoch"] == 2 for r in rows)
    table = aggregate.summarize(rows)
    masking = next(t for t in table if t["config"] == "masking")
    assert abs(masking["mean_test_auc"] - 0.655) < 1e-9
    assert abs(masking["mean_test_hard_auc"] - 0.55) < 1e-9

    nt = aggregate.negative_transfer(rows)
    assert len(nt) == 1
    t = nt[0]
    # seed 0: +0.08 gain; seed 1: -0.03 -> one negative-transfer seed
    assert t["n_pairs"] == 2
    assert t["negative_transfer_seeds"] == 1
    assert abs(t["mean_gain"] - (0.08 - 0.03) / 2) < 1e-9


def test_aggregate_from_tensorboard(tmp_path):
    """The TB-event reader consumes the reference's exact on-disk layout
    (runs/finetune_cls_runseed{seed}/{dataset}/{config}/events*, tags
    written as 'data/val auc' etc. by chem/finetune.py:222-224) and applies
    the argmax-val-epoch rule of chem/parse_result.py:7-20."""
    from tensorboardX import SummaryWriter

    from pretrain_gnns_tpu.cli import aggregate

    val = [0.5, 0.8, 0.6]
    test = [0.4, 0.7, 0.9]
    for seed in (0, 1):
        d = tmp_path / f"finetune_cls_runseed{seed}" / "tox21" / "gin_masking"
        w = SummaryWriter(str(d))
        for i, (v, t) in enumerate(zip(val, test), 1):
            w.add_scalar("data/val auc", v, i)
            w.add_scalar("data/test auc", t, i)
        w.close()
    rows = aggregate.collect_tensorboard(str(tmp_path))
    assert len(rows) == 2
    r = rows[0]
    assert r["dataset"] == "tox21" and r["config"] == "gin_masking"
    assert r["best_epoch"] == 2  # argmax val
    assert abs(r["test_auc"] - 0.7) < 1e-6  # test AT best-val epoch
    assert {row["seed"] for row in rows} == {0, 1}
    table = aggregate.summarize(rows)
    assert abs(table[0]["mean_test_auc"] - 0.7) < 1e-6
