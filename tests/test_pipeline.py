"""Production input/train pipeline: scan trainer, prefetch, flat fast path
and DP-supervised must be drop-in equivalent to the per-step paths."""

import json

import numpy as np
import pytest

import jax

from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.train import pretrain


def _run(scan_steps):
    graphs, _ = molecule_dataset(64, num_tasks=2, seed=1, mean_atoms=12)
    cfg = pretrain.PretrainConfig(
        objective="masking", num_layer=2, emb_dim=16, batch_size=16,
        epochs=2, mask_edge=True, packing="standard",
        scan_steps=scan_steps,
    )
    return pretrain.run_pretrain(cfg, graphs, log=None)


def test_scan_trainer_matches_per_step():
    """scan_steps=K runs the SAME sequence of updates as the per-step
    trainer: identical final parameters and per-epoch losses."""
    res1 = _run(scan_steps=1)
    res2 = _run(scan_steps=2)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(res1["state"].params),
        jax.tree_util.tree_leaves_with_path(res2["state"].params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5, err_msg=str(pa))
    for r1, r2 in zip(res1["history"], res2["history"]):
        np.testing.assert_allclose(r1["loss"], r2["loss"], rtol=1e-5)


def test_supervised_cli_dp(tmp_path):
    """--dp_devices on the supervised objective (VERDICT r2 item 3)."""
    from pretrain_gnns_tpu.cli import pretrain as cli

    hist = cli.main([
        "--objective", "supervised", "--dataset", "synthetic",
        "--epochs", "1", "--num_layer", "2", "--emb_dim", "16",
        "--batch_size", "8", "--n_synthetic", "48", "--dp_devices", "2",
        "--output_model_file", str(tmp_path / "trunk"),
    ])
    assert np.isfinite(hist[-1]["loss"])
    assert (tmp_path / "trunk.pth").exists()


def test_finetune_eval_train_curve():
    """cfg.eval_train adds the per-epoch train-AUC curve
    (chem/finetune.py:205-210)."""
    from pretrain_gnns_tpu.train import finetune as ft

    graphs, _ = molecule_dataset(40, num_tasks=2, seed=2, mean_atoms=12)
    cfg = ft.FinetuneConfig(num_tasks=2, num_layer=2, emb_dim=16,
                            batch_size=16, epochs=2, eval_train=True,
                            packing="standard")
    res = ft.run_finetune(cfg, graphs[:24], graphs[24:32], graphs[32:],
                          log=None)
    assert len(res["curves"]["train"]) == 2
    assert all(np.isfinite(v) for v in res["curves"]["train"])


def test_bio_supervised_pretrain_set_matches_reference_logic():
    """Pretrain set = species trainval + easy half of human test, exactly
    the reference construction (bio/pretrain_supervised.py:94-101) — and
    the easy half must coincide with fine-tuning's test_easy."""
    from pretrain_gnns_tpu.cli.pretrain import (
        bio_supervised_pretrain_indices,
    )
    from pretrain_gnns_tpu.data import splitters

    rng = np.random.default_rng(0)
    species_pool = [3702, 6239, 511145, 7227, 9606, 10090, 4932, 7955]
    species = rng.choice(species_pool, size=200)

    got = bio_supervised_pretrain_indices(species, "species", seed=42)

    # oracle: independent re-derivation
    tv, te = splitters.species_split(species)
    easy, hard, _ = splitters.random_split(
        len(te), frac_train=0.5, frac_valid=0.5, frac_test=0.0, seed=42
    )
    want = list(tv) + [te[i] for i in easy]
    assert got == want
    # no human-hard graph leaks into the pretrain set
    hard_set = {te[i] for i in hard}
    assert not (set(got) & hard_set)
    # all non-human graphs are included
    assert set(tv) <= set(got)

    got_r = bio_supervised_pretrain_indices(species, "random", seed=1)
    tr, va, teq = splitters.random_split(len(species), seed=1)
    assert got_r == list(tr) + list(va)
    assert len(got_r) == len(species) - len(teq)


def test_supervised_cli_dropout_default():
    """chem supervised defaults to dropout 0.2
    (chem/pretrain_supervised.py:99); other objectives default to 0."""
    from pretrain_gnns_tpu.cli import pretrain as cli

    args = cli.build_parser().parse_args(["--objective", "supervised"])
    assert cli.resolve_dropout(args) == 0.2
    args = cli.build_parser().parse_args(["--objective", "masking"])
    assert cli.resolve_dropout(args) == 0.0
    args = cli.build_parser().parse_args(
        ["--objective", "supervised", "--dropout_ratio", "0.5"]
    )
    assert cli.resolve_dropout(args) == 0.5


def test_bio_supervised_pretrain_set_golden():
    """Non-circular check of the pretrain-set construction (the oracle
    above re-derives with the same splitters, so it can't catch a
    splitter regression): 12 graphs, 6 human — the non-human indices
    {1,3,5,7,8,10} must ALL be included, followed by a frozen golden
    draw of exactly half the human graphs, none from the held-out hard
    half."""
    from pretrain_gnns_tpu.cli.pretrain import (
        bio_supervised_pretrain_indices,
    )

    species = np.array([9606, 3702, 9606, 6239, 9606, 10090, 9606, 4932,
                        7955, 9606, 511145, 9606])
    got = bio_supervised_pretrain_indices(species, "species", seed=7)
    assert got == [1, 3, 5, 7, 8, 10, 9, 0, 11]  # frozen golden
    human = [i for i, s in enumerate(species) if s == 9606]
    non_human = [i for i, s in enumerate(species) if s != 9606]
    assert got[: len(non_human)] == non_human
    easy = got[len(non_human):]
    assert len(easy) == len(human) // 2
    assert set(easy) <= set(human)


def test_epoch_mode_checkpoint_resume(tmp_path):
    """Interrupted epoch-resident pretraining resumes from the orbax
    checkpoint: a fresh run over the same dir continues at the next
    epoch and ends with the same step count as an uninterrupted run."""
    from pretrain_gnns_tpu.data.synthetic import molecule_dataset
    from pretrain_gnns_tpu.train import pretrain

    graphs, _ = molecule_dataset(64, num_tasks=1, seed=0, mean_atoms=12)
    cfg = pretrain.PretrainConfig(
        objective="masking", num_layer=2, emb_dim=16, batch_size=16,
        mask_edge=False, seed=0, scan_steps=4, device_dataset="on",
        packing="standard",
    )
    ckpt = str(tmp_path / "ck")
    r1 = pretrain.run_pretrain(cfg, graphs, log=None, epochs=2,
                               checkpoint_dir=ckpt, checkpoint_every=1)
    steps_per_epoch = 64 // 16
    assert int(r1["state"].step) == 2 * steps_per_epoch

    logs = []
    r2 = pretrain.run_pretrain(cfg, graphs, log=logs.append, epochs=4,
                               checkpoint_dir=ckpt, checkpoint_every=1)
    assert any("resumed" in s for s in logs)
    assert [h["epoch"] for h in r2["history"]] == [3, 4]
    assert int(r2["state"].step) == 4 * steps_per_epoch


def test_supervised_objective_rides_production_pipeline():
    """Chem supervised pretraining through run_pretrain: device-resident
    loader (labels in the resident y table), loss identical to the
    classic finetune train-step math at the same parameters, and the
    SSL-trunk grafting chain (chem/pretrain_supervised.py:132-133)."""
    import jax

    from pretrain_gnns_tpu.data.synthetic import molecule_dataset
    from pretrain_gnns_tpu.objectives import losses as L
    from pretrain_gnns_tpu.train import finetune as ft
    from pretrain_gnns_tpu.train import pretrain

    graphs, _ = molecule_dataset(64, num_tasks=4, seed=0, mean_atoms=12)
    cfg = pretrain.PretrainConfig(
        objective="supervised", num_layer=2, emb_dim=16, batch_size=16,
        seed=0, device_dataset="on", scan_steps=4, packing="standard",
        num_tasks=4, dropout_ratio=0.0,
    )
    res = pretrain.run_pretrain(cfg, graphs, log=None, epochs=2)
    assert type(res["loader"]).__name__ == "DeviceBatchLoader"
    h = res["history"]
    assert all(np.isfinite(r["loss"]) for r in h)
    assert h[-1]["loss"] < h[0]["loss"]

    # loss parity vs the classic GraphPred + masked BCE at equal params
    loader = res["loader"]
    b0 = loader.prepare(next(iter(loader)))
    fcfg = ft.FinetuneConfig(num_tasks=4, num_layer=2, emb_dim=16,
                             dropout_ratio=0.0, batch_size=16,
                             packing="standard")
    model = ft.build_model(fcfg)
    variables = model.init(jax.random.PRNGKey(0), b0, train=False)
    obj = pretrain.build_objective(cfg)
    ovars = {"params": {"pred": variables["params"]},
             "batch_stats": {"pred": variables["batch_stats"]}}
    (l_obj, _), _ = obj.apply(
        ovars, b0, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(3),
              "mask": jax.random.PRNGKey(4)},
    )
    out, _ = model.apply(variables, b0, train=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(3)})
    l_ft = L.masked_task_bce(out, b0.y, b0.graph_mask)
    np.testing.assert_allclose(float(l_obj), float(l_ft), rtol=1e-6)

    # SSL-trunk grafting: the pretrained trunk lands at pred/gnn
    trunk = pretrain.trunk_variables(res["state"],
                                     pretrain.trunk_path(cfg))
    res2 = pretrain.run_pretrain(cfg, graphs, log=None, epochs=1,
                                 pretrained_trunk=trunk)
    t2 = pretrain.trunk_variables(res2["state"],
                                  pretrain.trunk_path(cfg))
    assert set(t2["params"].keys()) == set(trunk["params"].keys())
