"""End-to-end fine-tune slice (SURVEY.md §7 build step ii): synthetic
molecule task, scaffold split, masked BCE, Adam — AUC must clearly beat
chance, and checkpoint-initialized runs must work."""

import numpy as np
import pytest

from pretrain_gnns_tpu.compat import import_params
from pretrain_gnns_tpu.data import splitters
from pretrain_gnns_tpu.data.packing import PackedLoader
from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.objectives import losses
from pretrain_gnns_tpu.train import finetune


def _split(graphs, scaffolds):
    tr, va, te = splitters.scaffold_split(scaffolds)
    pick = lambda idx: [graphs[i] for i in idx]
    return pick(tr), pick(va), pick(te)


def test_finetune_learns_synthetic_task():
    graphs, scaffolds = molecule_dataset(400, num_tasks=2, seed=1,
                                         missing_frac=0.1)
    tr, va, te = _split(graphs, scaffolds)
    cfg = finetune.FinetuneConfig(
        num_tasks=2, num_layer=2, emb_dim=32, dropout_ratio=0.1,
        epochs=6, batch_size=64, gnn_type="gin",
    )
    res = finetune.run_finetune(cfg, tr, va, te, log=None)
    assert res["test_auc"] > 0.7, res["curves"]
    assert 1 <= res["best_epoch"] <= 6
    assert res["curves"]["train_loss"][-1] < res["curves"]["train_loss"][0]


def test_finetune_from_pretrained_trunk():
    graphs, scaffolds = molecule_dataset(80, num_tasks=1, seed=2)
    tr, va, te = _split(graphs, scaffolds)
    trunk = import_params.load_trunk(
        "/root/reference/chem/model_architecture/gcn_contextpred.pth"
    )
    cfg = finetune.FinetuneConfig(
        num_tasks=1, num_layer=5, emb_dim=300, epochs=1, batch_size=32,
        gnn_type="gcn", lr_scale=0.5,
    )
    res = finetune.run_finetune(cfg, tr, va, te, pretrained_trunk=trunk,
                                log=None)
    # trunk params actually came from the checkpoint
    p = res["state"].params["gnn"]["x_embedding1"]
    np.testing.assert_allclose(
        np.asarray(p)[:3, :3], trunk["params"]["x_embedding1"][:3, :3],
        atol=0.05,  # one epoch of updates moves them slightly
    )
    assert np.isfinite(res["test_auc"])


def test_masked_task_bce_ignores_missing_and_padding():
    import jax.numpy as jnp

    logits = jnp.array([[2.0, -2.0], [0.5, 0.5], [9.0, 9.0]])
    y = jnp.array([[1.0, -1.0], [0.0, 1.0], [1.0, 1.0]])
    gm = jnp.array([True, True, False])
    loss = losses.masked_task_bce(logits, y, gm)
    # manual: entries (0,0): bce(2,1); (0,1): bce(-2,0); (1,1): bce(.5,1)
    import math

    def bce(z, t):
        return max(z, 0) - z * t + math.log1p(math.exp(-abs(z)))

    ref = (bce(2, 1) + bce(-2, 0) + bce(0.5, 1)) / 3
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)


def test_packed_loader_covers_dataset():
    graphs, _ = molecule_dataset(101, seed=3)
    loader = PackedLoader(graphs, 16, shuffle=True, seed=0)
    seen = 0
    for batch in loader:
        seen += int(np.asarray(batch.graph_mask).sum())
    assert seen == 101
    # second epoch uses a different order but same coverage
    seen2 = sum(int(np.asarray(b.graph_mask).sum()) for b in loader)
    assert seen2 == 101
