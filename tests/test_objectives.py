"""All four SSL pretraining objectives run end-to-end on synthetic data:
losses finite and decreasing, metrics sane, trunk extractable in the
reference checkpoint layout."""

import numpy as np
import pytest

from pretrain_gnns_tpu.compat import import_params
from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.train import pretrain


def _cfg(objective, **kw):
    base = dict(
        objective=objective, num_layer=2, emb_dim=16, batch_size=32,
        epochs=3, gnn_type="gin",
    )
    base.update(kw)
    return pretrain.PretrainConfig(**base)


GRAPHS, _ = molecule_dataset(160, seed=5, mean_atoms=14)


@pytest.mark.parametrize("objective", ["masking", "edgepred", "infomax"])
def test_objective_trains(objective):
    cfg = _cfg(objective, epochs=6 if objective == "masking" else 3)
    res = pretrain.run_pretrain(cfg, GRAPHS, log=None)
    h = res["history"]
    assert all(np.isfinite(r["loss"]) for r in h)
    assert h[-1]["loss"] < h[0]["loss"]
    if objective == "masking":
        # synthetic atom types are uniform-random over 119 classes, so
        # above-chance accuracy at emb 16 is pure memorization noise; the
        # robust learning signal is a material CE drop plus sane metrics
        assert h[-1]["loss"] < h[0]["loss"] - 0.02
        assert all(0.0 <= r["acc_node"] <= 1.0 for r in h)
    else:
        assert h[-1]["acc"] > 0.5


@pytest.mark.parametrize("mode", ["cbow", "skipgram"])
def test_contextpred_trains(mode):
    # 4 epochs: the presampled variant cycle makes epoch-3 accuracy dip
    # to ~0.52 on this tiny dataset before recovering
    cfg = _cfg("contextpred", mode=mode, csize=2, num_layer=3, epochs=4)
    res = pretrain.run_pretrain(cfg, GRAPHS, log=None)
    h = res["history"]
    assert all(np.isfinite(r["loss"]) for r in h)
    assert h[-1]["loss"] < h[0]["loss"]
    assert h[-1]["acc"] > 0.52


def test_masking_no_mask_edge():
    cfg = _cfg("masking", mask_edge=False)
    res = pretrain.run_pretrain(cfg, GRAPHS, log=None, epochs=1)
    assert "acc_edge" not in res["history"][0]


def test_trunk_roundtrip_to_reference_layout():
    """Pretrained trunk -> reference state dict -> finetune import chain
    (the two-stage capability, SURVEY.md §3.4)."""
    cfg = _cfg("masking")
    res = pretrain.run_pretrain(cfg, GRAPHS, log=None, epochs=1)
    trunk = pretrain.trunk_variables(res["state"])
    sd = import_params.trunk_to_torch(trunk)
    assert "x_embedding1.weight" in sd and "gnns.0.mlp.0.weight" in sd
    assert sd["gnns.0.mlp.0.weight"].shape == (32, 16)
    re = import_params.trunk_from_torch(sd)
    np.testing.assert_allclose(
        np.asarray(trunk["params"]["x_embedding1"]),
        re["params"]["x_embedding1"],
    )
