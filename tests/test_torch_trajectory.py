"""Training-dynamics parity vs torch (VERDICT r3 item 5).

Forward parity against the released checkpoints is covered by
test_chem_parity; this test upgrades the claim to TRAINING dynamics: the
same GIN GNNGraphPred, same initial weights, same batch sequence, same
Adam hyperparameters, stepped N times by ``train.finetune.make_train_step``
and by a faithful torch reimplementation of the reference loop
(chem/finetune.py:27-46 + chem/model.py:15-55), must produce matching
loss curves and final parameters within f32 accumulation tolerance.
This is the strongest parity evidence obtainable without RDKit/datasets.
"""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from pretrain_gnns_tpu.core import graphs as G  # noqa: E402
from pretrain_gnns_tpu.data.synthetic import molecule_dataset  # noqa: E402
from pretrain_gnns_tpu.models.chem import SELF_LOOP_BOND_TYPE  # noqa: E402
from pretrain_gnns_tpu.train import finetune  # noqa: E402
from pretrain_gnns_tpu.train.state import TrainState  # noqa: E402

LAYERS = 2
EMB = 32
TASKS = 4
LR = 1e-3
STEPS = 6


class TorchGIN(torch.nn.Module):
    """Reference GIN + mean pool + linear head (chem/model.py:15-55,
    :285-320), as in bench.py's baseline."""

    def __init__(self):
        super().__init__()
        self.xe1 = torch.nn.Embedding(120, EMB)
        self.xe2 = torch.nn.Embedding(3, EMB)
        self.convs = torch.nn.ModuleList()
        self.bns = torch.nn.ModuleList()
        for _ in range(LAYERS):
            self.convs.append(torch.nn.ModuleDict(dict(
                e1=torch.nn.Embedding(6, EMB),
                e2=torch.nn.Embedding(3, EMB),
                mlp=torch.nn.Sequential(
                    torch.nn.Linear(EMB, 2 * EMB),
                    torch.nn.ReLU(),
                    torch.nn.Linear(2 * EMB, EMB),
                ),
            )))
            self.bns.append(torch.nn.BatchNorm1d(EMB))
        self.head = torch.nn.Linear(EMB, TASKS)

    def forward(self, x, snd, rcv, ea, seg, n_graphs):
        h = self.xe1(x[:, 0]) + self.xe2(x[:, 1])
        for li in range(LAYERS):
            c = self.convs[li]
            e = c["e1"](ea[:, 0]) + c["e2"](ea[:, 1])
            eself = c["e1"].weight[SELF_LOOP_BOND_TYPE] + c["e2"].weight[0]
            msg = h[snd] + e
            aggr = torch.zeros_like(h).index_add_(0, rcv, msg)
            aggr = aggr + h + eself
            h = self.bns[li](c["mlp"](aggr))
            if li != LAYERS - 1:
                h = torch.relu(h)
        pooled = torch.zeros(n_graphs, EMB).index_add_(0, seg, h)
        cnt = torch.zeros(n_graphs).index_add_(
            0, seg, torch.ones(seg.shape[0])
        )
        return self.head(pooled / cnt.clamp(min=1).unsqueeze(1))


def _copy_weights(tmodel: TorchGIN, variables) -> None:
    """JAX GNNGraphPred params -> torch module (kernels transposed)."""
    p = variables["params"]
    gnn = p["gnn"]

    def put(t, a):
        t.data = torch.from_numpy(np.array(a, np.float32))

    put(tmodel.xe1.weight, gnn["x_embedding1"])
    put(tmodel.xe2.weight, gnn["x_embedding2"])
    for li in range(LAYERS):
        c = gnn[f"gnns_{li}"]
        tc = tmodel.convs[li]
        put(tc["e1"].weight, c["edge_embedding1"])
        put(tc["e2"].weight, c["edge_embedding2"])
        put(tc["mlp"][0].weight, np.asarray(c["mlp_0"]["kernel"]).T)
        put(tc["mlp"][0].bias, c["mlp_0"]["bias"])
        put(tc["mlp"][2].weight, np.asarray(c["mlp_2"]["kernel"]).T)
        put(tc["mlp"][2].bias, c["mlp_2"]["bias"])
        bn = gnn[f"batch_norms_{li}"]
        put(tmodel.bns[li].weight, bn["scale"])
        put(tmodel.bns[li].bias, bn["bias"])
        st = variables["batch_stats"]["gnn"][f"batch_norms_{li}"]
        put(tmodel.bns[li].running_mean, st["mean"])
        put(tmodel.bns[li].running_var, st["var"])
    put(tmodel.head.weight,
        np.asarray(p["graph_pred_linear"]["kernel"]).T)
    put(tmodel.head.bias, p["graph_pred_linear"]["bias"])


def _collate(gs):
    xs, eis, eas, segs, ys = [], [], [], [], []
    off = 0
    for i, g in enumerate(gs):
        xs.append(torch.from_numpy(np.asarray(g.node_feat, np.int64)))
        eis.append(torch.from_numpy(
            np.asarray(g.edge_index, np.int64) + off
        ))
        eas.append(torch.from_numpy(np.asarray(g.edge_feat, np.int64)))
        segs.append(torch.full((g.num_nodes,), i, dtype=torch.long))
        ys.append(torch.from_numpy(
            np.asarray(g.y, np.float32).reshape(-1)
        ))
        off += g.num_nodes
    ei = torch.cat(eis, 1)
    return (torch.cat(xs), ei[1].contiguous(), ei[0].contiguous(),
            torch.cat(eas), torch.cat(segs), len(gs), torch.stack(ys))


def _torch_masked_bce(logits, y):
    """chem/finetune.py:35-46: valid = y^2 > 0, target = (y+1)/2."""
    valid = y * y > 0
    target = (y + 1.0) / 2.0
    loss = torch.nn.functional.binary_cross_entropy_with_logits(
        logits, target, reduction="none"
    )
    return loss[valid].sum() / valid.sum().clamp(min=1)


def _setup():
    graphs, _ = molecule_dataset(48, num_tasks=TASKS, seed=0,
                                 mean_atoms=14)
    batches_g = [graphs[i:i + 16] for i in range(0, 48, 16)]
    cfg = finetune.FinetuneConfig(
        num_tasks=TASKS, num_layer=LAYERS, emb_dim=EMB, gnn_type="gin",
        dropout_ratio=0.0, batch_size=16, packing="standard",
    )
    model = finetune.build_model(cfg)
    packed = [G.pack_graphs(b, 384, 1024, 16, np_out=True)
              for b in batches_g]
    variables = model.init(jax.random.PRNGKey(0), packed[0], train=False)
    return model, variables, packed, batches_g


def _run_both(model, variables, packed, batches_g, tx, topt_cls, lr):
    state = TrainState.create(dict(variables), tx, jax.random.PRNGKey(1))
    step = finetune.make_train_step(model, tx, "chem")
    tmodel = TorchGIN()
    _copy_weights(tmodel, variables)
    topt = topt_cls(tmodel.parameters(), lr=lr)
    tbatches = [_collate(b) for b in batches_g]
    tmodel.train()
    jl, tl = [], []
    for s in range(STEPS):
        b = s % len(packed)
        state, loss = step(state, packed[b])
        jl.append(float(loss))
        *feats, n_graphs, y = tbatches[b]
        topt.zero_grad()
        out = tmodel(*feats, n_graphs)
        tloss = _torch_masked_bce(out, y)
        tloss.backward()
        topt.step()
        tl.append(float(tloss.detach()))
    return state, tmodel, jl, tl


def _param_diffs(state, tmodel):
    final = {"params": state.params, "batch_stats": state.batch_stats}
    tref = TorchGIN()
    _copy_weights(tref, final)
    out = {}
    for (name, pt), pr in zip(tmodel.named_parameters(),
                              tref.parameters()):
        out[name] = np.abs(pt.detach().numpy() - pr.detach().numpy())
    for li in range(LAYERS):
        out[f"bn{li}.running_mean"] = np.abs(
            tmodel.bns[li].running_mean.detach().numpy()
            - tref.bns[li].running_mean.detach().numpy()
        )
        out[f"bn{li}.running_var"] = np.abs(
            tmodel.bns[li].running_var.detach().numpy()
            - tref.bns[li].running_var.detach().numpy()
        )
    return out


def test_sgd_trajectory_matches_torch():
    """SGD is linear in the gradients, so f32 noise stays at f32 scale:
    full parameter trajectories must agree tightly after N steps."""
    import optax

    model, variables, packed, batches_g = _setup()
    state, tmodel, jl, tl = _run_both(
        model, variables, packed, batches_g, optax.sgd(1e-2),
        torch.optim.SGD, 1e-2,
    )
    np.testing.assert_allclose(jl, tl, rtol=2e-4, atol=2e-5)
    for name, d in _param_diffs(state, tmodel).items():
        assert d.max() < 2e-5, (name, d.max())


def test_adam_trajectory_matches_torch():
    """Adam's g/sqrt(v) normalization amplifies f32 gradient noise
    (~1e-8, verified at a single step) to O(lr) on near-zero-gradient
    coordinates — so the Adam run asserts the loss CURVE tightly and
    bounds the parameter drift in bulk (99th percentile) plus an
    absolute cap at the update scale. A semantic divergence (wrong grad,
    BN update, or loss masking) breaks the loss curve and blows the bulk
    bound by orders of magnitude."""
    import optax

    model, variables, packed, batches_g = _setup()
    state, tmodel, jl, tl = _run_both(
        model, variables, packed, batches_g, optax.adam(LR),
        torch.optim.Adam, LR,  # identical update rules (eps 1e-8)
    )
    np.testing.assert_allclose(jl, tl, rtol=2e-4, atol=2e-5)
    diffs = _param_diffs(state, tmodel)
    # BN running stats are downstream of the drifted params and drift at
    # the same scale; the SGD test pins them at 2e-5. They ride the bulk
    # quantile here.
    all_d = np.concatenate([d.reshape(-1) for d in diffs.values()])
    assert np.quantile(all_d, 0.99) < 5e-4, np.quantile(all_d, 0.99)
    assert all_d.max() < 2 * LR * STEPS, all_d.max()
