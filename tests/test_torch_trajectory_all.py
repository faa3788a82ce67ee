"""Training-trajectory parity breadth (VERDICT r4 missing #3).

tests/test_torch_trajectory.py pins the chem GIN + mean pool + masked-BCE
configuration; this file extends N-step optimizer-trajectory parity vs
faithful torch reimplementations of the reference to:

- the other three chem conv families (gcn / gat / graphsage,
  /root/reference/chem/model.py:58-202) — a backward-pass bug in the GAT
  kernel's VJP or the GCN norm would pass forward-only parity;
- the bio GIN trunk + center-concat head (bio/model.py:11-58, :333-347);
- one SSL objective: chem attribute masking's node head
  (chem/pretrain_masking.py:34-78).

Torch sides materialize self-loops explicitly (bond type 4 / one-hot
dim 7) exactly like the reference; the framework handles them
analytically. SGD keeps updates linear in the gradients, so trajectories
must agree at f32-noise scale; the Adam variants in the sibling file
cover optimizer-state dynamics.
"""

import dataclasses

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from pretrain_gnns_tpu.core import graphs as G  # noqa: E402
from pretrain_gnns_tpu.data.synthetic import (  # noqa: E402
    bio_dataset, molecule_dataset,
)
from pretrain_gnns_tpu.models.chem import SELF_LOOP_BOND_TYPE  # noqa: E402
from pretrain_gnns_tpu.train import finetune, optim, pretrain  # noqa: E402
from pretrain_gnns_tpu.train.state import TrainState  # noqa: E402

LAYERS = 2
EMB = 16
TASKS = 3
STEPS = 6
LR = 1e-2
HEADS = 2


def _put(t, a):
    t.data = torch.from_numpy(np.array(a, np.float32))


# ---------------------------------------------------------------------------
# torch chem trunk, all conv families (reference chem/model.py math)
# ---------------------------------------------------------------------------
class TorchChemConv(torch.nn.Module):
    def __init__(self, kind):
        super().__init__()
        self.kind = kind
        ed = HEADS * EMB if kind == "gat" else EMB
        self.e1 = torch.nn.Embedding(6, ed)
        self.e2 = torch.nn.Embedding(3, ed)
        if kind == "gin":
            self.mlp = torch.nn.Sequential(
                torch.nn.Linear(EMB, 2 * EMB), torch.nn.ReLU(),
                torch.nn.Linear(2 * EMB, EMB),
            )
        elif kind in ("gcn", "graphsage"):
            self.linear = torch.nn.Linear(EMB, EMB)
        elif kind == "gat":
            self.weight_linear = torch.nn.Linear(EMB, HEADS * EMB)
            self.att = torch.nn.Parameter(
                torch.zeros(1, HEADS, 2 * EMB)
            )
            self.bias = torch.nn.Parameter(torch.zeros(EMB))

    def forward(self, h, snd, rcv, ea):
        N = h.shape[0]
        # explicit self-loops (chem/model.py:39-45)
        loops = torch.arange(N)
        snd = torch.cat([snd, loops])
        rcv = torch.cat([rcv, loops])
        sl = torch.zeros((N, 2), dtype=ea.dtype)
        sl[:, 0] = SELF_LOOP_BOND_TYPE
        ea = torch.cat([ea, sl], 0)
        e = self.e1(ea[:, 0]) + self.e2(ea[:, 1])
        if self.kind == "gin":
            msg = h[snd] + e
            aggr = torch.zeros_like(h).index_add_(0, rcv, msg)
            return self.mlp(aggr)
        if self.kind == "gcn":
            deg = torch.zeros(N).index_add_(
                0, rcv, torch.ones(rcv.shape[0])
            )
            dis = torch.where(deg > 0, deg.clamp(min=1e-12) ** -0.5,
                              torch.zeros(()))
            norm = dis[rcv] * dis[snd]
            x = self.linear(h)
            msg = norm[:, None] * (x[snd] + e)
            return torch.zeros_like(x).index_add_(0, rcv, msg)
        if self.kind == "graphsage":
            x = self.linear(h)
            msg = x[snd] + e
            s = torch.zeros_like(x).index_add_(0, rcv, msg)
            cnt = torch.zeros(N).index_add_(
                0, rcv, torch.ones(rcv.shape[0])
            )
            mean = s / cnt.clamp(min=1)[:, None]
            return torch.nn.functional.normalize(mean, p=2, dim=-1)
        # gat (chem/model.py:107-165)
        x = self.weight_linear(h).reshape(N, HEADS, EMB)
        e = e.reshape(-1, HEADS, EMB)
        x_i, x_j = x[rcv], x[snd] + e
        a_i = self.att[..., :EMB]
        a_j = self.att[..., EMB:]
        alpha = torch.nn.functional.leaky_relu(
            (x_i * a_i + x_j * a_j).sum(-1), 0.2
        )  # [E, H]
        m = torch.full((N, HEADS), -torch.inf).index_reduce_(
            0, rcv, alpha, "amax", include_self=False
        )
        ex = torch.exp(alpha - m[rcv])
        den = torch.zeros(N, HEADS).index_add_(0, rcv, ex)
        p = ex / den[rcv]
        out = torch.zeros(N, HEADS, EMB).index_add_(
            0, rcv, p[..., None] * x_j
        )
        return out.mean(1) + self.bias


class TorchChemPred(torch.nn.Module):
    def __init__(self, kind):
        super().__init__()
        self.xe1 = torch.nn.Embedding(120, EMB)
        self.xe2 = torch.nn.Embedding(3, EMB)
        self.convs = torch.nn.ModuleList(
            [TorchChemConv(kind) for _ in range(LAYERS)]
        )
        self.bns = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(EMB) for _ in range(LAYERS)]
        )
        self.head = torch.nn.Linear(EMB, TASKS)

    def trunk(self, x, snd, rcv, ea):
        h = self.xe1(x[:, 0]) + self.xe2(x[:, 1])
        for li in range(LAYERS):
            h = self.bns[li](self.convs[li](h, snd, rcv, ea))
            if li != LAYERS - 1:
                h = torch.relu(h)
        return h

    def forward(self, x, snd, rcv, ea, seg, n_graphs):
        h = self.trunk(x, snd, rcv, ea)
        pooled = torch.zeros(n_graphs, EMB).index_add_(0, seg, h)
        cnt = torch.zeros(n_graphs).index_add_(
            0, seg, torch.ones(seg.shape[0])
        )
        return self.head(pooled / cnt.clamp(min=1)[:, None])


def _copy_chem(tmodel, variables, kind, trunk_key="gnn",
               head_key="graph_pred_linear"):
    p = variables["params"]
    gnn = p[trunk_key]
    _put(tmodel.xe1.weight, gnn["x_embedding1"])
    _put(tmodel.xe2.weight, gnn["x_embedding2"])
    for li in range(LAYERS):
        c = gnn[f"gnns_{li}"]
        tc = tmodel.convs[li]
        _put(tc.e1.weight, c["edge_embedding1"])
        _put(tc.e2.weight, c["edge_embedding2"])
        if kind == "gin":
            _put(tc.mlp[0].weight, np.asarray(c["mlp_0"]["kernel"]).T)
            _put(tc.mlp[0].bias, c["mlp_0"]["bias"])
            _put(tc.mlp[2].weight, np.asarray(c["mlp_2"]["kernel"]).T)
            _put(tc.mlp[2].bias, c["mlp_2"]["bias"])
        elif kind in ("gcn", "graphsage"):
            _put(tc.linear.weight, np.asarray(c["linear"]["kernel"]).T)
            _put(tc.linear.bias, c["linear"]["bias"])
        else:
            _put(tc.weight_linear.weight,
                 np.asarray(c["weight_linear"]["kernel"]).T)
            _put(tc.weight_linear.bias, c["weight_linear"]["bias"])
            _put(tc.att, c["att"])
            _put(tc.bias, c["bias"])
        bn = gnn[f"batch_norms_{li}"]
        _put(tmodel.bns[li].weight, bn["scale"])
        _put(tmodel.bns[li].bias, bn["bias"])
        st = variables["batch_stats"][trunk_key][f"batch_norms_{li}"]
        _put(tmodel.bns[li].running_mean, st["mean"])
        _put(tmodel.bns[li].running_var, st["var"])
    if head_key is not None:
        _put(tmodel.head.weight, np.asarray(p[head_key]["kernel"]).T)
        _put(tmodel.head.bias, p[head_key]["bias"])


def _collate_chem(gs):
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
            torch.cat(eas), torch.cat(segs), len(gs),
            torch.stack(ys))


def _torch_masked_bce(logits, y):
    valid = y * y > 0
    target = (y + 1.0) / 2.0
    loss = torch.nn.functional.binary_cross_entropy_with_logits(
        logits, target, reduction="none"
    )
    return loss[valid].sum() / valid.sum().clamp(min=1)


@pytest.mark.parametrize("kind", ["gcn", "gat", "graphsage"])
def test_chem_conv_sgd_trajectory(kind):
    graphs, _ = molecule_dataset(48, num_tasks=TASKS, seed=0,
                                 mean_atoms=14)
    batches_g = [graphs[i:i + 16] for i in range(0, 48, 16)]
    cfg = finetune.FinetuneConfig(
        num_tasks=TASKS, num_layer=LAYERS, emb_dim=EMB, gnn_type=kind,
        dropout_ratio=0.0, batch_size=16, packing="standard",
    )
    model = finetune.build_model(cfg)
    packed = [G.pack_graphs(b, 384, 1024, 16, np_out=True)
              for b in batches_g]
    variables = model.init(jax.random.PRNGKey(0), packed[0], train=False)

    import optax

    tx = optax.sgd(LR)
    state = TrainState.create(dict(variables), tx, jax.random.PRNGKey(1))
    step = finetune.make_train_step(model, tx, "chem")

    tmodel = TorchChemPred(kind)
    _copy_chem(tmodel, variables, kind)
    topt = torch.optim.SGD(tmodel.parameters(), lr=LR)
    tbatches = [_collate_chem(b) for b in batches_g]
    tmodel.train()

    jl, tl = [], []
    for s in range(STEPS):
        b = s % len(packed)
        state, loss = step(state, packed[b])
        jl.append(float(loss))
        *feats, n_graphs, y = tbatches[b]
        topt.zero_grad()
        tloss = _torch_masked_bce(tmodel(*feats, n_graphs), y)
        tloss.backward()
        topt.step()
        tl.append(float(tloss.detach()))
    np.testing.assert_allclose(jl, tl, rtol=5e-4, atol=5e-5)

    ref = TorchChemPred(kind)
    _copy_chem(ref, {"params": state.params,
                     "batch_stats": state.batch_stats}, kind)
    for (name, pt), pr in zip(tmodel.named_parameters(),
                              ref.parameters()):
        d = np.abs(pt.detach().numpy() - pr.detach().numpy()).max()
        assert d < 5e-5, (name, d)


# ---------------------------------------------------------------------------
# bio GIN trunk + center-concat head (bio/model.py, bio/finetune.py)
# ---------------------------------------------------------------------------
class TorchBioPred(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.emb0 = torch.nn.Embedding(2, EMB)
        self.encs = torch.nn.ModuleList()
        self.mlps = torch.nn.ModuleList()
        for _ in range(LAYERS):
            self.encs.append(torch.nn.Linear(9, EMB))
            self.mlps.append(torch.nn.Sequential(
                torch.nn.Linear(2 * EMB, 2 * EMB),
                torch.nn.BatchNorm1d(2 * EMB), torch.nn.ReLU(),
                torch.nn.Linear(2 * EMB, EMB),
            ))
        self.head = torch.nn.Linear(2 * EMB, TASKS)

    def forward(self, x, snd, rcv, ea, center, seg, n_graphs):
        N = x.shape[0]
        loops = torch.arange(N)
        snd_l = torch.cat([snd, loops])
        rcv_l = torch.cat([rcv, loops])
        sl = torch.zeros((N, 9))
        sl[:, 7] = 1.0  # bio/model.py:43
        ea_l = torch.cat([ea, sl], 0)
        h = x
        for li in range(LAYERS):
            if li == 0:
                h = self.emb0(x[:, 0].long())
            e = self.encs[li](ea_l)
            msg = torch.cat([h[snd_l], e], -1)
            aggr = torch.zeros(N, 2 * EMB).index_add_(0, rcv_l, msg)
            h = self.mlps[li](aggr)
            if li != LAYERS - 1:
                h = torch.relu(h)
        pooled = torch.zeros(n_graphs, EMB).index_add_(0, seg, h)
        cnt = torch.zeros(n_graphs).index_add_(
            0, seg, torch.ones(seg.shape[0])
        )
        rep = torch.cat([pooled / cnt.clamp(min=1)[:, None], h[center]],
                        1)
        return self.head(rep)


def _copy_bio(tmodel, variables):
    p = variables["params"]["gnn"]
    _put(tmodel.emb0.weight, p["gnns_0"]["input_node_embeddings"])
    for li in range(LAYERS):
        c = p[f"gnns_{li}"]
        _put(tmodel.encs[li].weight,
             np.asarray(c["edge_encoder"]["kernel"]).T)
        _put(tmodel.encs[li].bias, c["edge_encoder"]["bias"])
        m = tmodel.mlps[li]
        _put(m[0].weight, np.asarray(c["mlp_0"]["kernel"]).T)
        _put(m[0].bias, c["mlp_0"]["bias"])
        _put(m[1].weight, c["mlp_1"]["scale"])
        _put(m[1].bias, c["mlp_1"]["bias"])
        st = variables["batch_stats"]["gnn"][f"gnns_{li}"]["mlp_1"]
        _put(m[1].running_mean, st["mean"])
        _put(m[1].running_var, st["var"])
        _put(m[3].weight, np.asarray(c["mlp_3"]["kernel"]).T)
        _put(m[3].bias, c["mlp_3"]["bias"])
    _put(tmodel.head.weight,
         np.asarray(variables["params"]["graph_pred_linear"]["kernel"]).T)
    _put(tmodel.head.bias,
         variables["params"]["graph_pred_linear"]["bias"])


def test_bio_gin_sgd_trajectory():
    graphs = bio_dataset(24, num_downstream=TASKS, seed=3, mean_nodes=18)
    batches_g = [graphs[i:i + 8] for i in range(0, 24, 8)]
    cfg = finetune.FinetuneConfig(
        domain="bio", num_tasks=TASKS, num_layer=LAYERS, emb_dim=EMB,
        dropout_ratio=0.0, batch_size=8, packing="standard",
    )
    model = finetune.build_model(cfg)
    packed = [
        G.pack_graphs(b, 256, 2048, 8, np_out=True,
                      extra_pad={"center_node_idx": 8})
        for b in batches_g
    ]
    variables = model.init(jax.random.PRNGKey(0), packed[0], train=False)

    import optax

    tx = optax.sgd(LR)
    state = TrainState.create(dict(variables), tx, jax.random.PRNGKey(1))
    step = finetune.make_train_step(model, tx, cfg.loss_kind)

    tmodel = TorchBioPred()
    _copy_bio(tmodel, variables)
    topt = torch.optim.SGD(tmodel.parameters(), lr=LR)
    tmodel.train()

    jl, tl = [], []
    for s in range(STEPS):
        b = s % len(packed)
        state, loss = step(state, packed[b])
        jl.append(float(loss))
        gs = batches_g[b]
        xs, eis, eas, segs, ys, centers = [], [], [], [], [], []
        off = 0
        for i, g in enumerate(gs):
            xs.append(torch.from_numpy(
                np.asarray(g.node_feat, np.float32)
            ))
            eis.append(torch.from_numpy(
                np.asarray(g.edge_index, np.int64) + off
            ))
            eas.append(torch.from_numpy(
                np.asarray(g.edge_feat, np.float32)
            ))
            segs.append(torch.full((g.num_nodes,), i, dtype=torch.long))
            ys.append(torch.from_numpy(
                np.asarray(g.y, np.float32).reshape(-1)
            ))
            centers.append(
                int(g.extras["center_node_idx"][0][0]) + off
            )
            off += g.num_nodes
        ei = torch.cat(eis, 1)
        topt.zero_grad()
        out = tmodel(
            torch.cat(xs), ei[1].contiguous(), ei[0].contiguous(),
            torch.cat(eas), torch.tensor(centers), torch.cat(segs),
            len(gs),
        )
        y = torch.stack(ys)
        tloss = torch.nn.functional.binary_cross_entropy_with_logits(
            out, y, reduction="mean"
        )
        tloss.backward()
        topt.step()
        tl.append(float(tloss.detach()))
    np.testing.assert_allclose(jl, tl, rtol=5e-4, atol=5e-5)

    ref = TorchBioPred()
    _copy_bio(ref, {"params": state.params,
                    "batch_stats": state.batch_stats})
    for (name, pt), pr in zip(tmodel.named_parameters(),
                              ref.parameters()):
        d = np.abs(pt.detach().numpy() - pr.detach().numpy()).max()
        assert d < 5e-5, (name, d)


# ---------------------------------------------------------------------------
# chem attribute-masking SSL (node head, chem/pretrain_masking.py:48-52)
# ---------------------------------------------------------------------------
class TorchMasking(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.pred = TorchChemPred("gin")  # trunk reused; head unused
        self.node_head = torch.nn.Linear(EMB, 119)

    def forward(self, x, snd, rcv, ea, masked_idx):
        h = self.pred.trunk(x, snd, rcv, ea)
        return self.node_head(h[masked_idx])


def test_masking_ssl_sgd_trajectory():
    """Same masked batches (host-precomputed masks shared between both
    frameworks), same Linear(D->119) node head, CE over masked atoms."""
    rng = np.random.default_rng(7)
    graphs, _ = molecule_dataset(32, num_tasks=1, seed=1, mean_atoms=14)
    batches_g = [graphs[i:i + 16] for i in range(0, 32, 16)]

    packed, torch_feed = [], []
    budget = 96
    for gs in batches_g:
        pk = G.pack_graphs(gs, 384, 1024, 16, np_out=True)
        total = int(pk.node_mask.sum())
        # contiguous placement => packed slot == torch concat index
        assert pk.node_mask[:total].all()
        masked = []
        off = 0
        for g in gs:
            n = g.num_nodes
            k = int(n * 0.15) + 1  # chem/util.py:230
            masked += (off + rng.choice(n, size=k, replace=False)).tolist()
            off += n
        masked = np.array(sorted(masked), np.int32)
        labels = np.zeros((budget, 2), np.int64)
        labels[: len(masked)] = pk.node_feat[masked]
        nf = np.array(pk.node_feat)
        nf[masked] = [119, 0]  # mask token (chem/pretrain_masking.py:122)
        idx = np.zeros(budget, np.int32)
        idx[: len(masked)] = masked
        m = np.zeros(budget, bool)
        m[: len(masked)] = True
        packed.append(dataclasses.replace(
            pk, node_feat=nf,
            extras={"masked_atom_indices": idx,
                    "masked_atom_indices_mask": m,
                    "mask_node_label": labels},
        ))
        torch_feed.append((
            torch.from_numpy(nf.astype(np.int64)[:total]),
            torch.from_numpy(
                np.asarray(pk.senders)[np.asarray(pk.edge_mask)]
                .astype(np.int64)
            ),
            torch.from_numpy(
                np.asarray(pk.receivers)[np.asarray(pk.edge_mask)]
                .astype(np.int64)
            ),
            torch.from_numpy(
                np.asarray(pk.edge_feat)[np.asarray(pk.edge_mask)]
                .astype(np.int64)
            ),
            torch.from_numpy(masked.astype(np.int64)),
            torch.from_numpy(labels[: len(masked), 0]),
        ))

    mcfg = pretrain.PretrainConfig(
        objective="masking", num_layer=LAYERS, emb_dim=EMB,
        mask_edge=False, packing="standard",
    )
    model = pretrain.build_objective(mcfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(2)},
        packed[0], train=False,
    )

    import optax

    tx = optax.sgd(LR)
    state = TrainState.create(dict(variables), tx, jax.random.PRNGKey(1))
    step = pretrain.make_pretrain_step(model, tx)

    tmodel = TorchMasking()
    _copy_chem(tmodel.pred, variables, "gin", head_key=None)
    _put(tmodel.node_head.weight,
         np.asarray(variables["params"]["linear_pred_atoms"]["kernel"]).T)
    _put(tmodel.node_head.bias,
         variables["params"]["linear_pred_atoms"]["bias"])
    topt = torch.optim.SGD(tmodel.parameters(), lr=LR)
    tmodel.train()

    jl, tl = [], []
    for s in range(STEPS):
        b = s % len(packed)
        state, loss, _ = step(state, packed[b])
        jl.append(float(loss))
        x, snd, rcv, ea, masked, labels = torch_feed[b]
        # torch edge direction: framework senders gather / receivers
        # scatter == torch h[snd] -> index_add rcv
        topt.zero_grad()
        logits = tmodel(x, snd, rcv, ea, masked)
        tloss = torch.nn.functional.cross_entropy(logits, labels)
        tloss.backward()
        topt.step()
        tl.append(float(tloss.detach()))
    np.testing.assert_allclose(jl, tl, rtol=5e-4, atol=5e-5)

    ref = TorchMasking()
    _copy_chem(ref.pred, {"params": state.params,
                          "batch_stats": state.batch_stats}, "gin",
               head_key=None)
    _put(ref.node_head.weight,
         np.asarray(state.params["linear_pred_atoms"]["kernel"]).T)
    _put(ref.node_head.bias, state.params["linear_pred_atoms"]["bias"])
    for (name, pt), (_, pr) in zip(tmodel.named_parameters(),
                                   ref.named_parameters()):
        if name.startswith("pred.head."):
            continue  # unused GraphPred head: no masking counterpart
        d = np.abs(pt.detach().numpy() - pr.detach().numpy()).max()
        assert d < 5e-5, (name, d)
