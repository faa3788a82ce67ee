"""Benchmark: pretraining-shaped training throughput in edges/s on one chip.

Workload = the reference's north-star config (SURVEY.md §6): GIN 5-layer,
emb 300, batch 256 ZINC-shaped molecules (~23 atoms), full train step
(forward + backward + Adam). Metric = valid (real, non-padding) edges
processed per second, counting each directed edge once per step.

Methodology: the training loop is the framework's device-side scan trainer
(K steps per dispatch, ``train.finetune.make_scan_train_step``); timing
covers dispatch + compute + a final scalar readback of the summed losses —
on remote-attached TPU runtimes, ``block_until_ready`` alone can return
before execution finishes, so only a value readback is trusted.

Baseline = the same math implemented in torch (the reference's framework;
torch-CPU is the only reference-runnable hardware here — torch-geometric /
CUDA are unavailable). vs_baseline = our edges/s divided by torch's.

Prints exactly one JSON line.
"""

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
# Mixed-precision pretraining mode: activations flow in bf16 (MXU matmuls
# with f32 accumulation); BatchNorm statistics, parameters, Adam state and
# losses stay f32 — the standard TPU training recipe. The torch baseline
# below runs in f32 only because torch-CPU has no bf16 fast path; on the
# reference's own GPU hardware AMP would be the equivalent setting.
os.environ.setdefault("PGT_MODEL_DTYPE", "bfloat16_act")

BATCH_GRAPHS = 256
NUM_TASKS = 12
EMB = 300
LAYERS = 5
SCAN_K = 256  # train steps fused per dispatch
ROUNDS = 3  # timed dispatches
TORCH_STEPS = 5


def _dataset():
    from pretrain_gnns_tpu.data.synthetic import molecule_dataset

    graphs, _ = molecule_dataset(2048, num_tasks=NUM_TASKS, seed=0,
                                 mean_atoms=23)
    return graphs


def bench_jax(graphs):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from pretrain_gnns_tpu.data.packing import PackedLoader, block_layout
    from pretrain_gnns_tpu.train import finetune, optim
    from pretrain_gnns_tpu.train.state import TrainState

    cfg = finetune.FinetuneConfig(
        num_tasks=NUM_TASKS, num_layer=LAYERS, emb_dim=EMB,
        gnn_type="gin", dropout_ratio=0.0, batch_size=BATCH_GRAPHS,
    )
    model = finetune.build_model(cfg)
    # block-diagonal layout -> Pallas SpMM path (profiled fastest at
    # 128-node blocks for ~23-atom molecules)
    blocks = block_layout(graphs, BATCH_GRAPHS, block_nodes=128,
                          block_edges=384)
    batches_np = list(
        PackedLoader(graphs, BATCH_GRAPHS, shuffle=False, drop_last=True,
                     blocks=blocks)
    )
    reps = [batches_np[i % len(batches_np)] for i in range(SCAN_K)]
    edges_per_scan = sum(int(b.edge_mask.sum()) for b in reps)
    stacked = jax.device_put(finetune.stack_batches(reps))

    variables = model.init(jax.random.PRNGKey(0), batches_np[0],
                           train=False)
    tx = optim.adam(1e-3)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    scan = finetune.make_scan_train_step(model, tx, "chem")

    # compile + warm readback
    state, losses = scan(state, stacked)
    _ = float(jnp.sum(losses))

    t0 = time.perf_counter()
    acc = None
    for _ in range(ROUNDS):
        state, losses = scan(state, stacked)
        s = jnp.sum(losses)
        acc = s if acc is None else acc + s
    final = float(acc)  # single readback closes the timing
    dt = time.perf_counter() - t0
    assert np.isfinite(final)
    return edges_per_scan * ROUNDS / dt


def bench_torch(graphs):
    """Reference-math GIN train step in torch (CPU), via index_add scatter."""
    import torch

    torch.manual_seed(0)

    class GIN(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.xe1 = torch.nn.Embedding(120, EMB)
            self.xe2 = torch.nn.Embedding(3, EMB)
            self.convs = torch.nn.ModuleList()
            self.bns = torch.nn.ModuleList()
            for _ in range(LAYERS):
                self.convs.append(
                    torch.nn.ModuleDict(
                        dict(
                            e1=torch.nn.Embedding(6, EMB),
                            e2=torch.nn.Embedding(3, EMB),
                            mlp=torch.nn.Sequential(
                                torch.nn.Linear(EMB, 2 * EMB),
                                torch.nn.ReLU(),
                                torch.nn.Linear(2 * EMB, EMB),
                            ),
                        )
                    )
                )
                self.bns.append(torch.nn.BatchNorm1d(EMB))
            self.head = torch.nn.Linear(EMB, NUM_TASKS)

        def forward(self, x, snd, rcv, ea, seg, n_graphs):
            h = self.xe1(x[:, 0]) + self.xe2(x[:, 1])
            for li in range(LAYERS):
                c = self.convs[li]
                e = c["e1"](ea[:, 0]) + c["e2"](ea[:, 1])
                eself = c["e1"].weight[4] + c["e2"].weight[0]
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

    model = GIN()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    def collate(gs):
        xs, eis, eas, segs = [], [], [], []
        off = 0
        for i, g in enumerate(gs):
            xs.append(torch.from_numpy(g.node_feat))
            eis.append(torch.from_numpy(g.edge_index + off))
            eas.append(torch.from_numpy(g.edge_feat))
            segs.append(torch.full((g.num_nodes,), i, dtype=torch.long))
            off += g.num_nodes
        ei = torch.cat(eis, 1)
        return (
            torch.cat(xs),
            ei[1].contiguous(),
            ei[0].contiguous(),
            torch.cat(eas),
            torch.cat(segs),
            len(gs),
        )

    batches = [
        collate(graphs[i: i + BATCH_GRAPHS])
        for i in range(0, BATCH_GRAPHS * 2, BATCH_GRAPHS)
    ]
    y = torch.randint(0, 2, (BATCH_GRAPHS, NUM_TASKS)).float()

    def step(b):
        opt.zero_grad()
        out = model(*b)
        loss = torch.nn.functional.binary_cross_entropy_with_logits(out, y)
        loss.backward()
        opt.step()

    step(batches[0])  # warmup
    edges = 0
    t0 = time.perf_counter()
    for i in range(TORCH_STEPS):
        b = batches[i % len(batches)]
        step(b)
        edges += b[1].shape[0]
    return edges / (time.perf_counter() - t0)


def main():
    graphs = _dataset()
    jax_rate = bench_jax(graphs)
    try:
        torch_rate = bench_torch(graphs)
    except Exception:
        torch_rate = None
    print(
        json.dumps(
            {
                "metric": "pretrain_gin5_300_train_edges_per_sec_per_chip",
                "value": round(jax_rate, 1),
                "unit": "edges/s",
                "vs_baseline": (
                    round(jax_rate / torch_rate, 3) if torch_rate else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
