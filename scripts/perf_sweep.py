"""Serial perf experiments for the bench workload. One config per line:

  python scripts/perf_sweep.py model_dtype=bfloat16 block_edges=256 ...

Each invocation runs ONE config (TPU is single-tenant); the sweep driver
is a shell loop.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cfg = dict(kv.split("=", 1) for kv in sys.argv[1:])
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
if "model_dtype" in cfg:
    os.environ["PGT_MODEL_DTYPE"] = cfg["model_dtype"]
if "spmm_dtype" in cfg:
    os.environ["PGT_SPMM_DTYPE"] = cfg["spmm_dtype"]

BATCH_GRAPHS = int(cfg.get("batch", 256))
NUM_TASKS = 12
EMB = int(cfg.get("emb", 300))
LAYERS = 5
SCAN_K = int(cfg.get("scan_k", 256))
ROUNDS = int(cfg.get("rounds", 3))
BLOCK_NODES = int(cfg.get("block_nodes", 128))
BLOCK_EDGES = int(cfg.get("block_edges", 384))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pretrain_gnns_tpu.data.packing import PackedLoader, block_layout
    from pretrain_gnns_tpu.data.synthetic import molecule_dataset
    from pretrain_gnns_tpu.train import finetune, optim
    from pretrain_gnns_tpu.train.state import TrainState

    graphs, _ = molecule_dataset(2048, num_tasks=NUM_TASKS, seed=0,
                                 mean_atoms=23)
    fcfg = finetune.FinetuneConfig(
        num_tasks=NUM_TASKS, num_layer=LAYERS, emb_dim=EMB,
        gnn_type=cfg.get("gnn", "gin"), dropout_ratio=0.0,
        batch_size=BATCH_GRAPHS,
    )
    model = finetune.build_model(fcfg)
    blocks = block_layout(graphs, BATCH_GRAPHS, block_nodes=BLOCK_NODES,
                          block_edges=BLOCK_EDGES)
    batches_np = list(
        PackedLoader(graphs, BATCH_GRAPHS, shuffle=False, drop_last=True,
                     blocks=blocks)
    )
    reps = [batches_np[i % len(batches_np)] for i in range(SCAN_K)]
    edges_per_scan = sum(int(b.edge_mask.sum()) for b in reps)
    b0 = reps[0]
    print(f"padded: nodes={b0.max_nodes} edges={b0.senders.shape[0]} "
          f"blocks={b0.max_nodes // max(b0.block_nodes, 1) if b0.block_nodes else 0}",
          flush=True)
    stacked = jax.device_put(finetune.stack_batches(reps))
    variables = model.init(jax.random.PRNGKey(0), batches_np[0], train=False)
    tx = optim.adam(1e-3)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    scan = finetune.make_scan_train_step(model, tx, "chem")

    state, losses = scan(state, stacked)
    _ = float(jnp.sum(losses))
    t0 = time.perf_counter()
    acc = None
    for _ in range(ROUNDS):
        state, losses = scan(state, stacked)
        s = jnp.sum(losses)
        acc = s if acc is None else acc + s
    final = float(acc)
    dt = time.perf_counter() - t0
    assert np.isfinite(final)
    rate = edges_per_scan * ROUNDS / dt
    print(f"CONFIG {sys.argv[1:]} -> {rate:,.0f} edges/s "
          f"({dt * 1e3 / (ROUNDS * SCAN_K):.3f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
