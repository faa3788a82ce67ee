"""Profile the bench train step on the real chip and print a per-op
time breakdown (parsed from the JAX profiler's perfetto trace).

Usage: python scripts/profile_step.py [--steps 8] [--top 30]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

BATCH_GRAPHS = 256
NUM_TASKS = 12
EMB = 300
LAYERS = 5


def build(scan_k):
    import jax
    import jax.numpy as jnp

    from pretrain_gnns_tpu.data.packing import PackedLoader, block_layout
    from pretrain_gnns_tpu.data.synthetic import molecule_dataset
    from pretrain_gnns_tpu.train import finetune, optim
    from pretrain_gnns_tpu.train.state import TrainState

    graphs, _ = molecule_dataset(2048, num_tasks=NUM_TASKS, seed=0,
                                 mean_atoms=23)
    cfg = finetune.FinetuneConfig(
        num_tasks=NUM_TASKS, num_layer=LAYERS, emb_dim=EMB,
        gnn_type="gin", dropout_ratio=0.0, batch_size=BATCH_GRAPHS,
    )
    model = finetune.build_model(cfg)
    blocks = block_layout(graphs, BATCH_GRAPHS, block_nodes=128,
                          block_edges=384)
    batches_np = list(
        PackedLoader(graphs, BATCH_GRAPHS, shuffle=False, drop_last=True,
                     blocks=blocks)
    )
    reps = [batches_np[i % len(batches_np)] for i in range(scan_k)]
    edges_per_scan = sum(int(b.edge_mask.sum()) for b in reps)
    stacked = jax.device_put(finetune.stack_batches(reps))
    variables = model.init(jax.random.PRNGKey(0), batches_np[0], train=False)
    tx = optim.adam(1e-3)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    scan = finetune.make_scan_train_step(model, tx, "chem")
    return scan, state, stacked, edges_per_scan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--scan_k", type=int, default=64)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace_dir", default="/tmp/pgt_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    scan, state, stacked, edges_per_scan = build(args.scan_k)
    # warm up / compile
    state, losses = scan(state, stacked)
    _ = float(jnp.sum(losses))

    os.system(f"rm -rf {args.trace_dir}")
    jax.profiler.start_trace(args.trace_dir)
    t0 = time.perf_counter()
    acc = None
    for _ in range(args.steps):
        state, losses = scan(state, stacked)
        s = jnp.sum(losses)
        acc = s if acc is None else acc + s
    final = float(acc)
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    assert np.isfinite(final)
    rate = edges_per_scan * args.steps / dt
    print(f"edges/s: {rate:,.0f}  wall: {dt:.3f}s for "
          f"{args.steps}x{args.scan_k} steps")

    # ---- parse trace ----
    paths = glob.glob(
        os.path.join(args.trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print("no trace found")
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find TPU-op track: durations by op name on device threads
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e["pid"], "")
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        if "XLA Ops" not in tname:
            continue
        dur = e.get("dur", 0) / 1e6
        by_op[e["name"]] += dur
        total += dur
    print(f"\ntotal device op time: {total:.3f}s "
          f"({100 * total / dt:.1f}% of wall)")
    rows = sorted(by_op.items(), key=lambda kv: -kv[1])
    print(f"{'op':70s} {'time_s':>9s} {'%':>6s}")
    for name, dur in rows[: args.top]:
        print(f"{name[:70]:70s} {dur:9.4f} {100 * dur / total:6.2f}")


if __name__ == "__main__":
    main()
