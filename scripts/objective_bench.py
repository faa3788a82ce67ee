"""Per-objective end-to-end pretraining throughput (edges/s/chip).

Runs every SSL objective through ``run_pretrain``'s production pipeline on
bench-sized synthetic data and prints one JSON line each — the per-
objective companion of bench.py (which times the masking headline only).

Usage: [OBJS="masking edgepred"] [DTYPE=bfloat16_act] \
    python - < scripts/objective_bench.py   # ('python - <' keeps the
    repo root importable without PYTHONPATH, which breaks the axon plugin)
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import numpy as np

from pretrain_gnns_tpu.data.synthetic import bio_dataset, molecule_dataset
from pretrain_gnns_tpu.models import inits
from pretrain_gnns_tpu.train import pretrain

N_GRAPHS = 8192
# Epochs fuse into scan-dispatch groups whose rows finalize in one
# burst, so the timing window must align to group boundaries: 1 warm
# group (compile + prefetch prefill) + 3 timed groups, total wall.
EPOCH_GROUP = 4
EPOCHS = 16
SKIP = EPOCH_GROUP


def run(objective: str) -> dict:
    # per-architecture rows (VERDICT r4 missing #4): masking_gat etc.
    gnn_type = "gin"
    for arch in ("gat", "gcn", "graphsage"):
        if objective.endswith("_" + arch):
            gnn_type = arch
            objective = objective[: -len(arch) - 1]
            break
    if objective.startswith("bio_"):
        graphs = bio_dataset(2048, num_downstream=3, seed=0, mean_nodes=60)
        for g in graphs:
            g.extras = {"center_node_idx": g.extras["center_node_idx"]}
        obj = objective[4:]
        cfg = pretrain.PretrainConfig(
            objective=obj, domain="bio", num_layer=5,
            emb_dim=300, batch_size=64, seed=0, scan_steps=16,
            packing="auto", epoch_group=EPOCH_GROUP,
            num_tasks=graphs[0].y.shape[-1], gnn_type=gnn_type,
            dropout_ratio=0.2 if obj == "supervised" else 0.0,
        )
    else:
        graphs, _ = molecule_dataset(N_GRAPHS, num_tasks=12, seed=0,
                                     mean_atoms=23)
        cfg = pretrain.PretrainConfig(
            objective=objective, num_layer=5, emb_dim=300, batch_size=256,
            mask_edge=False, seed=0, scan_steps=16, packing="auto",
            epoch_group=EPOCH_GROUP, num_tasks=12, gnn_type=gnn_type,
            dropout_ratio=0.2 if objective == "supervised" else 0.0,
        )
    times = []

    def logcb(s):
        if s.startswith("epoch"):
            times.append(time.perf_counter())

    res = pretrain.run_pretrain(cfg, graphs, log=logcb, epochs=EPOCHS)
    # total wall over the last (EPOCHS-SKIP) epochs, window ends/starts
    # at group boundaries (a median of per-epoch diffs is fooled both by
    # queue drain after compilation and by per-group row bursts); edge
    # counts are summed over EXACTLY the timed epochs (contextpred's
    # presampled variants differ by a few % per epoch)
    edges = sum(h["edges"] for h in res["history"][SKIP:])
    wall = times[-1] - times[SKIP - 1]
    out = {
        "objective": objective,
        "edges_per_sec": round(edges / wall, 1),
        "loader": type(res["loader"]).__name__,
    }
    if gnn_type != "gin":
        out["gnn_type"] = gnn_type
        out["objective"] = f"{objective}_{gnn_type}"
    return out


def main():
    inits.set_compute_dtype(os.environ.get("DTYPE", "bfloat16_act"))
    objs = (os.environ.get("OBJS")
            or "masking infomax edgepred contextpred supervised "
               "bio_masking bio_edgepred bio_infomax bio_contextpred "
               "bio_supervised"
            ).split()
    for obj in objs:
        print(json.dumps(run(obj)), flush=True)


if __name__ == "__main__":
    main()
