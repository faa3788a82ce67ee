"""Scaling-efficiency harness on a virtual CPU mesh (VERDICT r2 item 8).

Runs the data-parallel masking train step at 1/2/4/8 virtual devices and
prints per-width edges/s plus ``telemetry.scaling_efficiency`` vs the
1-device base. Virtual CPU devices share one physical core pool, so these
are NOT real ICI numbers — the point is exercising the >=80%-efficiency
bookkeeping (BASELINE.md scaling target) end-to-end so the same harness
can run unchanged on real multi-chip hardware.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_dryrun.py [--widths 1,2,4,8] [--steps 8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if jax.device_count() < 8:
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--widths", default="1,2,4,8")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--emb_dim", type=int, default=64)
    args = p.parse_args()
    widths = [int(w) for w in args.widths.split(",")]

    from pretrain_gnns_tpu.data.synthetic import molecule_dataset
    from pretrain_gnns_tpu.train import pretrain, telemetry

    graphs, _ = molecule_dataset(
        args.batch_size * max(widths) * (args.steps + 1), num_tasks=1,
        seed=0, mean_atoms=20,
    )

    import time

    rows = []
    base = None
    for w in widths:
        # the PRODUCTION pipeline: device-resident dataset + whole-epoch
        # lax.scan trainer, composed with DP (descriptors sharded over the
        # data axis) — the same path bench.py times on hardware
        cfg = pretrain.PretrainConfig(
            objective="masking", num_layer=5, emb_dim=args.emb_dim,
            batch_size=args.batch_size, mask_edge=False,
            packing="standard", transform_device="batch",
            device_dataset="on", dp_devices=w, scan_steps=8, seed=0,
        )
        # epoch 1 = compile+warm; later epochs timed via the log callback
        times = []

        def logcb(s):
            if s.startswith("epoch"):
                times.append(time.perf_counter())

        res = pretrain.run_pretrain(cfg, graphs, log=logcb, epochs=3)
        edges = res["loader"].last_epoch_stats["edges"]
        # DP drops leftover groups; count edges actually consumed.
        # Total-wall window across the timed epochs (NOT median of
        # per-epoch diffs): per-epoch diffs are fooled by prefetch
        # queue-drain / dispatch-group bursts — the same correction
        # bench.py and objective_bench.py carry (docs/PERFORMANCE.md §2)
        n_spans = len(times) - 1
        dt = (times[-1] - times[0]) / max(n_spans, 1)
        eps = edges / dt
        row = {"devices": w, "edges_per_sec": round(eps, 1)}
        if base is None:
            base = (eps, w)
        else:
            row["scaling_efficiency"] = round(
                telemetry.scaling_efficiency(base[0], base[1], eps, w), 3
            )
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    main()
