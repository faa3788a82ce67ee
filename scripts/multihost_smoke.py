"""Multi-host (multi-process) training runner + equivalence probe.

One process of an SPMD multi-process run (parallel.multihost): every
process executes this same script with its own ``--process_id``; the mesh
spans all processes' devices, each process packs descriptor columns for
its local devices only, and gradient/sync-BN collectives ride the
cross-process transport (ICI/DCN on a pod; gloo on the CPU test rig).

N-host invocation (what a real pod slice runs, one line per host):

  python scripts/multihost_smoke.py --num_processes N --process_id i \
      --coordinator HOST0:PORT [training flags]

or equivalently via env (every CLI calls multihost.initialize()):

  PGT_COORDINATOR=HOST0:PORT PGT_NUM_PROCESSES=N PGT_PROCESS_ID=i \
      python -m pretrain_gnns_tpu.cli.pretrain --dp_devices 0 \
      --device_dataset on ...

CPU test rig (no pod needed — tests/test_multihost.py):

  python scripts/multihost_smoke.py --num_processes 2 --process_id {0,1} \
      --cpu_devices 4 --coordinator 127.0.0.1:PORT --out run.npz

``--out`` dumps per-epoch losses (json) and final params (npz) on
process 0, so a 2-process run can be compared leaf-for-leaf against a
1-process run over the same global device count.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="127.0.0.1:9955")
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--cpu_devices", type=int, default=0,
                    help="virtual CPU devices per process (0 = use the "
                         "real platform)")
    ap.add_argument("--objective", default="masking")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--num_layer", type=int, default=2)
    ap.add_argument("--emb_dim", type=int, default=32)
    ap.add_argument("--n_graphs", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    from pretrain_gnns_tpu.parallel import multihost

    if args.num_processes > 1:
        multihost.initialize(
            args.coordinator, args.num_processes, args.process_id,
            cpu_devices_per_process=args.cpu_devices or None,
        )
    elif args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)

    print(f"process {jax.process_index()}/{jax.process_count()}: "
          f"{jax.local_device_count()} local / {jax.device_count()} "
          "global devices", flush=True)

    from pretrain_gnns_tpu.data.synthetic import molecule_dataset
    from pretrain_gnns_tpu.train import pretrain

    # identical synthetic dataset on every process (seeded)
    graphs, _ = molecule_dataset(args.n_graphs, num_tasks=1,
                                 seed=args.seed, mean_atoms=18)
    cfg = pretrain.PretrainConfig(
        objective=args.objective, num_layer=args.num_layer,
        emb_dim=args.emb_dim, batch_size=args.batch_size,
        mask_edge=False, packing="standard", transform_device="batch",
        device_dataset="on", dp_devices=0, scan_steps=4,
        seed=args.seed, epochs=args.epochs,
    )
    res = pretrain.run_pretrain(
        cfg, graphs, log=lambda m: print(m, flush=True),
        epochs=args.epochs,
    )

    if args.out and jax.process_index() == 0:
        import numpy as np
        from jax import tree_util

        leaves = tree_util.tree_flatten_with_path(res["state"].params)[0]
        np.savez(args.out, **{
            tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in leaves
        })
        with open(args.out + ".json", "w") as f:
            json.dump({"losses": [h["loss"] for h in res["history"]],
                       "edges": [h.get("edges") for h in res["history"]]},
                      f)
        print(f"wrote {args.out}", flush=True)
    if args.num_processes > 1:
        multihost.sync("done")
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
