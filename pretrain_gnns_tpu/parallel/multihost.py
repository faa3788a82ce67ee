"""Multi-host (multi-process) execution layer.

The reference is strictly single-process (SURVEY.md §2.8); BASELINE.md's
north star demands >=80% edges/s scaling at "1 chip, 1 host, and N>=2
hosts" with gradient collectives riding ICI within a slice and DCN across
hosts. JAX's runtime model for that is SPMD multi-process: every host runs
the SAME program over a global ``jax.sharding.Mesh`` spanning all
processes' devices, feeds only its local devices' shards, and XLA lowers
the per-step collectives (grad psum, sync-BN pmean) onto ICI/DCN.

This module owns the three process-level concerns:

- **bootstrap**: :func:`initialize` wraps ``jax.distributed.initialize``
  (env-var driven — ``PGT_COORDINATOR``/``PGT_NUM_PROCESSES``/
  ``PGT_PROCESS_ID`` — or explicit flags). On CPU it configures the gloo
  collectives backend + N virtual devices per process so the whole layer
  is testable without a pod (SURVEY.md §4d).
- **global-array assembly**: each process packs descriptor columns for
  ITS devices only; :func:`put_col_sharded` stitches the per-process
  slices into one global ``[steps, n_dev_global, ...]`` array
  (``jax.make_array_from_single_device_arrays``), and
  :func:`put_replicated` replicates host values (TrainState, the
  device-resident dataset) onto every device of the mesh.
- **process-0 gating**: :func:`is_main` guards logging/checkpoint IO.

Single-process equivalence: the descriptor pipeline keys its per-batch RNG
by ``(seed, epoch, batch_index)`` (order-independent — see
``DeviceBatchLoader._descriptor``), the epoch plan is a deterministic
function of the seeded shuffle, and the per-device step folds the GLOBAL
axis index into the step rng — so an N-process run executes the identical
step sequence as a 1-process run over the same global device count
(asserted by tests/test_multihost.py).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cpu_devices_per_process: Optional[int] = None,
) -> bool:
    """Bootstrap the JAX distributed runtime. Returns True when a
    multi-process runtime was initialized, False for the (default)
    single-process case.

    Arguments fall back to env vars ``PGT_COORDINATOR``,
    ``PGT_NUM_PROCESSES``, ``PGT_PROCESS_ID``, ``PGT_CPU_DEVICES``; with
    none set this is a no-op, so every CLI can call it unconditionally.
    On TPU pods, ``jax.distributed.initialize()`` with no arguments
    auto-detects the coordinator from the TPU environment — pass
    ``PGT_NUM_PROCESSES=auto`` to request that path.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "PGT_COORDINATOR"
    )
    env_np = os.environ.get("PGT_NUM_PROCESSES")
    if num_processes is None and env_np:
        if env_np == "auto":
            import jax

            jax.distributed.initialize()
            return True
        num_processes = int(env_np)
    if process_id is None and os.environ.get("PGT_PROCESS_ID"):
        process_id = int(os.environ["PGT_PROCESS_ID"])
    if cpu_devices_per_process is None and os.environ.get(
        "PGT_CPU_DEVICES"
    ):
        cpu_devices_per_process = int(os.environ["PGT_CPU_DEVICES"])
    if not num_processes or num_processes <= 1:
        return False
    if coordinator_address is None or process_id is None:
        raise ValueError(
            "multi-process run needs coordinator_address and process_id "
            "(PGT_COORDINATOR / PGT_PROCESS_ID)"
        )

    import jax

    if cpu_devices_per_process:
        # virtual-CPU multi-process (tests / dry runs): per-process device
        # count + the gloo cross-process collectives backend; must be set
        # before the backend initializes
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices_per_process)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main() -> bool:
    """True on the process that owns logging/checkpoint IO."""
    import jax

    return jax.process_index() == 0


def sync(name: str = "barrier") -> None:
    """Cross-process barrier (no-op single-process)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def local_cols(mesh, axis: str = "data") -> Tuple[int, int, int]:
    """(n_global, lo, hi): this process's contiguous column range along a
    1-D mesh's data axis. The epoch-stack descriptor layout assigns batch
    column ``b % n_dev`` to mesh position ``b % n_dev``, so a process owns
    exactly the columns of its own devices."""
    import jax

    devs = list(mesh.devices.reshape(-1))
    mine = [i for i, d in enumerate(devs)
            if d.process_index == jax.process_index()]
    if not mine:
        raise ValueError("mesh contains no local devices")
    lo, hi = mine[0], mine[-1] + 1
    if mine != list(range(lo, hi)):
        raise ValueError(
            "local devices are not contiguous along the mesh data axis; "
            "construct the mesh from jax.devices() (process-major order)"
        )
    return len(devs), lo, hi


def put_replicated(tree: Any, mesh) -> Any:
    """Host pytree (identical on every process) -> fully-replicated global
    arrays on the mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        arrays = [jax.device_put(x, d) for d in mesh.local_devices]
        return jax.make_array_from_single_device_arrays(
            x.shape, sharding, arrays
        )

    return jax.tree_util.tree_map(put, tree)


def put_col_sharded(tree: Any, mesh, lo: int, axis: str = "data") -> Any:
    """Local descriptor stacks ``[steps, n_local, ...]`` (this process's
    columns, starting at global column ``lo``) -> global arrays
    ``[steps, n_dev_global, ...]`` sharded ``P(None, axis)``."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    flat = list(mesh.devices.reshape(-1))
    sharding = NamedSharding(mesh, P(None, axis))

    def put(x):
        x = np.asarray(x)
        gshape = (x.shape[0], len(flat)) + x.shape[2:]
        arrays = [
            jax.device_put(np.ascontiguousarray(x[:, j:j + 1]),
                           flat[lo + j])
            for j in range(x.shape[1])
        ]
        return jax.make_array_from_single_device_arrays(
            gshape, sharding, arrays
        )

    return jax.tree_util.tree_map(put, tree)


def to_host(tree: Any) -> Any:
    """Fully-replicated global arrays -> local numpy (for checkpoint IO
    and trunk export on process 0)."""
    import jax

    return jax.tree_util.tree_map(np.asarray, tree)
