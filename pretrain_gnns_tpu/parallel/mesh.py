"""Device mesh helpers.

The reference is strictly single-device (SURVEY.md §2.8); scaling here is a
new, first-class subsystem: a ``jax.sharding.Mesh`` with a ``data`` axis for
graph-batch parallelism (gradients psum over ICI/DCN) and, for giant packed
graphs, an ``edge`` axis used by the halo-exchange edge-partition path
(pretrain_gnns_tpu.parallel.halo).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)}"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (per-device) axis of every leaf."""
    return NamedSharding(mesh, P(axis_name))
