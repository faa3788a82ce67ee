"""Train state pytree shared by all training entry points."""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array  # dropout / objective-sampling key, split per step

    @classmethod
    def create(cls, variables, tx, rng) -> "TrainState":
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            rng=rng,
        )
