"""Parameter initializers matching the reference's torch defaults.

Training-from-scratch quality parity requires matching init *distributions*
(SURVEY.md §7 hard part f): torch ``nn.Linear`` default init is
kaiming_uniform(a=sqrt(5)) on the weight — which reduces to
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — and the same bound for the bias
(torch/nn/modules/linear.py reset_parameters). Embeddings use
xavier_uniform (chem/model.py:33-34, 233-235); PyG's ``glorot`` on the GAT
``att`` tensor uses bound sqrt(6 / (size(-2) + size(-1)))
(chem/model.py:130-132).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
from jax import random
from flax import linen as nn

xavier_uniform = nn.initializers.xavier_uniform()

# Mixed-precision knob (PGT_MODEL_DTYPE):
# - "float32"      reference parity (default).
# - "bfloat16"     dense/MLP matmuls compute in bf16 on the MXU (f32
#                  accumulation), activations stay f32. Profiled fastest on
#                  v5e for the GIN-5/300 workload: the matmul FLOPs halve
#                  while the elementwise/BN chain keeps full precision and
#                  no convert passes are inserted between layers.
# - "bfloat16_act" activations flow in bf16 end-to-end (params, BN stats,
#                  Adam state, losses stay f32). Halves activation HBM
#                  traffic through the SpMM kernels and the BN chain —
#                  the fastest mode on the pretraining workload; the
#                  bench opts in.
_DENSE_DTYPE = os.environ.get("PGT_MODEL_DTYPE", "float32")


def set_compute_dtype(name: str) -> None:
    global _DENSE_DTYPE
    if name not in ("float32", "bfloat16", "bfloat16_act"):
        raise ValueError(name)
    _DENSE_DTYPE = name


def get_compute_dtype() -> str:
    return _DENSE_DTYPE


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """flax Dense kernel is [in, out]; torch default bound = 1/sqrt(in)."""
    bound = 1.0 / math.sqrt(shape[0])
    return random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def pyg_glorot(key, shape, dtype=jnp.float32):
    """PyG inits.glorot: U(-b, b), b = sqrt(6/(shape[-2]+shape[-1]))."""
    bound = math.sqrt(6.0 / (shape[-2] + shape[-1]))
    return random.uniform(key, shape, dtype, -bound, bound)


def embed(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding lookup as a one-hot matmul.

    Forward value is exactly ``jnp.take(table, ids, axis=0)`` (each one-hot
    row selects a single table row; no accumulation). The point is the
    BACKWARD: the VJP of ``take`` is a scatter-add into the tiny table,
    which XLA serializes on TPU (profiled at ~0.25 ms per [6,300] table per
    step — it dominated the GIN train step); the VJP of the one-hot matmul
    is ``one_hot.T @ g`` — a single MXU matmul, microseconds."""
    oh = jax.nn.one_hot(ids, table.shape[0], dtype=table.dtype)
    return oh @ table


def activation_dtype():
    """Dtype activations flow in under the mixed-precision knob."""
    return jnp.bfloat16 if _DENSE_DTYPE == "bfloat16_act" else jnp.float32


def downcast(x: jnp.ndarray) -> jnp.ndarray:
    """Cast an activation to the compute dtype (no-op outside _act mode)."""
    return x.astype(activation_dtype())


class _DenseMixed(nn.Dense):
    """Dense that computes in bf16 but returns float32."""

    @nn.compact
    def __call__(self, x):
        return super().__call__(x).astype(jnp.float32)


class DenseParams(nn.Module):
    """Declares a Dense layer's parameter tree (kernel/bias with the
    torch default inits, identical to :func:`dense`) without running the
    matmul — for fused kernels that consume the weights directly while
    keeping the checkpoint layout unchanged."""

    features: int
    fan_in: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", torch_linear_kernel, (self.fan_in, self.features)
        )
        bias = self.param(
            "bias", torch_linear_bias(self.fan_in), (self.features,)
        )
        return kernel, bias


def dense(features: int, fan_in: int, name: str, use_bias: bool = True):
    """A flax Dense with torch-default init (see module docstring).
    Computation and output dtype follow the mixed-precision knob above."""
    cls = _DenseMixed if _DENSE_DTYPE == "bfloat16" else nn.Dense
    return cls(
        features,
        use_bias=use_bias,
        kernel_init=torch_linear_kernel,
        bias_init=torch_linear_bias(fan_in),
        dtype=None if _DENSE_DTYPE == "float32" else jnp.bfloat16,
        name=name,
    )
