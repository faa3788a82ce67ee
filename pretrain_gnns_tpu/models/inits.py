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

import jax.numpy as jnp
from jax import random
from flax import linen as nn

xavier_uniform = nn.initializers.xavier_uniform()


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


def dense(features: int, fan_in: int, name: str, use_bias: bool = True):
    """A flax Dense with torch-default init (see module docstring)."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=torch_linear_kernel,
        bias_init=torch_linear_bias(fan_in),
        name=name,
    )
