"""Masked BatchNorm — torch ``BatchNorm1d`` semantics over valid rows only.

The reference normalizes node activations with ``BatchNorm1d``
(chem/model.py:250-252, 269; bio GIN's in-MLP BN at bio/model.py:24). Under
static-shape padding, naive BN would fold garbage padded rows into the batch
statistics, so statistics here are computed over ``mask``-valid rows only
(SURVEY.md §7 hard part a).

Exact torch semantics reproduced:
- train: normalize by biased variance of the current batch;
- running stats: ``running = (1 - momentum) * running + momentum * stat``
  with the *unbiased* variance (n/(n-1)) entering ``running_var``;
- eval: normalize by running stats. eps = 1e-5, momentum = 0.1.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [N, F]
        mask: Optional[jnp.ndarray],  # [N] bool; None = all valid
        use_running_average: bool,
    ) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features)
        )

        in_dtype = x.dtype
        xf = x.astype(jnp.float32)  # statistics always in f32
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                n = jnp.asarray(xf.shape[0], jnp.float32)
                mean = jnp.mean(xf, axis=0)
                var = jnp.mean(jnp.square(xf - mean), axis=0)
            else:
                m = mask.astype(jnp.float32)[:, None]
                n = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xf * m, axis=0) / n
                var = jnp.sum(jnp.square(xf - mean) * m, axis=0) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value
                    + self.momentum * unbiased
                )

        y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (y * scale + bias).astype(in_dtype)
