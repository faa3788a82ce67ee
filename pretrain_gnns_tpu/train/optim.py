"""Optimizers — optax equivalents of the reference's torch Adam usage.

Every reference entry point uses ``optim.Adam(lr=1e-3, weight_decay=0)``
(e.g. chem/pretrain_masking.py:134-138); fine-tune builds param groups with
an ``lr_scale`` on the pooling/head modules (chem/finetune.py:180-185).
torch Adam and optax.adam share the same update rule and defaults
(b1=0.9, b2=0.999, eps=1e-8), so streams match given identical grads.
"""

from __future__ import annotations

from typing import Any, Dict

import optax


def adam(lr: float = 1e-3, weight_decay: float = 0.0):
    if weight_decay:
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=weight_decay)
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def finetune_adam(lr: float = 1e-3, lr_scale: float = 1.0,
                  weight_decay: float = 0.0):
    """Adam with the trunk at ``lr`` and everything else (pool gate / head)
    at ``lr * lr_scale`` (chem/finetune.py:180-185)."""
    if lr_scale == 1.0:
        return adam(lr, weight_decay)

    def label_fn(params: Dict[str, Any]):
        return {k: ("trunk" if k == "gnn" else "head") for k in params}

    return optax.multi_transform(
        {"trunk": adam(lr, weight_decay),
         "head": adam(lr * lr_scale, weight_decay)},
        label_fn,
    )
