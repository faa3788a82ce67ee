"""Pallas TPU kernel for the gather→add→segment-sum message-passing hot loop.

Placeholder dispatch point for milestone (iii) (SURVEY.md §7 build order):
returns None until the kernel lands, which makes ``spmm.gather_scatter``
fall back to the XLA path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def gather_scatter_add(
    x, edge_emb, senders, receivers, edge_mask, num_nodes, edge_weight=None
) -> Optional[jnp.ndarray]:
    return None
