"""Loss primitives shared by the training objectives.

Pure functions over logits/labels/masks; all reductions respect validity
masks so padded graph/node/edge slots never contribute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy on logits (torch
    BCEWithLogitsLoss(reduction="none"); numerically stable form).
    Always evaluated in f32 (mixed-precision models emit bf16 logits)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def masked_task_bce(
    logits: jnp.ndarray,  # [G, T]
    y: jnp.ndarray,  # [G, T] labels in {-1, 0, +1}, 0 = missing
    graph_mask: jnp.ndarray,  # [G] bool
) -> jnp.ndarray:
    """The reference's masked multi-task BCE (chem/pretrain_supervised.py:29-43,
    chem/finetune.py:35-46): valid entries are y^2 > 0, target = (y+1)/2,
    loss = sum(valid losses) / count(valid)."""
    is_valid = (jnp.square(y) > 0) & graph_mask[:, None]
    target = (y + 1.0) / 2.0
    loss_mat = bce_with_logits(logits, target)
    denom = jnp.maximum(jnp.sum(is_valid), 1)
    return jnp.sum(jnp.where(is_valid, loss_mat, 0.0)) / denom


def plain_bce(
    logits: jnp.ndarray,  # [G, T]
    y01: jnp.ndarray,  # [G, T] labels in {0, 1}
    graph_mask: jnp.ndarray,  # [G] bool
) -> jnp.ndarray:
    """bio fine-tune / supervised-pretrain BCE over all entries
    (bio/finetune.py:25-37, bio/pretrain_supervised.py:29-42): mean over
    every (graph, task) cell of valid graphs."""
    loss_mat = bce_with_logits(logits, y01)
    m = graph_mask[:, None].astype(loss_mat.dtype)
    denom = jnp.maximum(jnp.sum(m) * y01.shape[1], 1.0)
    return jnp.sum(loss_mat * m) / denom


def masked_softmax_xent(
    logits: jnp.ndarray,  # [K, C]
    labels: jnp.ndarray,  # [K] int
    mask: jnp.ndarray,  # [K] bool
) -> jnp.ndarray:
    """Cross-entropy averaged over valid rows (torch CrossEntropyLoss
    default mean reduction; used by masking pretrain heads,
    chem/pretrain_masking.py:48-64)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0] - logz
    m = mask.astype(ll.dtype)
    return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)


def sign_accuracy(
    pos_pred: jnp.ndarray, neg_pred: jnp.ndarray,
    pos_mask: jnp.ndarray, neg_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Contrastive objectives' in-loop metric: fraction of positive scores
    > 0 and negative scores < 0 (chem/pretrain_contextpred.py:99-100)."""
    pm = pos_mask.astype(jnp.float32)
    nm = neg_mask.astype(jnp.float32)
    correct = jnp.sum((pos_pred > 0) * pm) + jnp.sum((neg_pred < 0) * nm)
    return correct / jnp.maximum(jnp.sum(pm) + jnp.sum(nm), 1.0)
