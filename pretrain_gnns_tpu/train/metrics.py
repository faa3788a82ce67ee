"""Evaluation metrics (host-side numpy, like the reference's sklearn calls).

- chem protocol (chem/finetune.py:49-77): per-task ROC-AUC in {-1,0,+1}
  label coding, skipping missing entries (0) and tasks lacking both classes;
  the reported metric is the mean over surviving tasks.
- bio protocol (bio/finetune.py:40-65): per-task AUC array over {0,1}
  labels with NaN for degenerate tasks.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def roc_auc(y_true01: np.ndarray, scores: np.ndarray) -> float:
    """Rank-based ROC-AUC (equivalent to sklearn.roc_auc_score; tie-aware
    via midranks). Kept dependency-free for portability."""
    y = np.asarray(y_true01).astype(bool)
    s = np.asarray(scores, np.float64)
    n_pos, n_neg = int(y.sum()), int((~y).sum())
    if n_pos == 0 or n_neg == 0:
        raise ValueError("need both classes")
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), np.float64)
    sorted_s = s[order]
    i = 0
    r = 1.0
    while i < len(s):
        j = i
        while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        ranks[order[i: j + 1]] = 0.5 * (r + r + (j - i))
        r += j - i + 1
        i = j + 1
    return float(
        (ranks[y].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    )


def chem_mean_auc(
    y: np.ndarray,  # [G, T] in {-1, 0, +1}
    scores: np.ndarray,  # [G, T]
) -> float:
    """chem/finetune.py:63-77 exactly: a task contributes iff it has at
    least one positive and one negative label; AUC computed over its
    non-missing entries; result = mean over contributing tasks."""
    aucs: List[float] = []
    for t in range(y.shape[1]):
        col = y[:, t]
        if (col == 1).any() and (col == -1).any():
            valid = col != 0
            aucs.append(roc_auc((col[valid] + 1) / 2, scores[valid, t]))
    if not aucs:
        return float("nan")
    return float(np.mean(aucs))


def bio_auc_array(
    y01: np.ndarray,  # [G, T] in {0, 1}
    scores: np.ndarray,  # [G, T]
) -> np.ndarray:
    """bio/finetune.py:40-65: per-task AUC, NaN where a class is absent."""
    out = np.full(y01.shape[1], np.nan)
    for t in range(y01.shape[1]):
        col = y01[:, t]
        if (col == 1).any() and (col == 0).any():
            out[t] = roc_auc(col, scores[:, t])
    return out


def accuracy_from_scores(y: np.ndarray, scores: np.ndarray) -> float:
    """mutag/ptc metric: accuracy of sign(score) vs {-1,+1} labels
    (chem/finetune_mutag_ptc.py:65-78)."""
    pred = np.where(scores > 0, 1.0, -1.0)
    return float((pred == y).mean())
