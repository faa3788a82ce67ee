"""Split policies — index-space re-implementations of the reference splitters.

All functions here return index lists (not dataset objects), decoupling split
logic from storage, and take precomputed scaffold strings instead of SMILES
so the RDKit dependency stays in the offline featurizer. Determinism is
behavior-critical (SURVEY.md §7 hard part c): evaluation sets are defined by
these exact orderings and RNG streams.

- scaffold_split        — chem/splitters.py:27-107 (deterministic greedy)
- random_scaffold_split — chem/splitters.py:109-171 (np.RandomState permute)
- random_split          — chem/splitters.py:173-229 / bio/splitters.py:5-41
                          (python random.Random(seed).shuffle)
- cv_random_split       — chem/splitters.py:232-265 (StratifiedKFold)
- species_split         — bio/splitters.py:43-69
"""

from __future__ import annotations

import random as _pyrandom
from collections import defaultdict
from typing import List, Optional, Sequence, Tuple

import numpy as np

Idx = List[int]


def _filter_task(
    n: int,
    y: Optional[np.ndarray],
    task_idx: Optional[int],
    null_value: float,
) -> np.ndarray:
    """Indices with a non-null label in column task_idx (or all)."""
    if task_idx is None:
        return np.arange(n)
    return np.where(np.asarray(y)[:, task_idx] != null_value)[0]


def scaffold_split(
    scaffolds: Sequence[str],
    y: Optional[np.ndarray] = None,
    task_idx: Optional[int] = None,
    null_value: float = 0.0,
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
    frac_test: float = 0.1,
) -> Tuple[Idx, Idx, Idx]:
    """Deterministic Bemis–Murcko scaffold split (chem/splitters.py:27-107).

    Groups by scaffold string, sorts groups by (size, first index)
    descending, then greedily fills train / valid / test at 80/10/10
    cutoffs measured against the filtered example count.
    """
    np.testing.assert_almost_equal(frac_train + frac_valid + frac_test, 1.0)
    keep = _filter_task(len(scaffolds), y, task_idx, null_value)

    groups = defaultdict(list)
    for i in keep:
        groups[scaffolds[int(i)]].append(int(i))
    groups = {k: sorted(v) for k, v in groups.items()}
    scaffold_sets = [
        v
        for _, v in sorted(
            groups.items(), key=lambda x: (len(x[1]), x[1][0]), reverse=True
        )
    ]

    train_cutoff = frac_train * len(keep)
    valid_cutoff = (frac_train + frac_valid) * len(keep)
    train, valid, test = [], [], []
    for s in scaffold_sets:
        if len(train) + len(s) > train_cutoff:
            if len(train) + len(valid) + len(s) > valid_cutoff:
                test.extend(s)
            else:
                valid.extend(s)
        else:
            train.extend(s)
    assert not set(train) & set(valid) and not set(test) & set(valid)
    return train, valid, test


def random_scaffold_split(
    scaffolds: Sequence[str],
    y: Optional[np.ndarray] = None,
    task_idx: Optional[int] = None,
    null_value: float = 0.0,
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
    frac_test: float = 0.1,
    seed: int = 0,
) -> Tuple[Idx, Idx, Idx]:
    """Seeded scaffold split (chem/splitters.py:109-171): scaffold groups in
    first-seen order, permuted by np.random.RandomState(seed); groups fill
    valid, then test, then train. Cutoffs use the *unfiltered* length
    (reference quirk: ``len(dataset)`` at chem/splitters.py:152-153)."""
    np.testing.assert_almost_equal(frac_train + frac_valid + frac_test, 1.0)
    n_all = len(scaffolds)
    keep = _filter_task(n_all, y, task_idx, null_value)

    groups = defaultdict(list)
    for i in keep:
        groups[scaffolds[int(i)]].append(int(i))
    rng = np.random.RandomState(seed)
    sets = list(groups.values())
    order = rng.permutation(len(sets))
    scaffold_sets = [sets[i] for i in order]

    n_valid = int(np.floor(frac_valid * n_all))
    n_test = int(np.floor(frac_test * n_all))
    train, valid, test = [], [], []
    for s in scaffold_sets:
        if len(valid) + len(s) <= n_valid:
            valid.extend(s)
        elif len(test) + len(s) <= n_test:
            test.extend(s)
        else:
            train.extend(s)
    return train, valid, test


def random_split(
    n: int,
    y: Optional[np.ndarray] = None,
    task_idx: Optional[int] = None,
    null_value: float = 0.0,
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
    frac_test: float = 0.1,
    seed: int = 0,
) -> Tuple[Idx, Idx, Optional[Idx]]:
    """Seeded shuffle split (chem/splitters.py:173-229, bio/splitters.py:5-41).
    Uses python's Mersenne ``random.Random(seed).shuffle`` for stream parity
    with the reference. With task filtering, indices are re-based onto the
    filtered subset (the reference slices the dataset first)."""
    np.testing.assert_almost_equal(frac_train + frac_valid + frac_test, 1.0)
    keep = _filter_task(n, y, task_idx, null_value)
    num = len(keep)
    idx = list(range(num))
    _pyrandom.Random(seed).shuffle(idx)
    a, b = int(frac_train * num), int(frac_train * num) + int(frac_valid * num)
    train = [int(keep[i]) for i in idx[:a]]
    valid = [int(keep[i]) for i in idx[a:b]]
    test = [int(keep[i]) for i in idx[b:]]
    if frac_test == 0:
        test = None
    return train, valid, test


def cv_random_split(
    labels: Sequence[float],
    fold_idx: int = 0,
    n_splits: int = 10,
    seed: int = 0,
) -> Tuple[Idx, Idx]:
    """10-fold stratified CV for mutag/ptc (chem/splitters.py:232-265)."""
    from sklearn.model_selection import StratifiedKFold

    skf = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    folds = list(skf.split(np.zeros(len(labels)), np.asarray(labels)))
    train_idx, val_idx = folds[fold_idx]
    return [int(i) for i in train_idx], [int(i) for i in val_idx]


TRAIN_VALID_SPECIES = (3702, 6239, 511145, 7227, 10090, 4932, 7955)
TEST_SPECIES = (9606,)  # human


def species_split(
    species_ids: np.ndarray,
    train_valid_species=TRAIN_VALID_SPECIES,
    test_species=TEST_SPECIES,
) -> Tuple[Idx, Idx]:
    """bio/splitters.py:43-69: train/valid = 7 species, test = human; every
    example must belong to exactly one side."""
    species_ids = np.asarray(species_ids)
    tv = np.isin(species_ids, train_valid_species)
    te = np.isin(species_ids, test_species)
    assert np.all(tv.astype(int) + te.astype(int) == 1)
    return [int(i) for i in np.where(tv)[0]], [int(i) for i in np.where(te)[0]]
