"""Splitter behavior tests, following the reference's own assertion style
(chem/splitters.py:268-350 __main__ smoke block)."""

import numpy as np

from pretrain_gnns_tpu.data import splitters


def _scaffolds(n, n_groups, rng):
    return [f"scaf{rng.integers(0, n_groups)}" for _ in range(n)]


def test_scaffold_split_disjoint_and_complete(rng):
    n = 500
    scafs = _scaffolds(n, 40, rng)
    tr, va, te = splitters.scaffold_split(scafs)
    assert sorted(tr + va + te) == list(range(n))
    assert not set(tr) & set(va) and not set(va) & set(te)
    # groups never straddle splits
    for split in (tr, va, te):
        split = set(split)
        for g in set(scafs):
            members = {i for i, s in enumerate(scafs) if s == g}
            assert members <= split or not (members & split)
    # approximately 80/10/10
    assert abs(len(tr) - 0.8 * n) < 0.1 * n


def test_scaffold_split_deterministic(rng):
    scafs = _scaffolds(300, 25, rng)
    assert splitters.scaffold_split(scafs) == splitters.scaffold_split(scafs)


def test_random_scaffold_split_seeded(rng):
    scafs = _scaffolds(300, 25, rng)
    a = splitters.random_scaffold_split(scafs, seed=3)
    b = splitters.random_scaffold_split(scafs, seed=3)
    c = splitters.random_scaffold_split(scafs, seed=4)
    assert a == b and a != c
    tr, va, te = a
    assert sorted(tr + va + te) == list(range(300))


def test_random_split_matches_reference_stream():
    """Must reproduce python random.Random(seed).shuffle exactly — the
    reference's stream (chem/splitters.py:204-206)."""
    import random

    n = 100
    tr, va, te = splitters.random_split(n, seed=7)
    all_idx = list(range(n))
    random.seed(7)
    random.shuffle(all_idx)
    assert tr == all_idx[:80] and va == all_idx[80:90] and te == all_idx[90:]


def test_random_split_task_filter():
    y = np.zeros((50, 3))
    y[:30, 1] = 1.0  # task 1 non-null for first 30
    tr, va, te = splitters.random_split(50, y=y, task_idx=1, seed=0)
    used = set(tr) | set(va) | set(te)
    assert used <= set(range(30)) and len(used) == 30


def test_species_split():
    ids = np.array([9606, 3702, 6239, 9606, 7955])
    tv, te = splitters.species_split(ids)
    assert tv == [1, 2, 4] and te == [0, 3]


def test_cv_random_split():
    labels = [0, 1] * 25
    folds = [splitters.cv_random_split(labels, fold_idx=i) for i in range(10)]
    for tr, va in folds:
        assert sorted(tr + va) == list(range(50))
    all_val = sorted(sum((va for _, va in folds), []))
    assert all_val == list(range(50))  # each example in exactly one fold
