"""K-fold split persistence, compatible with the reference's committed folds.

Semantics of reference DataLoader/misc.py:24-74: shuffle with a pinned numpy
seed (1357 for LiTS), cut k equal folds, distribute the remainder one-per-fold,
persist as "Fold i: a b c" lines, and always re-read from the file when it
exists so splits are stable across runs/machines.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

LITS_SEED = 1357  # reference Liver/input_pipeline_g.py:187


def random_split_k_fold(items: List, k: int, seed: Optional[int] = None) -> List[List]:
    """Seeded-shuffle k-way split.  NB: the shuffle MUST go through the
    legacy global np.random stream under `seed` — that exact stream defines
    the reference's committed splits (semantics of reference misc.py:24-43,
    pinned by tests/test_golden.py::test_kfold_generator_matches_reference).
    The caller's global RNG state is preserved."""
    shuffled = list(items)
    saved_state = np.random.get_state()
    try:
        np.random.seed(seed)
        np.random.shuffle(shuffled)
    finally:
        np.random.set_state(saved_state)

    base = len(shuffled) // k
    folds = [shuffled[i * base:(i + 1) * base] for i in range(k)]
    for i, leftover in enumerate(shuffled[k * base:]):
        folds[i].append(leftover)
    return folds


def read_or_create_k_folds(path, items: Sequence, k_split: Optional[int] = None,
                           seed: Optional[int] = None) -> List[List[str]]:
    path = Path(path)
    if path.exists():
        k_folds = []
        with path.open() as f:
            for line in f:
                # .split(" ") on an empty fold yields [''] — filter so a
                # fold with fewer cases than k parses as empty, not as a
                # bogus PID (crashes int('') downstream)
                k_folds.append(
                    [p for p in line[line.find(":") + 1:].strip().split(" ")
                     if p])
        return k_folds

    if not isinstance(k_split, int) or k_split < 1:
        raise ValueError(f"Need positive integer k_split, got {k_split}")
    k_folds = random_split_k_fold(list(items), k_split, seed) if k_split > 1 else [list(items)]
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w") as f:
        for i, fold in enumerate(k_folds):
            f.write("Fold %d:" % i + " ".join(str(x) for x in fold) + "\n")
    return [[str(x) for x in fold] for fold in k_folds]


def train_test_split(k_folds: List[List[str]], test_fold: int):
    """Train = all folds except test_fold (reference input_pipeline_g.py:182-198)."""
    if not 0 <= test_fold < len(k_folds):
        raise ValueError(f"test_fold {test_fold} out of range for {len(k_folds)} folds")
    test = list(k_folds[test_fold])
    train: List[str] = []
    for i, fold in enumerate(k_folds):
        if i != test_fold:
            train.extend(fold)
    return train, test
