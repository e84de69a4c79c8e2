"""Utility-helper tests (reference ``mogp_emulator/utils.py``)."""

import numpy as np

from mogp_tpu.utils.misc import integer_bisect, k_fold_cross_validation


def test_kfold_partition_properties():
    items = list(range(10))
    seen_val = []
    for train, val in k_fold_cross_validation(items, 3):
        assert sorted(train + val) == items
        assert not set(train) & set(val)
        seen_val.extend(val)
    # every item validates exactly once across folds
    assert sorted(seen_val) == items


def test_kfold_randomise_covers_all():
    np.random.seed(70)
    items = list(range(12))
    seen = []
    for _, val in k_fold_cross_validation(items, 4, randomise=True):
        seen.extend(val)
    assert sorted(seen) == items


def test_kfold_rows_of_matrix():
    X = np.arange(12.0).reshape(6, 2)
    for train, val in k_fold_cross_validation(X, 2):
        assert len(train) + len(val) == 6
        assert np.asarray(train[0]).shape == (2,)


def test_integer_bisect_exact():
    # f crosses zero between 6 and 7
    a, b = integer_bisect((0, 100), lambda n: n - 6)
    assert (a, b) == (6, 7)
    # already-adjacent bracket returned unchanged
    assert integer_bisect((3, 4), lambda n: n - 3) == (3, 4)
    # monotone nonlinear function
    a, b = integer_bisect((1, 1 << 20), lambda n: n * n - 10**10)
    assert a * a <= 10**10 < b * b
    assert b - a == 1
