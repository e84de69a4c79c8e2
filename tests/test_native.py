"""Native host library tests (skipped if the toolchain is unavailable,
mirroring the reference's gpu_usable() gating pattern)."""

import numpy as np
import pytest
import scipy.linalg
from numpy.testing import assert_allclose
from scipy.spatial.distance import pdist

from mogp_tpu.native import (
    maximin_score,
    native_usable,
    potrf_batched,
    trsm_batched,
)

pytestmark = pytest.mark.skipif(
    not native_usable(), reason="native library could not be built"
)

rng = np.random.RandomState(0)


def make_spd(B, n):
    A = rng.randn(B, n, n)
    return A @ np.transpose(A, (0, 2, 1)) + n * np.eye(n)


def test_potrf_batched_matches_scipy():
    A = make_spd(6, 17)
    L, info = potrf_batched(A)
    assert np.all(info == 0)
    for b in range(6):
        assert_allclose(
            L[b], scipy.linalg.cholesky(A[b], lower=True), rtol=1e-10
        )


def test_potrf_batched_reports_failure():
    A = make_spd(3, 8)
    A[1] = -np.eye(8)
    L, info = potrf_batched(A)
    assert info[0] == 0 and info[2] == 0
    assert info[1] == 1  # first leading minor not PD


def test_trsm_batched():
    A = make_spd(4, 12)
    L, _ = potrf_batched(A)
    b = rng.randn(4, 12)
    y = trsm_batched(L, b)
    x = trsm_batched(L, y, transpose=True)
    for k in range(4):
        assert_allclose(x[k], np.linalg.solve(A[k], b[k]), rtol=1e-9)


def test_maximin_score_matches_pdist():
    designs = rng.rand(10, 15, 3)
    scores = maximin_score(designs)
    expected = np.array([np.min(pdist(d)) for d in designs])
    assert_allclose(scores, expected, rtol=1e-12)
