"""Native library tests (built in-tree; falls back to numpy when absent)."""

import numpy as np
import pytest

from epsilon_tpu import native
from epsilon_tpu.ops.prox.tv1d import tv1d_exact_numpy


def test_native_built():
    # the build step runs in CI/setup; if the lib is missing the fallback
    # paths still work, but in this repo we build it in-tree.
    assert native.available()


@pytest.mark.parametrize("trial", range(4))
def test_tv1d_matches_numpy(trial):
    rng = np.random.RandomState(trial)
    n = 200
    y = np.cumsum(rng.randn(n))
    lam = 10.0 ** rng.uniform(-1.5, 0.7)
    np.testing.assert_allclose(native.tv1d_prox(y, lam),
                               tv1d_exact_numpy(y, lam), atol=1e-10)


def test_tv1d_batch(rng):
    Y = np.cumsum(rng.randn(5, 64), axis=1)
    lams = np.abs(rng.randn(5)) + 0.1
    X = native.tv1d_prox_batch(Y, lams)
    for i in range(5):
        np.testing.assert_allclose(X[i], tv1d_exact_numpy(Y[i], lams[i]),
                                   atol=1e-10)


def test_min_fill_order(rng):
    if not native.available():
        pytest.skip("native lib not built")
    # diagonal-heavy structure: order must put cheap pivots first-ish and be
    # a permutation
    n = 5
    nnz = np.array([[10, 0, 0, 2, 0],
                    [0, 5, 1, 0, 0],
                    [0, 1, 8, 0, 0],
                    [2, 0, 0, 50, 3],
                    [0, 0, 0, 3, 100]], dtype=np.int64)
    dims = np.array([10, 5, 8, 50, 100], dtype=np.int64)
    order = native.min_fill_order(nnz, dims)
    assert sorted(order.tolist()) == list(range(n))
