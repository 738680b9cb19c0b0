"""Dataset generators: shapes, reproducibility, and the fixed grid path."""
import numpy as np

import gsum_tpu as gm


def test_make_partial_sums_shapes():
    X = np.linspace(0, 1, 11)[:, None]
    y = np.asarray(gm.make_gaussian_partial_sums(X, orders=4, random_state=0))
    assert y.shape == (11, 4)
    assert np.all(np.isfinite(y))


def test_make_partial_sums_orders_array():
    X = np.linspace(0, 1, 8)[:, None]
    orders = np.array([0, 2, 3])
    y = np.asarray(gm.make_gaussian_partial_sums(X, orders=orders,
                                                 random_state=1))
    assert y.shape == (8, 3)


def test_reproducible():
    X = np.linspace(0, 1, 9)[:, None]
    y1 = np.asarray(gm.make_gaussian_partial_sums(X, random_state=3))
    y2 = np.asarray(gm.make_gaussian_partial_sums(X, random_state=3))
    np.testing.assert_array_equal(y1, y2)
    y3 = np.asarray(gm.make_gaussian_partial_sums(X, random_state=4))
    assert not np.allclose(y1, y3)


def test_uniform():
    X, y = gm.make_gaussian_partial_sums_uniform(n_samples=20, n_features=2,
                                                 orders=3, random_state=0)
    assert np.asarray(X).shape == (20, 2)
    assert np.asarray(y).shape == (20, 3)
    assert np.all((np.asarray(X) >= 0) & (np.asarray(X) <= 1))


def test_on_grid_1d():
    X, y = gm.make_gaussian_partial_sums_on_grid(n_samples=10, orders=3,
                                                 random_state=0)
    assert np.asarray(X).shape == (10, 1)
    assert np.asarray(y).shape == (10, 3)


def test_on_grid_2d_fixed():
    """The reference's n_features > 1 grid is broken (datasets.py:182);
    ours builds the proper Cartesian grid."""
    X, y = gm.make_gaussian_partial_sums_on_grid(n_samples=5, n_features=2,
                                                 orders=3, random_state=0)
    assert np.asarray(X).shape == (25, 2)
    assert np.asarray(y).shape == (25, 3)
    # grid covers [0,1]^2
    np.testing.assert_allclose(np.asarray(X).min(axis=0), [0, 0])
    np.testing.assert_allclose(np.asarray(X).max(axis=0), [1, 1])


def test_partials_statistics():
    """Partial sums converge geometrically toward y_inf."""
    X = np.linspace(0, 1, 30)[:, None]
    y = np.asarray(gm.make_gaussian_partial_sums(X, orders=8, ratio=0.3,
                                                 random_state=0))
    diffs = np.abs(np.diff(y, axis=1)).mean(axis=0)
    # successive corrections shrink roughly like ratio^n
    assert diffs[-1] < diffs[0]
