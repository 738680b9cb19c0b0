"""Series algebra and statistics helpers vs the reference implementation."""
import numpy as np
import pytest

import gsum_tpu as gm
from _reference import import_reference

gref = import_reference()

rng = np.random.RandomState(0)


def test_cartesian():
    a, b = np.array([1., 2.]), np.array([3., 4., 5.])
    np.testing.assert_allclose(np.asarray(gm.cartesian(a, b)),
                               gref.cartesian(a, b))


def test_coefficients_partials_roundtrip():
    y = rng.randn(10, 5).cumsum(axis=1)
    ratio = 0.4 + 0.1 * rng.rand(10)
    ref = 1.0 + rng.rand(10)
    orders = np.arange(5)
    c_ours = np.asarray(gm.coefficients(y, ratio, ref, orders))
    c_ref = gref.coefficients(y, ratio, ref, orders)
    np.testing.assert_allclose(c_ours, c_ref, atol=1e-12)
    y_back = np.asarray(gm.partials(c_ours, ratio, ref, orders))
    np.testing.assert_allclose(y_back, y, atol=1e-12)
    np.testing.assert_allclose(gref.partials(c_ref, ratio, ref, orders), y_back,
                               atol=1e-12)


def test_coefficients_validates():
    with pytest.raises(ValueError):
        gm.coefficients(np.ones(5), 0.5)
    with pytest.raises(ValueError):
        gm.coefficients(np.ones((5, 3)), 0.5, orders=np.arange(4))


@pytest.mark.parametrize('start,end,excluded', [
    (0, 4, None), (1, np.inf, None), (2, np.inf, [3]), (0, 6, [1, 5]),
])
def test_geometric_sum(start, end, excluded):
    x = np.array([0.3, 0.5, 0.7])
    ours = np.asarray(gm.geometric_sum(x, start, end, excluded))
    theirs = gref.geometric_sum(x, start, end, excluded)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_geometric_sum_validates():
    with pytest.raises(ValueError):
        gm.geometric_sum(np.array([0.5]), 3, 2)


def test_gaussian_and_rbf():
    X = rng.randn(6, 2)
    np.testing.assert_allclose(np.asarray(gm.gaussian(X, ls=1.7)),
                               gref.gaussian(X, ls=1.7), atol=1e-12)
    np.testing.assert_allclose(np.asarray(gm.rbf(X, ls=1.7)),
                               gref.rbf(X, ls=1.7), atol=1e-12)
    Xp = rng.randn(4, 2)
    np.testing.assert_allclose(np.asarray(gm.rbf(X, Xp, ls=0.9)),
                               gref.rbf(X, Xp, ls=0.9), atol=1e-12)


def test_kl_gauss():
    A = rng.randn(4, 4)
    cov0 = A @ A.T + 4 * np.eye(4)
    B = rng.randn(4, 4)
    cov1 = B @ B.T + 4 * np.eye(4)
    mu0, mu1 = rng.randn(4), rng.randn(4)
    ours = float(gm.kl_gauss(mu0, cov0, mu1, cov1=cov1))
    theirs = float(gref.kl_gauss(mu0, cov0, mu1, cov1=cov1))
    np.testing.assert_allclose(ours, theirs, atol=1e-10)
    chol1 = np.linalg.cholesky(gref.stabilize(cov1))
    ours2 = float(gm.kl_gauss(mu0, cov0, mu1, chol1=chol1))
    np.testing.assert_allclose(ours2, theirs, atol=1e-10)
    with pytest.raises(ValueError):
        gm.kl_gauss(mu0, cov0, mu1)


def test_hpd_vs_reference():
    import scipy.stats as st

    from gsum_tpu import stats as gstats

    # Reference computes on scipy dists; ours on native ones
    ours = gm.hpd(gstats.beta, 0.68, 3.0, 5.0)
    theirs = gref.hpd(st.beta, 0.68, 3.0, 5.0)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)


def test_hpd_pdf_and_median_pdf():
    x = np.linspace(-5, 5, 2001)
    pdf = np.exp(-0.5 * x ** 2) / np.sqrt(2 * np.pi)
    ours = np.asarray(gm.hpd_pdf(pdf, 0.68, x))
    theirs = gref.hpd_pdf(pdf, 0.68, x)
    np.testing.assert_allclose(ours, theirs, atol=1e-8)
    np.testing.assert_allclose(float(gm.median_pdf(pdf, x)),
                               gref.median_pdf(pdf, x), atol=1e-8)


def test_predictions():
    from gsum_tpu import stats as gstats

    d = gstats.norm(loc=np.array([0., 1.]), scale=np.array([1., 2.]))
    mean, interval = gm.predictions(d, dob=[0.68, 0.95])
    assert np.asarray(mean).shape == (2,)
    assert np.asarray(interval).shape == (2, 2, 2)


def test_toy_data_shapes():
    X = np.linspace(0, 1, 9)[:, None]
    orders = np.arange(4)
    y = np.asarray(gm.toy_data(X, orders, ratio=0.4, rng=0))
    assert y.shape == (9, 4)
    assert np.all(np.isfinite(y))


def test_variogram_vs_reference():
    X = rng.rand(15, 1)
    z = rng.randn(2, 15)  # two curves
    bin_bounds = np.linspace(0.05, 0.8, 4)
    ours = gm.VariogramFourthRoot(X, z, bin_bounds)
    theirs = gref.VariogramFourthRoot(X, z, bin_bounds)
    np.testing.assert_allclose(ours.gamma_tilde, theirs.gamma_tilde, atol=1e-10)
    np.testing.assert_allclose(ours.bin_locations, theirs.bin_locations,
                               atol=1e-10)
    np.testing.assert_allclose(ours.bin_counts, theirs.bin_counts)
    g_o, lo_o, up_o = ours.compute()
    g_t, lo_t, up_t = theirs.compute()
    np.testing.assert_allclose(np.asarray(g_o), g_t, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lo_o), lo_t, atol=1e-6)
    np.testing.assert_allclose(np.asarray(up_o), up_t, atol=1e-6)


def test_default_attributes():
    class T:
        def __init__(self):
            self.x = 2
            self._y = 3

        @gm.default_attributes(x='x', y='_y')
        def add(self, x=None, y=None):
            return x + y

    t = T()
    assert t.add() == 5
    assert t.add(10) == 13
    t.x = 20
    assert t.add() == 23


def test_lazy_legacy_decorator():
    """Reference helpers.py:389-413 semantics: cache keyed on the
    y/corr_chol arguments, falling back to instance attributes."""
    calls = []

    class T:
        def __init__(self):
            self.y = np.array([1.0, 2.0])
            self._corr_chol = np.eye(2)

        @gm.lazy
        def total(self, y=None, corr_chol=None):
            calls.append(1)
            return np.sum(y) + np.sum(corr_chol)

    t = T()
    assert t.total() == 5.0
    assert t.total() == 5.0
    assert len(calls) == 1                       # cached
    assert t.total(y=np.array([1.0, 2.0])) == 5.0
    assert len(calls) == 1                       # same y -> still cached
    assert t.total(y=np.array([3.0, 4.0])) == 9.0
    assert len(calls) == 2                       # new y -> recompute


def test_lazy_property():
    calls = []

    class T:
        @gm.lazy_property
        def val(self):
            calls.append(1)
            return 42

    t = T()
    assert t.val == 42
    assert t.val == 42
    assert len(calls) == 1


def test_profiling_utilities(tmp_path):
    import jax.numpy as jnp

    from gsum_tpu import profiling

    assert profiling.flops_lml(100) > 100 ** 3 / 3
    assert profiling.flops_fit(100) > profiling.flops_lml(100)

    import jax

    f = jax.jit(lambda x: jnp.sum(x * x))
    t = profiling.time_fn(f, jnp.ones(64), reps=1, chain=2)
    assert t > 0
    with profiling.trace(str(tmp_path / 'trace')):
        float(f(jnp.ones(64)))
