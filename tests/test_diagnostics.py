"""Diagnostic numerics vs the reference; GraphicalDiagnostic smoke tests."""
import matplotlib

matplotlib.use('Agg')

import numpy as np
import pytest

import gsum_tpu as gm
from _reference import import_reference

gref = import_reference()

rng = np.random.RandomState(5)
N = 10
mean = rng.randn(N)
A = rng.randn(N, N)
cov = A @ A.T + N * np.eye(N)
data = np.stack([mean + 0.5 * rng.randn(N) for _ in range(3)], axis=1)


@pytest.fixture(scope='module', params=[None, 8], ids=['gauss', 'student'])
def diag_pair(request):
    df = request.param
    ours = gm.Diagnostic(mean=mean, cov=cov, df=df)
    theirs = gref.Diagnostic(mean=mean, cov=cov, df=df)
    return ours, theirs


def test_individual_errors(diag_pair):
    o, r = diag_pair
    np.testing.assert_allclose(np.asarray(o.individual_errors(data)),
                               r.individual_errors(data), atol=1e-10)


def test_cholesky_errors(diag_pair):
    o, r = diag_pair
    np.testing.assert_allclose(np.asarray(o.cholesky_errors(data)),
                               r.cholesky_errors(data), atol=1e-9)


def test_pivoted_cholesky_errors(diag_pair):
    o, r = diag_pair
    np.testing.assert_allclose(np.asarray(o.pivoted_cholesky_errors(data)),
                               r.pivoted_cholesky_errors(data), atol=1e-8)


def test_eigen_errors(diag_pair):
    o, r = diag_pair
    np.testing.assert_allclose(np.asarray(o.eigen_errors(data)),
                               r.eigen_errors(data), atol=1e-8)


def test_md_squared(diag_pair):
    o, r = diag_pair
    np.testing.assert_allclose(np.asarray(o.md_squared(data)),
                               r.md_squared(data), atol=1e-9)


def test_kl(diag_pair):
    """Checked against the closed-form KL, not the reference: the
    reference's Diagnostic.kl takes log(diag(cov)) where log(diag(chol))
    is required (diagnostics.py:145), so its log-det term is wrong.  The
    reference's helpers.kl_gauss has the correct formula, so that is the
    oracle here."""
    o, r = diag_pair
    m0 = rng.randn(N)
    B = rng.randn(N, N)
    c0 = B @ B.T + N * np.eye(N)
    expected = float(gref.kl_gauss(m0, c0, mean, cov1=cov))
    # kl_gauss stabilizes cov with 1e-5 jitter; allow for that difference
    np.testing.assert_allclose(float(np.asarray(o.kl(m0, c0))), expected,
                               rtol=1e-4)
    # exact check against the formula with no jitter
    import scipy.linalg as sla

    chol1 = np.linalg.cholesky(cov)
    tr = np.trace(sla.cho_solve((chol1, True), c0))
    dist = float(r.md_squared(m0))
    logs = 2 * np.sum(np.log(np.diag(chol1))) - np.linalg.slogdet(c0)[-1]
    np.testing.assert_allclose(float(np.asarray(o.kl(m0, c0))),
                               0.5 * (tr + dist - N + logs), rtol=1e-9)


def test_credible_interval(diag_pair):
    o, r = diag_pair
    intervals = np.linspace(0.1, 0.9, 9)
    np.testing.assert_allclose(np.asarray(o.credible_interval(data, intervals)),
                               r.credible_interval(data, intervals), atol=1e-10)
    # 1d data == single-curve 2d (the reference's 1d branch is degenerate:
    # apply_along_axis over length-1 rows, diagnostics.py:167-170, unused by
    # its own plotting code)
    np.testing.assert_allclose(
        np.asarray(o.credible_interval(data[:, 0], intervals)),
        np.asarray(o.credible_interval(data[:, :1], intervals))[0], atol=1e-12)


def test_samples_shape(diag_pair):
    o, _ = diag_pair
    s = np.asarray(o.samples(100))
    assert s.shape == (N, 100)
    assert np.all(np.isfinite(s))


def test_samples_distribution():
    o = gm.Diagnostic(mean=mean, cov=cov)
    s = np.asarray(o.samples(20000))
    np.testing.assert_allclose(s.mean(axis=1), mean, atol=0.12)
    np.testing.assert_allclose(np.cov(s), cov, atol=0.5)


def test_variogram_static(diag_pair):
    o, _ = diag_pair
    X = rng.rand(N, 1)
    bounds = np.linspace(0.05, 0.9, 4)
    v, loc, gamma, lower, upper = o.variogram(X, data.T, bounds)
    assert np.asarray(gamma).shape[0] == len(bounds) + 1


# ----------------------------------------------------------------------
# GraphicalDiagnostic: smoke tests that each panel renders
# ----------------------------------------------------------------------
@pytest.fixture(scope='module')
def graphical():
    return gm.GraphicalDiagnostic(data, mean, cov, nref=50)


def test_plots_render(graphical):
    import matplotlib.pyplot as plt

    g = graphical
    g.individual_errors()
    g.cholesky_errors()
    g.pivoted_cholesky_errors()
    g.eigen_errors()
    g.individual_errors_qq()
    g.cholesky_errors_qq()
    g.md_squared()
    g.md_squared(type='box')
    g.credible_interval(np.linspace(0, 1, 11), [0.68, 0.95])
    plt.close('all')


def test_plotzilla_and_essentials(graphical):
    import matplotlib.pyplot as plt

    fig, axes = graphical.plotzilla(np.linspace(0, 1, N)[:, None])
    plt.close(fig)
    fig, axes = graphical.essentials()
    plt.close(fig)
    fig, axes = graphical.essentials(bare=True)
    plt.close(fig)


def test_variogram_plot(graphical):
    import matplotlib.pyplot as plt

    ax = graphical.variogram(np.linspace(0, 1, N)[:, None], n_bins=6)
    # exactly n_bins points per curve: a bound placed exactly at d.max()
    # used to push the extreme pair into a meaningless 7th one-pair bin
    assert all(len(ln.get_xdata()) == 6 for ln in ax.lines)
    plt.close('all')


def test_kl_plot_refits():
    import matplotlib.pyplot as plt

    g = gm.GraphicalDiagnostic(data, mean, cov, nref=5)
    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(0.3, 'fixed'), nugget=1e-8)
    X = np.linspace(0, 1, N)[:, None]
    g.kl(X, gp)
    plt.close('all')


# ----------------------------------------------------------------------
# Numeric assertions on the band computations behind the plots (r1
# verdict: QQ/coverage bands need numbers, not just "it draws")
# ----------------------------------------------------------------------
def test_qq_band_numerics(graphical):
    """qq_band_data must equal an independent numpy recomputation of the
    simulation envelope: sort whitened draws within each draw, then take
    pointwise quantiles of each order statistic across draws."""
    import scipy.stats as st

    g = graphical
    theo_q, sorted_data, bands = g.qq_band_data('cholesky', (0.68, 0.95))

    Nn = g.data.shape[0]
    probs = (np.arange(1, Nn + 1) - 0.5) / Nn
    np.testing.assert_allclose(theo_q, st.norm.ppf(probs), atol=1e-9)

    errs_data = np.asarray(g.diagnostic.cholesky_errors(g.data))
    np.testing.assert_allclose(sorted_data, np.sort(errs_data, axis=0),
                               atol=1e-12)

    errs_ref = np.sort(np.asarray(g.diagnostic.cholesky_errors(g.samples)),
                       axis=0)
    for (lo, hi), p in zip(bands, (0.68, 0.95)):
        np.testing.assert_allclose(
            lo, np.quantile(errs_ref, (1 - p) / 2, axis=1), atol=1e-7)
        np.testing.assert_allclose(
            hi, np.quantile(errs_ref, (1 + p) / 2, axis=1), atol=1e-7)
        assert np.all(hi >= lo)


def test_coverage_band_numerics(graphical):
    """coverage_band_data must equal the quantiles of the reference draws'
    empirical coverage, and the data coverage must match an independent
    pointwise-interval count."""
    import scipy.stats as st

    g = graphical
    intervals = np.linspace(0.1, 0.9, 5)
    data_cov, bands = g.coverage_band_data(intervals, (0.68,))

    # independent recomputation of the data coverage with scipy intervals
    sd = np.sqrt(np.diag(cov))
    lo, hi = st.norm.interval(intervals[:, None], loc=mean[None, :],
                              scale=sd[None, :])
    for ci, curve in enumerate(np.asarray(g.data).T):
        want = np.mean((lo < curve[None, :]) & (curve[None, :] < hi), axis=1)
        np.testing.assert_allclose(data_cov[ci], want, atol=1e-12)

    ref_cov = np.asarray(g.diagnostic.credible_interval(g.samples, intervals))
    (blo, bhi), = bands
    np.testing.assert_allclose(blo, np.quantile(ref_cov, 0.16, axis=0),
                               atol=1e-7)
    np.testing.assert_allclose(bhi, np.quantile(ref_cov, 0.84, axis=0),
                               atol=1e-7)


def test_md_box_and_violin_render(graphical):
    import matplotlib.pyplot as plt

    graphical.md_squared(type='violin')
    graphical.plotzilla(np.linspace(0, 1, N)[:, None],
                        gp=gm.ConjugateGaussianProcess(
                            kernel=gm.RBF(0.3, 'fixed'), nugget=1e-8))
    plt.close('all')


# ----------------------------------------------------------------------
# Batched KL diagnostic (r2 verdict #5): the nref reference-draw refits
# run as device batches; parity against the per-draw refit loop.
# ----------------------------------------------------------------------
def test_kl_batched_matches_loop_fixed_kernel():
    """Fixed kernel → the shared-factorization closed-form path; must
    reproduce the refit loop exactly (same conjugate updates)."""
    g = gm.GraphicalDiagnostic(data, mean, cov, nref=6)
    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(0.3, 'fixed'),
                                     nugget=1e-8)
    X = np.linspace(0, 1, N)[:, None]
    for predict in (False, True):
        d_b, r_b = g.kl_data(X, gp, predict=predict, engine='batched')
        d_l, r_l = g.kl_data(X, gp, predict=predict, engine='loop')
        np.testing.assert_allclose(d_b, d_l, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(r_b, r_l, rtol=1e-8, atol=1e-10)
    # 'auto' picks the batched path for this gp
    assert g._kl_batchable(gp)


def test_kl_batched_matches_loop_free_kernel():
    """Free kernel → one lockstep batched MAP fit; the optima agree with
    scipy's per-fit L-BFGS to optimizer tolerance."""
    g = gm.GraphicalDiagnostic(data, mean, cov, nref=4)
    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(0.5, (1e-2, 1e2)),
                                     nugget=1e-8)
    X = np.linspace(0, 1, N)[:, None]
    d_b, r_b = g.kl_data(X, gp, engine='batched')
    d_l, r_l = g.kl_data(X, gp, engine='loop')
    # KL values are O(1-100); optimizer-path differences show up in the
    # 4th-5th significant digit of theta, so compare loosely but tightly
    # enough to catch a wrong fit/evaluation
    np.testing.assert_allclose(d_b, d_l, rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(r_b, r_l, rtol=2e-2, atol=1e-3)


def test_kl_batched_rejects_unbatchable():
    g = gm.GraphicalDiagnostic(data, mean, cov, nref=3)
    tp = gm.ConjugateStudentProcess(kernel=gm.RBF(0.3, 'fixed'))
    X = np.linspace(0, 1, N)[:, None]
    with pytest.raises(ValueError):
        g.kl_data(X, tp, engine='batched')


def test_kl_batched_optimizer_none_free_kernel():
    """optimizer=None with FREE kernel parameters routes to the shared-
    factorization closed-form path; theta must broadcast to the kernel's
    actual (non-empty) theta, not an empty placeholder (which crashed
    value_fn with an out-of-bounds index)."""
    g = gm.GraphicalDiagnostic(data, mean, cov, nref=4)
    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(0.5, (1e-2, 1e2)),
                                     optimizer=None, nugget=1e-8)
    X = np.linspace(0, 1, N)[:, None]
    for predict in (False, True):
        d_b, r_b = g.kl_data(X, gp, predict=predict, engine='batched')
        d_l, r_l = g.kl_data(X, gp, predict=predict, engine='loop')
        np.testing.assert_allclose(d_b, d_l, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(r_b, r_l, rtol=1e-8, atol=1e-10)
