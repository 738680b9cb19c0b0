"""Native distributions vs scipy.stats / statsmodels MVT."""
import numpy as np
import pytest
import scipy.stats as st

from gsum_tpu import stats as gstats

rng = np.random.RandomState(0)


def test_norm():
    d = gstats.norm(loc=1.5, scale=2.0)
    s = st.norm(loc=1.5, scale=2.0)
    x = np.linspace(-5, 8, 31)
    np.testing.assert_allclose(np.asarray(d.pdf(x)), s.pdf(x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.logpdf(x)), s.logpdf(x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.cdf(x)), s.cdf(x), atol=1e-12)
    q = np.linspace(0.01, 0.99, 21)
    np.testing.assert_allclose(np.asarray(d.ppf(q)), s.ppf(q), atol=1e-10)
    lo, hi = d.interval(0.68)
    slo, shi = s.interval(0.68)
    np.testing.assert_allclose([float(lo), float(hi)], [slo, shi], atol=1e-10)
    np.testing.assert_allclose(float(d.std()), s.std())


@pytest.mark.parametrize('df', [1.0, 2.5, 5.0, 30.0])
def test_t(df):
    d = gstats.t(df=df, loc=0.5, scale=1.3)
    s = st.t(df=df, loc=0.5, scale=1.3)
    x = np.linspace(-6, 7, 27)
    np.testing.assert_allclose(np.asarray(d.pdf(x)), s.pdf(x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.logpdf(x)), s.logpdf(x), atol=1e-10)
    np.testing.assert_allclose(np.asarray(d.cdf(x)), s.cdf(x), atol=1e-12)
    q = np.linspace(0.01, 0.99, 21)
    np.testing.assert_allclose(np.asarray(d.ppf(q)), s.ppf(q), rtol=1e-8,
                               atol=1e-9)
    if df > 2:
        np.testing.assert_allclose(float(d.std()), s.std(), rtol=1e-12)


def test_t_array_params():
    """The pointwise model freezes an (n_points, n_orders) family at once."""
    locs = rng.randn(4, 3)
    scales = 0.5 + rng.rand(4, 3)
    d = gstats.t(df=6.0, loc=locs, scale=scales)
    s = st.t(df=6.0, loc=locs, scale=scales)
    lo, hi = d.interval(0.68)
    slo, shi = s.interval(0.68)
    np.testing.assert_allclose(np.asarray(lo), slo, atol=1e-9)
    np.testing.assert_allclose(np.asarray(hi), shi, atol=1e-9)


@pytest.mark.parametrize('df', [1, 3, 6, 20])
def test_chi2(df):
    d = gstats.chi2(df=df)
    s = st.chi2(df=df)
    x = np.linspace(0.1, 30, 25)
    np.testing.assert_allclose(np.asarray(d.pdf(x)), s.pdf(x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.cdf(x)), s.cdf(x), atol=1e-12)
    q = np.linspace(0.02, 0.98, 13)
    np.testing.assert_allclose(np.asarray(d.ppf(q)), s.ppf(q), rtol=1e-9)


def test_f_dist():
    d = gstats.f(dfn=6, dfd=10, scale=1.5)
    s = st.f(dfn=6, dfd=10, scale=1.5)
    x = np.linspace(0.05, 8, 25)
    np.testing.assert_allclose(np.asarray(d.pdf(x)), s.pdf(x), atol=1e-11)
    np.testing.assert_allclose(np.asarray(d.cdf(x)), s.cdf(x), atol=1e-11)
    q = np.linspace(0.02, 0.98, 13)
    np.testing.assert_allclose(np.asarray(d.ppf(q)), s.ppf(q), rtol=1e-8)
    np.testing.assert_allclose(float(d.median()), s.median(), rtol=1e-8)


def test_beta():
    d = gstats.beta(2.5, 4.0)
    s = st.beta(2.5, 4.0)
    x = np.linspace(0.01, 0.99, 21)
    np.testing.assert_allclose(np.asarray(d.pdf(x)), s.pdf(x), atol=1e-11)
    np.testing.assert_allclose(np.asarray(d.cdf(x)), s.cdf(x), atol=1e-12)
    q = np.linspace(0.02, 0.98, 13)
    np.testing.assert_allclose(np.asarray(d.ppf(q)), s.ppf(q), rtol=1e-9)
    np.testing.assert_allclose(float(d.mean()), s.mean(), rtol=1e-12)
    np.testing.assert_allclose(float(d.std()), s.std(), rtol=1e-12)


def test_binom():
    n, p = 50, 0.37
    d = gstats.binom(n=n, p=p)
    s = st.binom(n=n, p=p)
    k = np.arange(0, n + 1)
    np.testing.assert_allclose(np.asarray(d.pmf(k)), s.pmf(k), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.cdf(k)), s.cdf(k), atol=1e-10)
    q = np.array([0.025, 0.16, 0.5, 0.84, 0.975])
    np.testing.assert_allclose(np.asarray(d.ppf(q)), s.ppf(q))
    lo, hi = d.interval(0.68)
    slo, shi = s.interval(0.68)
    np.testing.assert_allclose([float(lo), float(hi)], [slo, shi])


def test_binom_vector_p():
    n = 30
    p = np.array([0.2, 0.5, 0.8])
    d = gstats.binom(n=n, p=p)
    s = st.binom(n=n, p=p)
    conf = np.atleast_2d([0.68, 0.95]).T
    lo, hi = d.interval(conf)
    slo, shi = s.interval(conf)
    np.testing.assert_allclose(np.asarray(lo), slo)
    np.testing.assert_allclose(np.asarray(hi), shi)


def test_mvn():
    mean = rng.randn(5)
    A = rng.randn(5, 5)
    cov = A @ A.T + 5 * np.eye(5)
    d = gstats.multivariate_normal(mean=mean, cov=cov)
    s = st.multivariate_normal(mean=mean, cov=cov)
    x = rng.randn(7, 5)
    np.testing.assert_allclose(np.asarray(d.logpdf(x)), s.logpdf(x), atol=1e-9)
    samp = np.asarray(d.rvs(20000, random_state=0))
    assert samp.shape == (20000, 5)
    np.testing.assert_allclose(samp.mean(axis=0), mean, atol=0.1)
    np.testing.assert_allclose(np.cov(samp.T), cov, atol=0.3)


def test_mvt():
    mean = rng.randn(4)
    A = rng.randn(4, 4)
    sigma = A @ A.T + 4 * np.eye(4)
    df = 7
    d = gstats.multivariate_t(mean=mean, sigma=sigma, df=df)
    s = st.multivariate_t(loc=mean, shape=sigma, df=df)
    x = rng.randn(6, 4)
    np.testing.assert_allclose(np.asarray(d.logpdf(x)), s.logpdf(x), atol=1e-9)
    samp = np.asarray(d.rvs(40000, random_state=0))
    assert samp.shape == (40000, 4)
    np.testing.assert_allclose(samp.mean(axis=0), mean, atol=0.15)
    np.testing.assert_allclose(np.cov(samp.T), sigma * df / (df - 2), rtol=0.2,
                               atol=0.3)


def test_ppf_out_of_domain_nan():
    d = gstats.beta(3.0, 5.0)
    assert np.isnan(float(d.ppf(1.5)))
    assert np.isnan(float(d.ppf(-0.1)))
    c = gstats.chi2(df=4)
    assert np.isnan(float(c.ppf(1.5)))


def test_rvs_array_params():
    """The module contract: all families accept broadcastable array
    parameters — including .rvs(), which must append the parameter
    broadcast shape the way norm/t do."""
    df = np.array([2.0, 5.0])
    out = np.asarray(gstats.chi2(df).rvs(4, random_state=0))
    assert out.shape == (4, 2) and (out > 0).all()
    out = np.asarray(gstats.f(np.array([2.0, 4.0]), 7.0).rvs(3,
                                                             random_state=1))
    assert out.shape == (3, 2) and (out > 0).all()
    out = np.asarray(gstats.beta(np.array([1.0, 2.0, 3.0]),
                                 2.0).rvs(5, random_state=2))
    assert out.shape == (5, 3) and ((out >= 0) & (out <= 1)).all()
    out = np.asarray(gstats.binom(6, np.array([0.2, 0.8])).rvs(3,
                                                               random_state=3))
    assert out.shape == (3, 2) and ((out >= 0) & (out <= 6)).all()


def test_logpdf_normalizers_stay_on_host(monkeypatch):
    """Parameter-only normalizers of frozen dists built outside jit must
    not touch the device gammaln/betaln: 0-d device transcendentals
    constant-fold at f32 on the target TPU (~1e-7 logpdf error the CPU
    suite cannot see).  Poison the device functions and require the
    log-densities to still evaluate and match scipy."""
    import gsum_tpu.stats as S

    def _boom(*a, **k):
        raise AssertionError("device special-function reached for "
                             "concrete parameters")

    # binom's k-dependent gammaln terms are data terms (array-valued,
    # no folding risk) — check it un-poisoned, but its p-normalizers are
    # covered by the host path
    ks = np.arange(7.0)
    np.testing.assert_allclose(np.asarray(gstats.binom(6, 0.3).logpmf(ks)),
                               st.binom(6, 0.3).logpmf(ks), rtol=1e-11,
                               atol=1e-13)

    for name in ("gammaln", "betaln"):
        monkeypatch.setattr(S, name, _boom, raising=True)

    x = np.linspace(0.1, 3.0, 5)
    np.testing.assert_allclose(np.asarray(gstats.t(3.0, 0.5, 2.0).logpdf(x)),
                               st.t(3.0, 0.5, 2.0).logpdf(x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gstats.chi2(4.0).logpdf(x)),
                               st.chi2(4.0).logpdf(x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gstats.f(3.0, 7.0).logpdf(x)),
                               st.f(3.0, 7.0).logpdf(x), rtol=1e-12)
    xb = np.linspace(0.05, 0.95, 5)
    np.testing.assert_allclose(np.asarray(gstats.beta(2.0, 3.0).logpdf(xb)),
                               st.beta(2.0, 3.0).logpdf(xb), rtol=1e-12)
