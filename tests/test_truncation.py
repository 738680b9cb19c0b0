"""TruncationGP / TruncationTP / TruncationPointwise vs the reference."""
import numpy as np
import pytest

import gsum_tpu as gm
from _reference import import_reference

gref = import_reference()
sk = pytest.importorskip('sklearn.gaussian_process.kernels')

# Toy EFT-like data: partial sums from known coefficients
rng = np.random.RandomState(42)
N = 12
X = np.linspace(0.1, 1.0, N)[:, None]
orders = np.arange(5)
ratio_val = 0.45
ref_val = 2.0
coeffs_true = np.asarray(gm.generate_coefficients(X, size=len(orders), rng=3)).T
y_data = np.asarray(gm.partials(coeffs_true, ratio_val, ref_val, orders))

PRIORS = dict(center=0, disp=0, df=3, scale=1.0)


def make_trunc_pair(cls_name, **kw):
    # ls = 0.25 keeps the 12-point correlation matrix well-conditioned, so
    # LAPACK-vs-XLA Cholesky differences stay at machine precision instead
    # of being amplified by cond(R)
    ko, kr = gm.RBF(0.25, 'fixed'), sk.RBF(0.25, 'fixed')
    params = {**PRIORS, **kw}
    ours = getattr(gm, cls_name)(kernel=ko, ratio=ratio_val, ref=ref_val, **params)
    theirs = getattr(gref, cls_name)(kernel=kr, ratio=ratio_val, ref=ref_val, **params)
    return ours, theirs


@pytest.mark.parametrize('cls', ['TruncationGP', 'TruncationTP'])
def test_truncation_fit_coeffs(cls):
    t_o, t_r = make_trunc_pair(cls)
    t_o.fit(X, y_data, orders=orders)
    t_r.fit(X, y_data, orders=orders)
    np.testing.assert_allclose(np.asarray(t_o.coeffs_), t_r.coeffs_, atol=1e-10)
    np.testing.assert_allclose(np.asarray(t_o.coeffs_process.scale_),
                               np.asarray(t_r.coeffs_process.scale_), atol=1e-9)


KIND_CASES = [
    ('TruncationGP', 'both'), ('TruncationGP', 'interp'),
    ('TruncationGP', 'trunc'),
    # TruncationTP only for kind='both': the reference forgets to forward
    # `kind` to super().predict (models.py:1528-1531), so its 'interp'/
    # 'trunc' outputs mix the 'both' prediction with a kind-specific
    # correction; we fix that, so only 'both' is comparable.
    ('TruncationTP', 'both'),
]


@pytest.mark.parametrize('cls,kind', KIND_CASES)
def test_truncation_predict_parity(cls, kind):
    t_o, t_r = make_trunc_pair(cls)
    t_o.fit(X, y_data, orders=orders)
    t_r.fit(X, y_data, orders=orders)
    Xnew = np.linspace(0.15, 0.95, 7)[:, None]
    m_o, s_o = t_o.predict(Xnew, order=3, return_std=True, kind=kind)
    m_r, s_r = t_r.predict(Xnew, order=3, return_std=True, kind=kind)
    np.testing.assert_allclose(np.asarray(m_o), np.asarray(m_r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(s_o), np.asarray(s_r), atol=1e-8)


@pytest.mark.parametrize('cls', ['TruncationGP', 'TruncationTP'])
def test_truncation_predict_cov_parity(cls):
    t_o, t_r = make_trunc_pair(cls)
    t_o.fit(X, y_data, orders=orders)
    t_r.fit(X, y_data, orders=orders)
    Xnew = np.linspace(0.15, 0.95, 7)[:, None]
    m_o, c_o = t_o.predict(Xnew, order=2, return_cov=True)
    m_r, c_r = t_r.predict(Xnew, order=2, return_cov=True)
    np.testing.assert_allclose(np.asarray(m_o), np.asarray(m_r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(c_o), np.asarray(c_r), atol=1e-8)


def test_truncation_mean_cov_basis():
    t_o, t_r = make_trunc_pair('TruncationGP')
    t_o.fit(X, y_data, orders=orders)
    t_r.fit(X, y_data, orders=orders)
    for start, end in [(0, 3), (4, np.inf), (0, np.inf)]:
        np.testing.assert_allclose(np.asarray(t_o.mean(X, start, end)),
                                   t_r.mean(X, start=start, end=end), atol=1e-9)
        np.testing.assert_allclose(np.asarray(t_o.cov(X, start=start, end=end)),
                                   t_r.cov(X, start=start, end=end), atol=1e-9)
        np.testing.assert_allclose(np.asarray(t_o.basis(X, start, end)),
                                   t_r.basis(X, start=start, end=end), atol=1e-9)


def test_truncation_lml_parity():
    t_o, t_r = make_trunc_pair('TruncationGP')
    t_o.fit(X, y_data, orders=orders)
    t_r.fit(X, y_data, orders=orders)
    lo = float(np.asarray(t_o.log_marginal_likelihood(np.array([]))))
    lr = float(t_r.log_marginal_likelihood(np.array([])))
    np.testing.assert_allclose(lo, lr, rtol=1e-9)


def test_truncation_excluded_orders():
    t_o, t_r = make_trunc_pair('TruncationGP', excluded=[1])
    t_o.fit(X, y_data, orders=orders)
    t_r.fit(X, y_data, orders=orders)
    np.testing.assert_allclose(np.asarray(t_o.coeffs_), t_r.coeffs_, atol=1e-10)
    Xnew = np.linspace(0.15, 0.95, 7)[:, None]
    m_o, s_o = t_o.predict(Xnew, order=3, return_std=True)
    m_r, s_r = t_r.predict(Xnew, order=3, return_std=True)
    np.testing.assert_allclose(np.asarray(m_o), np.asarray(m_r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(s_o), np.asarray(s_r), atol=1e-8)


def test_truncation_constrained():
    """Truncation error constrained to vanish at dX (symmetry constraint)."""
    dX = np.array([[0.1]])
    dy = np.array([0.0])
    t_o, t_r = make_trunc_pair('TruncationGP')
    t_o.fit(X, y_data, orders=orders, dX=dX, dy=dy)
    t_r.fit(X, y_data, orders=orders, dX=dX, dy=dy)
    Xnew = np.linspace(0.15, 0.95, 7)[:, None]
    m_o, s_o = t_o.predict(Xnew, order=3, return_std=True, kind='trunc')
    m_r, s_r = t_r.predict(Xnew, order=3, return_std=True, kind='trunc')
    np.testing.assert_allclose(np.asarray(m_o), np.asarray(m_r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(s_o), np.asarray(s_r), atol=1e-8)


def test_truncation_unfitted_underlying():
    t_o, t_r = make_trunc_pair('TruncationGP', df=5)
    m_o, s_o = t_o.predict(X, order=2, return_std=True)
    m_r, s_r = t_r.predict(X, order=2, return_std=True)
    np.testing.assert_allclose(np.asarray(m_o), np.asarray(m_r), atol=1e-10)
    np.testing.assert_allclose(np.asarray(s_o), np.asarray(s_r), atol=1e-10)


# ----------------------------------------------------------------------
# TruncationPointwise
# ----------------------------------------------------------------------
def make_pointwise_pair(**kw):
    params = {'df': 1, 'scale': 1}
    params.update(kw)
    return (gm.TruncationPointwise(**params), gref.TruncationPointwise(**params))


def test_pointwise_fit_parity():
    t_o, t_r = make_pointwise_pair()
    t_o.fit(y_data, ratio=ratio_val, ref=ref_val, orders=orders)
    t_r.fit(y_data, ratio=ratio_val, ref=ref_val, orders=orders)
    np.testing.assert_allclose(np.asarray(t_o.coeffs_), t_r.coeffs_, atol=1e-10)
    assert t_o.df_ == t_r.df_
    np.testing.assert_allclose(np.asarray(t_o.scale_), t_r.scale_, atol=1e-10)


def test_pointwise_interval_pdf_std():
    t_o, t_r = make_pointwise_pair()
    t_o.fit(y_data, ratio=ratio_val, ref=ref_val, orders=orders)
    t_r.fit(y_data, ratio=ratio_val, ref=ref_val, orders=orders)
    i_o = np.asarray(t_o.interval(np.array([0.68, 0.95])))
    i_r = np.asarray(t_r.interval(np.array([0.68, 0.95])))
    np.testing.assert_allclose(i_o, i_r, atol=1e-8)
    np.testing.assert_allclose(np.asarray(t_o.std()), t_r.std(), atol=1e-8)
    yy = y_data[:, -1]
    np.testing.assert_allclose(np.asarray(t_o.pdf(yy)), t_r.pdf(yy), atol=1e-8)
    np.testing.assert_allclose(np.asarray(t_o.logpdf(yy)), t_r.logpdf(yy),
                               atol=1e-8)


def test_pointwise_interval_single_order():
    t_o, t_r = make_pointwise_pair()
    t_o.fit(y_data, ratio=ratio_val, ref=ref_val, orders=orders)
    t_r.fit(y_data, ratio=ratio_val, ref=ref_val, orders=orders)
    i_o = np.asarray(t_o.interval(np.array([0.68, 0.95]), orders=3))
    i_r = np.asarray(t_r.interval(np.array([0.68, 0.95]), orders=3))
    np.testing.assert_allclose(i_o, i_r, atol=1e-8)


@pytest.mark.parametrize('df0', [0, 1, 3])
def test_pointwise_log_likelihood(df0):
    t_o, t_r = make_pointwise_pair(df=df0)
    t_o.fit(y_data, ratio=ratio_val, ref=ref_val, orders=orders)
    t_r.fit(y_data, ratio=ratio_val, ref=ref_val, orders=orders)
    for r in [0.3, 0.45, 0.6]:
        lo = float(np.asarray(t_o.log_likelihood(ratio=r)))
        lr = float(t_r.log_likelihood(ratio=r))
        np.testing.assert_allclose(lo, lr, rtol=1e-9)


def test_pointwise_excluded():
    t_o, t_r = make_pointwise_pair(excluded=[1])
    t_o.fit(y_data, ratio=ratio_val, ref=ref_val, orders=orders)
    t_r.fit(y_data, ratio=ratio_val, ref=ref_val, orders=orders)
    np.testing.assert_allclose(np.asarray(t_o.coeffs_), t_r.coeffs_, atol=1e-10)
    i_o = np.asarray(t_o.interval(0.68))
    i_r = np.asarray(t_r.interval(0.68))
    np.testing.assert_allclose(i_o, i_r, atol=1e-8)


def test_pointwise_credible_diagnostic():
    t_o, t_r = make_pointwise_pair()
    t_o.fit(y_data, ratio=ratio_val, ref=ref_val, orders=orders)
    t_r.fit(y_data, ratio=ratio_val, ref=ref_val, orders=orders)
    data = y_data + 0.01 * rng.randn(*y_data.shape)
    dobs = np.linspace(0.1, 0.9, 5)
    d_o = np.asarray(t_o.credible_diagnostic(data, dobs))
    d_r = np.asarray(t_r.credible_diagnostic(data, dobs))
    np.testing.assert_allclose(d_o, d_r, atol=1e-10)
    # with beta bands
    d_o, b_o = t_o.credible_diagnostic(data, dobs, band_intervals=[0.68],
                                       band_dobs=np.array([0.25, 0.5, 0.75]))
    d_r, b_r = t_r.credible_diagnostic(data, dobs, band_intervals=[0.68],
                                       band_dobs=np.array([0.25, 0.5, 0.75]))
    np.testing.assert_allclose(np.asarray(b_o), np.asarray(b_r), atol=1e-5)
    # with binomial bands
    d_o, b_o = t_o.credible_diagnostic(data, dobs, band_intervals=[0.68],
                                       band_dobs=np.array([0.25, 0.5, 0.75]),
                                       beta=False)
    d_r, b_r = t_r.credible_diagnostic(data, dobs, band_intervals=[0.68],
                                       band_dobs=np.array([0.25, 0.5, 0.75]),
                                       beta=False)
    np.testing.assert_allclose(np.asarray(b_o), np.asarray(b_r), atol=1e-8)


def test_truncation_lml_eval_gradient():
    """eval_gradient=True returns (value, grad); the det factor is
    theta-independent so the gradient matches finite differences of the
    full y-space lml.  (The reference silently discards the gradient —
    models.py:1497-1507; ADVICE r1.)"""
    ko = gm.RBF(0.25, (1e-2, 10))
    t_o = gm.TruncationGP(kernel=ko, ratio=ratio_val, ref=ref_val,
                          optimizer=None, **PRIORS)
    t_o.fit(X, y_data, orders=orders)
    theta = np.array([np.log(0.3)])
    val, grad = t_o.log_marginal_likelihood(theta, eval_gradient=True)
    val = float(np.asarray(val))
    grad = np.asarray(grad)
    assert grad.shape == (1,)
    # eps=1e-4: the lml magnitude here is ~1e4, so smaller steps are
    # dominated by cancellation noise (verified: FD converges to the
    # analytic gradient as eps grows from 1e-6 to 1e-4)
    eps = 1e-4
    vp = float(np.asarray(t_o.log_marginal_likelihood(theta + eps)))
    vm = float(np.asarray(t_o.log_marginal_likelihood(theta - eps)))
    np.testing.assert_allclose(float(np.asarray(
        t_o.log_marginal_likelihood(theta))), val, rtol=1e-12)
    np.testing.assert_allclose(grad[0], (vp - vm) / (2 * eps), rtol=1e-4)


def test_pointwise_log_likelihood_array_scale():
    """Per-point scale prior: the df0-term of the evidence sums over the
    scale array (reference models.py:1795); a scalar-only float() here
    raised TypeError for the array priors the reference supports."""
    scale_arr = np.linspace(0.5, 2.0, y_data.shape[0])
    t_o, t_r = make_pointwise_pair(df=2, scale=scale_arr)
    t_o.fit(y_data, ratio=ratio_val, ref=ref_val, orders=orders)
    t_r.fit(y_data, ratio=ratio_val, ref=ref_val, orders=orders)
    for r in [0.3, 0.45, 0.6]:
        lo = float(np.asarray(t_o.log_likelihood(ratio=r)))
        lr = float(t_r.log_likelihood(ratio=r))
        np.testing.assert_allclose(lo, lr, rtol=1e-9)


def test_truncation_tp_unfitted_predict_returns_prior():
    """TruncationTP.predict with return_std before fit returns the prior
    (whose coeffs-process cov already carries the var*(B V0 B^T)
    dispersion term); the reference crashes on None fitted attributes
    here, so this is a deliberate fixed-bug deviation (docs/parity.md)."""
    k = gm.RBF(0.4, (1e-2, 1e2))
    tp = gm.TruncationTP(kernel=k, ratio=0.5, ref=1.0, df=5, scale=1.0,
                         disp=1.0)
    Xp = np.linspace(0, 1, 7)[:, None]
    m, std = tp.predict(Xp, order=2, return_std=True)
    assert np.asarray(m).shape == (7,)
    assert np.isfinite(np.asarray(std)).all()
    m2, cov = tp.predict(Xp, order=2, return_cov=True)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2))
    # prior == base underlying_properties (no conditional correction)
    m_u, cov_u = tp.underlying_properties(Xp, order=2, return_cov=True)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov_u))
