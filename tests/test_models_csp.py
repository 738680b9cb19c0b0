"""ConjugateStudentProcess vs the reference: evidence, cov, predict."""
import numpy as np
import pytest

import gsum_tpu as gm
from _reference import import_reference

gref = import_reference()
sk = pytest.importorskip('sklearn.gaussian_process.kernels')


def f(x):
    return x * np.sin(x)


X = np.atleast_2d([1., 3., 5., 6., 7., 8.]).T
X2 = np.atleast_2d([2., 4., 5.5, 6.5, 7.5]).T
y = f(X).ravel()

PRIORS = dict(center=0, disp=1.0, df=3, scale=1.2)


def make_pair(fixed=True, **kw):
    if fixed:
        ko, kr = gm.RBF(1.0, 'fixed'), sk.RBF(1.0, 'fixed')
    else:
        ko, kr = gm.RBF(1.0), sk.RBF(1.0)
    params = {**PRIORS, **kw}
    return (gm.ConjugateStudentProcess(kernel=ko, **params),
            gref.ConjugateStudentProcess(kernel=kr, **params))


@pytest.mark.parametrize('decomposition', ['cholesky', 'eig'])
def test_csp_posterior_parity(decomposition):
    gp_o, gp_r = make_pair()
    gp_o.decomposition = decomposition
    gp_r.decomposition = decomposition
    gp_o.fit(X, y)
    gp_r.fit(X, y)
    for attr in ['center_', 'disp_', 'df_', 'scale_', 'cov_factor_']:
        np.testing.assert_allclose(np.asarray(getattr(gp_o, attr)),
                                   np.asarray(getattr(gp_r, attr)),
                                   atol=1e-9, err_msg=attr)


def test_csp_lml_parity():
    gp_o, gp_r = make_pair()
    gp_o.fit(X, y)
    gp_r.fit(X, y)
    for theta in [np.array([]), None]:
        lo = float(np.asarray(gp_o.log_marginal_likelihood(np.array([]))))
        lr = float(gp_r.log_marginal_likelihood(np.array([])))
        np.testing.assert_allclose(lo, lr, rtol=1e-9)


def test_csp_lml_with_free_kernel():
    ko, kr = gm.RBF(1.0), sk.RBF(1.0)
    gp_o = gm.ConjugateStudentProcess(kernel=ko, optimizer=None, **PRIORS).fit(X, y)
    gp_r = gref.ConjugateStudentProcess(kernel=kr, optimizer=None, **PRIORS).fit(X, y)
    eps = 1e-6
    for theta in [np.array([0.0]), np.array([0.3]), np.array([-0.4])]:
        lo, go = gp_o.log_marginal_likelihood(theta, eval_gradient=True)
        lr = gp_r.log_marginal_likelihood(theta)
        np.testing.assert_allclose(float(np.asarray(lo)), lr, rtol=1e-9)
        fd = (gp_r.log_marginal_likelihood(theta + eps)
              - gp_r.log_marginal_likelihood(theta - eps)) / (2 * eps)
        np.testing.assert_allclose(float(np.asarray(go)[0]), fd, atol=1e-5)


def test_csp_zero_disp_lml_parity():
    """disp0 = 0 drops the dispersion determinant term (models.py:1244-1246)."""
    ko, kr = gm.RBF(1.0, 'fixed'), sk.RBF(1.0, 'fixed')
    gp_o = gm.ConjugateStudentProcess(kernel=ko, disp=0, df=3, scale=1.2).fit(X, y)
    gp_r = gref.ConjugateStudentProcess(kernel=kr, disp=0, df=3, scale=1.2).fit(X, y)
    lo = float(np.asarray(gp_o.log_marginal_likelihood(np.array([]))))
    lr = float(gp_r.log_marginal_likelihood(np.array([])))
    np.testing.assert_allclose(lo, lr, rtol=1e-9)


def test_csp_cov_parity():
    gp_o, gp_r = make_pair()
    gp_o.fit(X, y)
    gp_r.fit(X, y)
    np.testing.assert_allclose(np.asarray(gp_o.cov(X2)), gp_r.cov(X2), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gp_o.cov(X2, X)), gp_r.cov(X2, X),
                               atol=1e-9)
    # unfitted prior covariance
    gp_o2, gp_r2 = make_pair()
    np.testing.assert_allclose(np.asarray(gp_o2.cov(X2)), gp_r2.cov(X2),
                               atol=1e-12)


@pytest.mark.parametrize('decomposition', ['cholesky', 'eig'])
def test_csp_predict_parity(decomposition):
    gp_o, gp_r = make_pair()
    gp_o.decomposition = decomposition
    gp_r.decomposition = decomposition
    gp_o.fit(X, y)
    gp_r.fit(X, y)
    m_o, s_o = gp_o.predict(X2, return_std=True)
    m_r, s_r = gp_r.predict(X2, return_std=True)
    np.testing.assert_allclose(np.asarray(m_o), m_r, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s_o), s_r, atol=1e-9)
    m_o, c_o = gp_o.predict(X2, return_cov=True)
    m_r, c_r = gp_r.predict(X2, return_cov=True)
    np.testing.assert_allclose(np.asarray(c_o), c_r, atol=1e-9)


def test_csp_predict_with_Xc():
    gp_o, gp_r = make_pair()
    gp_o.fit(X, y)
    gp_r.fit(X, y)
    m_o, c_o = gp_o.predict(X2, return_cov=True, Xc=X[:4], y=y[:4])
    m_r, c_r = gp_r.predict(X2, return_cov=True, Xc=X[:4], y=y[:4])
    np.testing.assert_allclose(np.asarray(m_o), m_r, atol=1e-9)
    np.testing.assert_allclose(np.asarray(c_o), c_r, atol=1e-9)


def test_csp_unfitted_predict():
    gp_o, gp_r = make_pair(df=5)
    m_o, c_o = gp_o.predict(X2, return_cov=True)
    m_r, c_r = gp_r.predict(X2, return_cov=True)
    np.testing.assert_allclose(np.asarray(m_o), m_r, atol=1e-12)
    np.testing.assert_allclose(np.asarray(c_o), c_r, atol=1e-12)


def test_csp_multicurve():
    rng = np.random.RandomState(0)
    Y = np.stack([y + 0.1 * rng.randn(len(y)) for _ in range(4)], axis=1)
    gp_o, gp_r = make_pair()
    gp_o.fit(X, Y)
    gp_r.fit(X, Y)
    for attr in ['center_', 'disp_', 'scale_']:
        np.testing.assert_allclose(np.asarray(getattr(gp_o, attr)),
                                   np.asarray(getattr(gp_r, attr)),
                                   atol=1e-9, err_msg=attr)
    lo = float(np.asarray(gp_o.log_marginal_likelihood(np.array([]))))
    lr = float(gp_r.log_marginal_likelihood(np.array([])))
    np.testing.assert_allclose(lo, lr, rtol=1e-9)


def test_csp_predict_uses_fused_path():
    """Regression for round-1 weak spot #4: CSP predict on the common
    (condition-on-training) path must be a single cached jitted call — no
    eager device round trips, no retrace on repeat calls.

    The fused closure binds gsum_tpu.models.solve_sqrt at trace time; once
    warm, a second same-shape predict must neither re-trace nor run any
    eager host-side linalg, so a poisoned module-level solve_sqrt proves it.
    """
    import gsum_tpu.models as models_mod

    gp_o, _ = make_pair()
    gp_o.fit(X, y)
    m1, s1 = gp_o.predict(X2, return_std=True)

    # fused 'tp' closure is cached
    assert any(k[0] == 'predict' and k[1] == 'tp'
               for k in gp_o._jit_cache), list(gp_o._jit_cache)

    real = models_mod.solve_sqrt

    def poisoned(*a, **kw):
        raise AssertionError('eager solve_sqrt called on the fused path')

    models_mod.solve_sqrt = poisoned
    try:
        m2, s2 = gp_o.predict(X2, return_std=True)
    finally:
        models_mod.solve_sqrt = real
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_csp_subclass_keeps_mean_uncertainty():
    """A subclass overriding predict and delegating to super() must still
    get the Student-t mean-uncertainty term (the fused-path gate routes
    overrides to the eager path, which adds it explicitly)."""
    class MyCSP(gm.ConjugateStudentProcess):
        def predict(self, X, **kw):
            return super().predict(X, **kw)

    X = np.linspace(0, 1, 12)[:, None]
    y = np.sin(3 * X.T) + 0.05 * np.cos(9 * X.T)
    y = np.vstack([y, 0.8 * y]).T  # (12, 2) curves
    kw = dict(kernel=gm.RBF(0.4, 'fixed'), disp=2.0, df=5, scale=1,
              nugget=1e-8)
    Xnew = np.linspace(0.05, 0.95, 7)[:, None]

    base = gm.ConjugateStudentProcess(**kw).fit(X, y)
    sub = MyCSP(**kw).fit(X, y)
    # fused (one jitted program) vs eager (several dispatches) differ in
    # op order, so agreement is roundoff-level, not bitwise; the bug this
    # guards against was a ~7% missing-term error
    m_b, s_b = base.predict(Xnew, return_std=True)
    m_s, s_s = sub.predict(Xnew, return_std=True)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_b), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_b), rtol=1e-8)
    m_b, c_b = base.predict(Xnew, return_cov=True)
    m_s, c_s = sub.predict(Xnew, return_cov=True)
    np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_b), rtol=1e-8,
                               atol=1e-16)


def test_csp_lml_gammaln_stays_on_host(monkeypatch):
    """Both log_norm evaluations (posterior df = df0 + count, an
    np.integer for integer df0; prior df0 itself) must use the host
    gammaln: a 0-d device gammaln constant-folds at f32 on this TPU
    (CLAUDE.md), a ~1e-7 lml offset invisible to the CPU suite.  Poison
    the device gammaln and require the lml to still evaluate."""
    import jax.scipy.special as jsp

    def _boom(*a, **k):
        raise AssertionError("device gammaln reached for concrete df")

    monkeypatch.setattr(jsp, "gammaln", _boom)
    gp_o, gp_r = make_pair(df=1)  # integer df0 -> np.integer posterior df
    gp_o.fit(X, y)
    gp_r.fit(X, y)
    theta = np.array([])  # fixed kernel
    lo = float(np.asarray(gp_o.log_marginal_likelihood(theta)))
    np.testing.assert_allclose(lo,
                               float(gp_r.log_marginal_likelihood(theta)),
                               rtol=1e-9)
