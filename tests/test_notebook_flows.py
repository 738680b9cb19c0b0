"""Scripted regressions of the reference's documentation-notebook flows.

The reference's real coverage lives in its notebooks (SURVEY.md §4):
``docs/notebooks/truncation_recap.ipynb`` (Furnstahl et al. pointwise
model) and ``docs/notebooks/correlated_EFT_publication.ipynb``
(arXiv:1904.10581 figures: TruncationGP bands, (Q, ls) joint posterior,
Lambda_b posteriors, diagnostics).  These tests replay the computational
core of those flows on real NN-scattering data
(/root/reference/examples/data/cross_sec_kvnn_41.csv) with both libraries
and require tight numerical agreement.
"""
import numpy as np
import pytest

import gsum_tpu as gm
from _reference import import_reference

gref = import_reference()
sk = pytest.importorskip('sklearn.gaussian_process.kernels')

DATA = '/root/reference/examples/data/cross_sec_kvnn_41.csv'


@pytest.fixture(scope='module')
def scattering():
    """Total-cross-section style data: partial sums over EFT orders vs energy."""
    import pandas as pd

    df = pd.read_csv(DATA)
    sub = df[df['theta'] == 0].iloc[4:64:4]  # 15 energies, away from threshold
    orders = np.array([0, 2, 3, 4, 5])
    y = sub[['0', '2', '3', '4', '5']].to_numpy()
    Q = sub['Q'].to_numpy()
    E = sub['Energy'].to_numpy()
    X = (E / E.max())[:, None]
    ref_scale = y[:, 0].copy()
    return X, y, orders, Q, ref_scale


def test_pointwise_recap_flow(scattering):
    """truncation_recap.ipynb: pointwise model fit + intervals + evidence."""
    X, y, orders, Q, ref_scale = scattering

    t_o = gm.TruncationPointwise(df=3, scale=1).fit(y, ratio=Q, ref=ref_scale,
                                                    orders=orders)
    t_r = gref.TruncationPointwise(df=3, scale=1).fit(y, ratio=Q,
                                                      ref=ref_scale,
                                                      orders=orders)
    np.testing.assert_allclose(np.asarray(t_o.coeffs_), t_r.coeffs_,
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(t_o.scale_), t_r.scale_, rtol=1e-10)
    iv_o = np.asarray(t_o.interval(np.array([0.68, 0.95])))
    iv_r = np.asarray(t_r.interval(np.array([0.68, 0.95])))
    np.testing.assert_allclose(iv_o, iv_r, rtol=1e-7)

    # Lambda_b-style evidence sweep over the expansion-parameter scale
    for lam in [0.8, 1.0, 1.3]:
        lo = float(np.asarray(t_o.log_likelihood(ratio=Q / lam)))
        lr = float(t_r.log_likelihood(ratio=Q / lam))
        np.testing.assert_allclose(lo, lr, rtol=1e-9)


def test_correlated_flow_fit_and_bands(scattering):
    """correlated_EFT_publication.ipynb: TruncationGP fit + truncation bands."""
    X, y, orders, Q, ref_scale = scattering

    def make(mod, kmod):
        kernel = kmod.RBF(0.5, (1e-2, 1e2))
        return mod.TruncationGP(
            kernel=kernel, ratio=np.mean(Q), ref=float(np.mean(ref_scale)),
            center=0, disp=0, df=3, scale=1, nugget=1e-8)

    t_o = make(gm, gm).fit(X, y, orders=orders)
    t_r = make(gref, sk).fit(X, y, orders=orders)

    np.testing.assert_allclose(t_o.coeffs_process.kernel_.theta,
                               t_r.coeffs_process.kernel_.theta, atol=1e-5)

    # pin both models to OUR MAP theta so band comparison is exact
    theta = t_o.coeffs_process.kernel_.theta
    t_r.coeffs_process.kernel_.theta = theta
    t_r.coeffs_process.fit(np.asarray(X), np.asarray(t_r.coeffs_))
    t_o.coeffs_process.kernel_.theta = theta
    t_o.coeffs_process.fit(X, t_o.coeffs_)

    for order in [3, 5]:
        m_o, s_o = t_o.predict(X, order=order, return_std=True, kind='trunc')
        m_r, s_r = t_r.predict(X, order=order, return_std=True, kind='trunc')
        np.testing.assert_allclose(np.asarray(m_o), np.asarray(m_r),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(s_o), np.asarray(s_r),
                                   rtol=1e-6, atol=1e-9)


def test_joint_Q_ls_posterior_grid(scattering):
    """The notebook's (Q, ls) joint posterior: an lml grid over ratio and
    length scale (cell 53's 80x100 Python loop, shrunk to 4x5)."""
    X, y, orders, Q, ref_scale = scattering

    def make(mod, kmod):
        kernel = kmod.RBF(0.5, (1e-2, 1e2))
        return mod.TruncationGP(
            kernel=kernel, ratio=lambda X_, lam=1.0: np.mean(Q) / lam * np.ones(X_.shape[0]),
            ref=float(np.mean(ref_scale)), center=0, disp=0, df=3, scale=1,
            nugget=1e-8, optimizer=None)

    t_o = make(gm, gm).fit(X, y, orders=orders)
    t_r = make(gref, sk).fit(X, y, orders=orders)

    for lam in [0.9, 1.1]:
        for ls in [0.3, 0.6]:
            theta = np.log(np.array([ls]))
            lo = float(np.asarray(t_o.log_marginal_likelihood(theta, lam=lam)))
            lr = float(t_r.log_marginal_likelihood(theta, lam=lam))
            np.testing.assert_allclose(lo, lr, rtol=1e-8, err_msg=f'{lam},{ls}')


def test_hmc_joint_posterior_flow(scattering):
    """examples/hyperparameter_posterior.py's core: the cell-53 joint
    (ls, Lambda_b) posterior sampled by HMC must agree with quadrature of
    the batched grid surface on the SAME real NN data (the two paths share
    nothing past the model definition)."""
    import jax.numpy as jnp

    from gsum_tpu.parallel import truncation_lml_grid

    X, y, orders, Q, ref_scale = scattering
    Qbar = float(np.mean(Q))

    def ratio_fn(X_, lam=1.0):
        return jnp.full(X_.shape[0], Qbar / lam)

    tgp = gm.TruncationGP(kernel=gm.RBF(0.5, (0.05, 3.0)), ratio=ratio_fn,
                          ref=float(np.mean(ref_scale)), center=0, disp=0,
                          df=3, scale=1, nugget=1e-8, optimizer=None)
    tgp.fit(X, y, orders=orders)

    samples, info = gm.sample_truncation_posterior(
        tgp, ratio_param='lam', q_bounds=(0.6, 2.0), n_chains=2,
        n_samples=500, n_warmup=300, random_state=1,
        extra_log_prior=lambda x: -jnp.log(x[-1]))
    assert samples.shape == (2, 500, 2)
    assert np.all(info['rhat'] < 1.2)
    s = np.asarray(samples).reshape(-1, 2)

    th_grid = np.linspace(np.log(0.05), np.log(3.0), 60)
    lam_grid = np.linspace(0.6, 2.0, 61)
    ratios = np.stack([np.full(X.shape[0], Qbar / lam) for lam in lam_grid])
    surf = np.asarray(truncation_lml_grid(
        gm.RBF(0.5, (0.05, 3.0)), X, y, orders, ratios, th_grid[:, None],
        ref=float(np.mean(ref_scale)), center=0, disp=0, df=3, scale=1,
        nugget=1e-8))
    logpost = surf - np.log(lam_grid)[None, :]
    post = np.exp(logpost - logpost.max())
    Zl = np.trapezoid(post, th_grid, axis=0)
    mean_lam = np.trapezoid(Zl * lam_grid, lam_grid) / np.trapezoid(Zl, lam_grid)
    Zt = np.trapezoid(post, lam_grid, axis=1)
    mean_th = np.trapezoid(Zt * th_grid, th_grid) / np.trapezoid(Zt, th_grid)

    # 1000 correlated draws: agree on marginal means to MC accuracy
    assert abs(np.mean(s[:, 1]) - mean_lam) < 0.08
    assert abs(np.mean(s[:, 0]) - mean_th) < 0.12


def test_diagnostics_flow(scattering):
    """Model-checking pipeline on the extracted coefficients (essentials)."""
    X, y, orders, Q, ref_scale = scattering
    coeffs = np.asarray(gm.coefficients(y, Q, ref_scale, orders))
    kernel_o = gm.RBF(0.2, 'fixed')
    gp = gm.ConjugateGaussianProcess(kernel=kernel_o, disp=0, df=3, scale=1,
                                     nugget=1e-8).fit(X, coeffs)
    mean = np.zeros(len(X))
    # enough jitter that scipy's multivariate_normal accepts the covariance
    cov = np.asarray(gp.cov(X))
    cov = cov + 1e-6 * np.max(np.diag(cov)) * np.eye(len(X))

    d_o = gm.Diagnostic(mean=mean, cov=cov)
    d_r = gref.Diagnostic(mean=mean, cov=cov)
    np.testing.assert_allclose(np.asarray(d_o.md_squared(coeffs)),
                               d_r.md_squared(coeffs), rtol=1e-8)
    # Pivot order differs from LAPACK at near-tie pivots on this matrix
    # (both factorizations are exact), so compare the pivot-invariant
    # property: squared pivoted errors sum to the Mahalanobis distance.
    pc_err = np.asarray(d_o.pivoted_cholesky_errors(coeffs))
    np.testing.assert_allclose(np.sum(pc_err ** 2, axis=0),
                               d_r.md_squared(coeffs), rtol=1e-8)
    ci_o = np.asarray(d_o.credible_interval(coeffs, np.linspace(0.1, 0.9, 5)))
    ci_r = d_r.credible_interval(coeffs, np.linspace(0.1, 0.9, 5))
    np.testing.assert_allclose(ci_o, ci_r, atol=1e-10)


def test_lambda_b_posterior_flow(scattering):
    """truncation_recap.ipynb cells 37-42: the Lambda_b evidence sweep.

    The reference loops TruncationPointwise.log_likelihood over the
    Lambda_b grid; gsum_tpu evaluates the whole sweep as one jitted device
    program (parallel.pointwise_evidence_grid).  Both must agree."""
    from gsum_tpu.parallel import pointwise_evidence_grid

    X, y, orders, Q, ref_scale = scattering
    excluded = [0]
    lambdas = np.array([0.7, 0.9, 1.0, 1.2, 1.5])
    ratios = np.stack([Q / lam for lam in lambdas])

    # scale-invariant prior nu0=0, as in the notebook's Lb_model
    log_ev = np.asarray(pointwise_evidence_grid(
        y, orders, ratios, ref=ref_scale, df=0, scale=1, excluded=excluded))

    t_r = gref.TruncationPointwise(df=0, excluded=excluded)
    t_r.fit(y, ratio=Q, ref=ref_scale, orders=orders)
    want = np.array([t_r.log_likelihood(ratio=r) for r in ratios])
    np.testing.assert_allclose(log_ev, want, rtol=1e-9)

    # and the sweep matches our own per-call class path
    t_o = gm.TruncationPointwise(df=0, excluded=excluded)
    t_o.fit(y, ratio=Q, ref=ref_scale, orders=orders)
    ours = np.array([float(np.asarray(t_o.log_likelihood(ratio=r)))
                     for r in ratios])
    np.testing.assert_allclose(log_ev, ours, rtol=1e-10)


def test_lambda_b_posterior_flow_nonzero_df(scattering):
    """Informative-prior variant (df0 > 0 keeps its normalization terms)."""
    from gsum_tpu.parallel import pointwise_evidence_grid

    X, y, orders, Q, ref_scale = scattering
    ratios = np.stack([Q / lam for lam in [0.8, 1.1]])
    log_ev = np.asarray(pointwise_evidence_grid(
        y, orders, ratios, ref=ref_scale, df=3, scale=1.2))
    t_r = gref.TruncationPointwise(df=3, scale=1.2)
    t_r.fit(y, ratio=Q, ref=ref_scale, orders=orders)
    want = np.array([t_r.log_likelihood(ratio=r) for r in ratios])
    np.testing.assert_allclose(log_ev, want, rtol=1e-9)


def test_symmetry_constrained_flow():
    """correlated_EFT_publication.ipynb cells 24-27: truncation bands under
    endpoint symmetry constraints (dX, dy), df=inf fixed-variance model."""
    ratio = 0.5
    orders = np.arange(4)
    x = np.linspace(0, 1, 50)
    X = x[:, None]
    dX = np.array([[0.0], [1.0]])
    dy = np.zeros(2)

    # constrained coefficient curves from OUR sampler (deterministic)
    sampler = gm.ConjugateGaussianProcess(
        kernel=gm.RBF(0.25) + gm.WhiteKernel(1e-7, 'fixed'), optimizer=None)
    sampler.fit(dX, dy)
    cn = np.asarray(sampler.sample_y(X, n_samples=4, random_state=5))
    yn = np.asarray(gm.partials(cn, ratio=ratio))

    def make(mod, kmod):
        kernel = kmod.RBF(0.25) + kmod.WhiteKernel(1e-7, 'fixed')
        return mod.TruncationGP(kernel=kernel, ref=1, ratio=ratio, disp=0,
                                df=np.inf, scale=1, optimizer=None)

    t_o = make(gm, gm).fit(X[::10], yn[::10], orders=orders, dX=dX, dy=dy)
    t_r = make(gref, sk).fit(X[::10], yn[::10], orders=orders, dX=dX, dy=dy)

    for order in [0, 2]:
        m_o, s_o = t_o.predict(X, order=order, return_std=True, kind='trunc')
        m_r, s_r = t_r.predict(X, order=order, return_std=True, kind='trunc')
        np.testing.assert_allclose(np.asarray(m_o), m_r, rtol=1e-8,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(s_o), s_r, rtol=1e-6,
                                   atol=1e-10)
        # the constraint pins the band to zero at the symmetry points
        s = np.asarray(s_o)
        assert s[0] < 1e-7 and s[-1] < 1e-7


def test_model_checking_flow():
    """diagnostic_explorations.ipynb: MD^2 reference distributions and
    misspecification detection via whitened-error decompositions."""
    n, df, n_samples = 20, 6, 3000
    X = np.linspace(0, 1, n)[:, None]
    mean = np.zeros(n)
    cov = np.asarray((gm.RBF(0.05) + gm.WhiteKernel(1e-6, 'fixed'))(X))

    # GP samples: MD^2 ~ chi^2(n) (mean n, var 2n)
    d_gp = gm.Diagnostic(mean, cov)
    md_gp = np.asarray(d_gp.md_squared(np.asarray(d_gp.samples(n_samples))))
    assert abs(md_gp.mean() - n) < 5 * np.sqrt(2 * n / n_samples)

    # TP samples: MD^2 ~ F(n, df) scaled so the mean is n * df/(df-2)
    d_tp = gm.Diagnostic(mean, cov, df=df)
    md_tp = np.asarray(d_tp.md_squared(np.asarray(d_tp.samples(n_samples))))
    want_mean = float(np.asarray(
        gm.stats.f(n, df, scale=(df - 2) * n / df).mean()))
    assert abs(md_tp.mean() - want_mean) / want_mean < 0.15
    # the scaled-F reference has mean n but fatter tails than chi^2(n)
    f_std = float(np.asarray(gm.stats.f(n, df, scale=(df - 2) * n / df).std()))
    assert f_std > np.sqrt(2 * n)
    assert md_tp.var() > 1.5 * md_gp.var()

    # misspecified length scale blows the whitened errors out of +-2
    ls, noise = 0.8, 1e-5
    X_dec = np.linspace(0, 3, 151)[:, None]
    mask = np.arange(151) % 12 == 0
    gp_kwargs = dict(center=0, disp=0, df=np.inf, scale=1, optimizer=None)
    model_kernel = gm.RBF(ls, 'fixed') + gm.WhiteKernel(noise, 'fixed')
    gp = gm.ConjugateGaussianProcess(model_kernel, **gp_kwargs)
    cov_d = np.asarray(gp.cov(X_dec[mask]))

    def frac_outside(ls_true):
        true_kernel = gm.RBF(ls_true, 'fixed') + gm.WhiteKernel(noise, 'fixed')
        sampler = gm.ConjugateGaussianProcess(true_kernel, **gp_kwargs)
        data = np.asarray(sampler.sample_y(X_dec, 6, random_state=3))[mask]
        d = gm.Diagnostic(np.zeros(mask.sum()), cov_d)
        return float(np.mean(np.abs(np.asarray(d.cholesky_errors(data))) > 2))

    assert frac_outside(ls) < 0.15          # correct model: ~5%
    assert frac_outside(0.4 * ls) > 0.4     # wrong model: blows up


def test_student_t_flow(scattering):
    """The publication's Student-t variant: CSP evidence and intervals."""
    X, y, orders, Q, ref_scale = scattering
    coeffs = np.asarray(gm.coefficients(y, Q, ref_scale, orders))

    gp_o = gm.ConjugateStudentProcess(kernel=gm.RBF(0.5, 'fixed'), disp=1.0,
                                      df=3, scale=1, nugget=1e-8).fit(X, coeffs)
    gp_r = gref.ConjugateStudentProcess(kernel=sk.RBF(0.5, 'fixed'), disp=1.0,
                                        df=3, scale=1, nugget=1e-8).fit(X, coeffs)
    lo = float(np.asarray(gp_o.log_marginal_likelihood(np.array([]))))
    lr = float(gp_r.log_marginal_likelihood(np.array([])))
    # RBF(0.5) on this grid is ill-conditioned; agreement is limited by
    # cond(R) * eps, not by implementation differences
    np.testing.assert_allclose(lo, lr, rtol=1e-7)
    m_o, s_o = gp_o.predict(X, return_std=True)
    m_r, s_r = gp_r.predict(X, return_std=True)
    np.testing.assert_allclose(np.asarray(m_o), np.asarray(m_r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(s_o), np.asarray(s_r), atol=1e-8)
