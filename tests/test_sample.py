R"""Hyperparameter-posterior HMC (gsum_tpu.sample; beyond-reference).

The reference's hyperparameter posteriors are dense grid loops
(correlated_EFT_publication.ipynb cell 53, truncation_recap.ipynb cells
37-42); the sampler must agree with exactly that grid construction, so the
oracle here is trapezoid quadrature of exp(lml) over the kernel bounds.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gsum_tpu as gm
from gsum_tpu.sample import hmc, split_rhat


def test_hmc_standard_normal_moments():
    """Exactness on a known target: N(0, I_2) moments, healthy acceptance
    near the dual-averaging target, adapted step size in a sane range."""
    ld = lambda z: -0.5 * jnp.sum(z ** 2)  # noqa: E731
    samples, info = jax.jit(lambda z, k: hmc(
        ld, z, k, n_samples=2000, n_warmup=300))(
        jnp.zeros(2), jax.random.PRNGKey(0))
    s = np.asarray(samples)
    assert np.all(np.abs(s.mean(0)) < 0.15)
    assert np.all(np.abs(s.std(0) - 1.0) < 0.15)
    acc = float(info['accept_rate'])
    assert 0.6 < acc <= 1.0
    assert 0.1 < float(info['step_size']) < 10.0


def test_hmc_correlated_gaussian_covariance():
    """Covariance recovery on a correlated 2d Gaussian."""
    C = np.array([[1.0, 0.8], [0.8, 1.0]])
    P = jnp.asarray(np.linalg.inv(C))

    def ld(z):
        return -0.5 * z @ (P @ z)

    samples, _ = jax.jit(lambda z, k: hmc(
        ld, z, k, n_samples=4000, n_warmup=500))(
        jnp.zeros(2), jax.random.PRNGKey(1))
    S = np.cov(np.asarray(samples).T)
    np.testing.assert_allclose(S, C, atol=0.15)


def _fit_gp():
    X = np.linspace(0, 1, 12)[:, None]
    x = X[:, 0]
    y = np.column_stack([np.sin(3 * x), np.cos(2 * x) - 1, np.sin(5 * x)])
    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(0.3, (0.05, 2.0)),
                                     center=0, disp=0, df=3, scale=1,
                                     nugget=1e-8, optimizer=None)
    gp.fit(X, y)
    return gp


def test_theta_posterior_matches_grid_quadrature():
    """The HMC theta-posterior must agree with the reference-style dense
    grid: trapezoid quadrature of exp(lml) over the bounds (the same
    construction as the publication notebook's (Q, ls) posterior
    surfaces, which parallel.batched_lml_grid reproduces)."""
    gp = _fit_gp()
    thetas, info = gm.sample_theta_posterior(gp, n_chains=4, n_samples=1500,
                                             n_warmup=500, random_state=1)
    assert thetas.shape == (4, 1500, 1)
    th = np.asarray(thetas).reshape(-1)

    gg = np.linspace(np.log(0.05), np.log(2.0), 201)
    lml = np.array([float(gp.log_marginal_likelihood(np.array([g])))
                    for g in gg])
    w = np.exp(lml - lml.max())
    w /= np.trapezoid(w, gg)
    mean_q = np.trapezoid(w * gg, gg)
    sd_q = np.sqrt(np.trapezoid(w * (gg - mean_q) ** 2, gg))

    # MC error at ESS>=few hundred is well under these tolerances
    assert abs(th.mean() - mean_q) < 0.05, (th.mean(), mean_q)
    assert abs(th.std() - sd_q) < 0.05, (th.std(), sd_q)
    assert np.all(info['rhat'] < 1.05)
    assert np.all(info['accept_rate'] > 0.5)
    # flat-in-bounds prior: every draw respects the box
    assert th.min() >= np.log(0.05) - 1e-9
    assert th.max() <= np.log(2.0) + 1e-9


def test_theta_posterior_extra_prior_shifts_mass():
    """A sharp external log-prior must dominate the posterior location —
    the hook the reference's Lambda_b 1/Lambda prior would use."""
    gp = _fit_gp()
    target = np.log(0.5)

    def sharp_prior(theta):
        return -0.5 * ((theta[0] - target) / 0.01) ** 2

    thetas, info = gm.sample_theta_posterior(
        gp, n_chains=2, n_samples=800, n_warmup=400, random_state=2,
        extra_log_prior=sharp_prior)
    th = np.asarray(thetas).reshape(-1)
    assert abs(th.mean() - target) < 0.05
    assert th.std() < 0.05


def test_segmented_sampling_matches_single_program():
    """steps_per_call is an execution detail for the tunneled TPU worker
    (which kills overly long single executions — a 40k-gradient-eval HMC
    program crashed it): splitting the warmup/sampling scans into bounded
    segment dispatches must reproduce the single-program chains exactly
    (same carried state, same RNG stream)."""
    gp = _fit_gp()
    one, info1 = gm.sample_theta_posterior(gp, n_chains=2, n_samples=40,
                                           n_warmup=25, random_state=3,
                                           steps_per_call=0)
    seg, info7 = gm.sample_theta_posterior(gp, n_chains=2, n_samples=40,
                                           n_warmup=25, random_state=3,
                                           steps_per_call=7)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(one), rtol=1e-12)
    np.testing.assert_allclose(info7['step_size'], info1['step_size'],
                               rtol=1e-12)
    np.testing.assert_allclose(info7['accept_rate'], info1['accept_rate'],
                               rtol=1e-12)


def test_effective_sample_size():
    """iid chains estimate ESS ~ m*n; an AR(1) chain with coefficient a
    has the analytic ESS factor (1-a)/(1+a)."""
    from gsum_tpu.sample import effective_sample_size

    rng = np.random.RandomState(0)
    m, n = 4, 4000
    iid = rng.randn(m, n, 2)
    ess = effective_sample_size(iid)
    assert np.all(ess > 0.75 * m * n) and np.all(ess < 1.35 * m * n)

    a = 0.9
    x = np.zeros((m, n, 1))
    eps = rng.randn(m, n)
    for t in range(1, n):
        x[:, t, 0] = a * x[:, t - 1, 0] + eps[:, t]
    want = m * n * (1 - a) / (1 + a)
    got = effective_sample_size(x)[0]
    assert 0.5 * want < got < 2.0 * want, (got, want)


def test_theta_posterior_validation():
    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(0.3, 'fixed'),
                                     optimizer=None)
    with pytest.raises(ValueError, match='no free'):
        gm.sample_theta_posterior(gp)
    gp2 = gm.ConjugateGaussianProcess(kernel=gm.RBF(0.3, (0.05, 2.0)),
                                      optimizer=None)
    with pytest.raises(ValueError, match='fit the model'):
        gm.sample_theta_posterior(gp2)


def test_split_rhat_detects_disagreement():
    rng = np.random.RandomState(0)
    good = rng.randn(4, 500, 1)
    assert split_rhat(good)[0] < 1.05
    bad = good.copy()
    bad[0] += 5.0  # one chain stuck elsewhere
    assert split_rhat(bad)[0] > 1.5


def test_joint_truncation_posterior_matches_grid_surface():
    """The joint (theta, Lambda) HMC posterior must match 2d trapezoid
    quadrature of the SAME density computed by parallel.truncation_lml_grid
    — the two implementations are fully independent (per-sample traced
    model lml vs the batched grid engine), so this cross-validates both."""
    X = np.linspace(0, 1, 15)[:, None]
    x = X[:, 0]
    orders = np.arange(4)
    cn = np.column_stack([np.sin(3 * x), np.cos(5 * x), np.sin(7 * x + 1),
                          np.cos(2 * x + 2)])
    yn = np.asarray(gm.partials(cn, ratio=0.5))

    def ratio_fn(X, lam=1.0):
        return jnp.full(X.shape[0], 0.5 / lam)

    tgp = gm.TruncationGP(kernel=gm.RBF(0.4, (0.1, 2.0)), ref=1,
                          ratio=ratio_fn, disp=0, df=3, scale=1,
                          nugget=1e-8, optimizer=None)
    tgp.fit(X, yn, orders=orders)

    thetas, info = gm.sample_truncation_posterior(
        tgp, ratio_param='lam', q_bounds=(0.5, 2.0), n_chains=4,
        n_samples=1000, n_warmup=500, random_state=0)
    assert thetas.shape == (4, 1000, 2)
    s = np.asarray(thetas).reshape(-1, 2)
    assert np.all(info['rhat'] < 1.05)
    assert np.all(info['accept_rate'] > 0.5)

    from gsum_tpu.parallel import truncation_lml_grid
    th_grid = np.linspace(np.log(0.1), np.log(2.0), 120)
    lam_grid = np.linspace(0.5, 2.0, 121)
    ratios = np.stack([np.full(15, 0.5 / lam) for lam in lam_grid])
    surf = np.asarray(truncation_lml_grid(
        gm.RBF(0.4, (0.1, 2.0)), X, yn, orders, ratios, th_grid[:, None],
        ref=1, center=0, disp=0, df=3, scale=1, nugget=1e-8))
    w = np.exp(surf - surf.max())
    w /= np.trapezoid(np.trapezoid(w, lam_grid, axis=1), th_grid)
    w_th = np.trapezoid(w, lam_grid, axis=1)
    w_lam = np.trapezoid(w, th_grid, axis=0)
    m_th = np.trapezoid(w_th * th_grid, th_grid)
    sd_th = np.sqrt(np.trapezoid(w_th * (th_grid - m_th) ** 2, th_grid))
    m_lam = np.trapezoid(w_lam * lam_grid, lam_grid)
    sd_lam = np.sqrt(np.trapezoid(w_lam * (lam_grid - m_lam) ** 2, lam_grid))

    assert abs(s[:, 0].mean() - m_th) < 0.1
    assert abs(s[:, 1].mean() - m_lam) < 0.1
    assert abs(s[:, 0].std() - sd_th) < 0.1
    assert abs(s[:, 1].std() - sd_lam) < 0.1
    # box respected on the q coordinate
    assert s[:, 1].min() >= 0.5 - 1e-9 and s[:, 1].max() <= 2.0 + 1e-9


def test_sample_truncation_posterior_validation():
    tgp = gm.TruncationGP(kernel=gm.RBF(0.4, (0.1, 2.0)), ref=1, ratio=0.5,
                          optimizer=None)
    with pytest.raises(ValueError, match='fit'):
        gm.sample_truncation_posterior(tgp, 'lam', (0.5, 2.0))


# ---------------------------------------------------------------------------
# posterior_predictive / batched_posterior_at


def test_batched_posterior_at_matches_class_path():
    """States at given thetas must equal a class fit at that fixed kernel
    (optimizer=None), field by field, and the lml must match the class lml."""
    from gsum_tpu.parallel import batched_posterior_at

    gp = _fit_gp()
    X, y = np.asarray(gp.X_train_), np.asarray(gp.y_train_)
    thetas = np.log([[0.2], [0.3], [0.55]])
    post = batched_posterior_at(gp.kernel_, X, y, thetas, center=gp.center0,
                                disp=gp.disp0, df=gp.df0, scale=gp.scale0,
                                nugget=gp.nugget, basis=gp.basis)
    for i, th in enumerate(thetas):
        gp_i = gm.ConjugateGaussianProcess(
            kernel=gm.RBF(float(np.exp(th[0])), (0.05, 2.0)), center=0,
            disp=0, df=3, scale=1, nugget=1e-8, optimizer=None)
        gp_i.fit(X, y)
        np.testing.assert_allclose(post.center[i], gp_i.center_, rtol=1e-10)
        np.testing.assert_allclose(post.disp[i], gp_i.disp_, rtol=1e-10,
                                   atol=1e-12)
        np.testing.assert_allclose(float(post.df[i]), float(gp_i.df_))
        np.testing.assert_allclose(np.sqrt(post.scale_sq[i]), gp_i.scale_,
                                   rtol=1e-10)
        np.testing.assert_allclose(post.cov_factor[i], gp_i.cov_factor_,
                                   rtol=1e-10)
        np.testing.assert_allclose(post.lml[i],
                                   gp.log_marginal_likelihood(th),
                                   rtol=1e-10)


def test_batched_posterior_at_chunking_invariance():
    from gsum_tpu.parallel import batched_posterior_at

    gp = _fit_gp()
    X, y = np.asarray(gp.X_train_), np.asarray(gp.y_train_)
    thetas = np.log(np.linspace(0.1, 0.6, 7))[:, None]
    a = batched_posterior_at(gp.kernel_, X, y, thetas, df=3, nugget=1e-8,
                             chunk=3)
    b = batched_posterior_at(gp.kernel_, X, y, thetas, df=3, nugget=1e-8,
                             chunk=None)
    np.testing.assert_allclose(np.asarray(a.lml), np.asarray(b.lml),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a.chol), np.asarray(b.chol),
                               rtol=1e-12)


def test_posterior_predictive_degenerate_mixture_is_class_predict():
    """All draws at the fitted theta -> the mixture must equal the class
    predict exactly (the mixture of identical components)."""
    gp = _fit_gp()
    Xnew = np.linspace(-0.1, 1.1, 17)[:, None]
    thetas = np.tile(np.asarray(gp.kernel_.theta), (5, 1))
    mean, std = gm.posterior_predictive(gp, Xnew, thetas)
    m_ref, s_ref = gp.predict(Xnew, return_std=True)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m_ref),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(std), np.broadcast_to(np.asarray(s_ref)[:, None],
                                         np.asarray(std).shape),
        rtol=1e-6, atol=1e-10)


def test_posterior_predictive_mixture_law():
    """Two distinct draws -> exact law-of-total-variance mixing of the two
    class predicts, chains-shaped input and thinning handled."""
    gp = _fit_gp()
    X, y = np.asarray(gp.X_train_), np.asarray(gp.y_train_)
    Xnew = np.linspace(0.05, 0.95, 9)[:, None]
    th_a, th_b = np.log(0.2), np.log(0.45)
    # chains-shaped (2, 2, 1) with thin=2 keeps draws [0, 2] = [a, a?]...
    # build it so the kept draws are exactly [a, b]
    chains = np.array([[[th_a], [th_a]], [[th_b], [th_b]]])
    mean, std, means_d, stds_d = gm.posterior_predictive(
        gp, Xnew, chains, thin=2, return_draws=True)
    assert means_d.shape[0] == 2

    parts = []
    for th in (th_a, th_b):
        gp_i = gm.ConjugateGaussianProcess(
            kernel=gm.RBF(float(np.exp(th)), (0.05, 2.0)), center=0, disp=0,
            df=3, scale=1, nugget=1e-8, optimizer=None)
        gp_i.fit(X, y)
        parts.append(gp_i.predict(Xnew, return_std=True))
    m_mix = 0.5 * (np.asarray(parts[0][0]) + np.asarray(parts[1][0]))
    var_mix = 0.5 * sum(np.asarray(s)[:, None] ** 2 + np.asarray(m) ** 2
                        for m, s in parts) - m_mix ** 2
    np.testing.assert_allclose(np.asarray(mean), m_mix, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(std), np.sqrt(var_mix),
                               rtol=1e-6, atol=1e-10)


def test_posterior_predictive_validation():
    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(0.3, (0.05, 2.0)))
    with pytest.raises(ValueError, match='fit'):
        gm.posterior_predictive(gp, np.zeros((3, 1)), np.zeros((2, 1)))
    with pytest.raises(TypeError, match='conjugate'):
        gm.posterior_predictive(object(), np.zeros((3, 1)),
                                np.zeros((2, 1)))
    # X override on an unfitted model requires y
    with pytest.raises(ValueError, match='pass y'):
        gm.posterior_predictive(gp, np.zeros((3, 1)), np.zeros((2, 1)),
                                X=np.linspace(0, 1, 5)[:, None])
    # theta draws must match the kernel's free-dimension count
    fitted = _fit_gp()
    with pytest.raises(ValueError, match='free dimensions'):
        gm.posterior_predictive(fitted, np.zeros((3, 1)), np.zeros((2, 4)))


def test_posterior_predictive_student_degenerate_is_class_predict():
    """CSP: all draws at the fitted theta -> the mixture must equal the
    TRUE per-draw predictive std sqrt(sigma^2 + mu_var) — the diagonal of
    the class return_cov (variance-additive), NOT the return_std
    convention sigma + sqrt(mu_var)."""
    X = np.linspace(0, 1, 12)[:, None]
    x = X[:, 0]
    y = np.column_stack([np.sin(3 * x), np.cos(2 * x) - 1, np.sin(5 * x)])
    csp = gm.ConjugateStudentProcess(kernel=gm.RBF(0.3, (0.05, 2.0)),
                                     center=0, disp=1.0, df=5, scale=1,
                                     nugget=1e-8, optimizer=None)
    csp.fit(X, y)
    assert float(np.asarray(csp.disp_)) > 0  # the Student term is active
    Xnew = np.linspace(-0.1, 1.1, 9)[:, None]
    thetas = np.tile(np.asarray(csp.kernel_.theta), (4, 1))
    mean, std = gm.posterior_predictive(csp, Xnew, thetas)
    m_ref, cov_ref = csp.predict(Xnew, return_cov=True)
    s_ref = np.sqrt(np.clip(np.diag(np.asarray(cov_ref)), 0.0, None))
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m_ref),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(std), np.broadcast_to(s_ref[:, None],
                                         np.asarray(std).shape),
        rtol=1e-6, atol=1e-10)
    # the old (incorrect-for-mixing) convention must NOT match
    _, s_add = csp.predict(Xnew, return_std=True)
    assert np.max(np.abs(np.asarray(s_add) - s_ref)) > 1e-6


def _fit_tgp_lam():
    X = np.linspace(0, 1, 15)[:, None]
    x = X[:, 0]
    orders = np.arange(4)
    cn = np.column_stack([np.sin(3 * x), np.cos(5 * x), np.sin(7 * x + 1),
                          np.cos(2 * x + 2)])
    yn = np.asarray(gm.partials(cn, ratio=0.5))

    def ratio_fn(X_, lam=1.0):
        return jnp.full(X_.shape[0], 0.5 / lam)

    tgp = gm.TruncationGP(kernel=gm.RBF(0.4, (0.1, 2.0)), ref=2.5,
                          ratio=ratio_fn, disp=0, df=3, scale=1,
                          nugget=1e-8, optimizer=None)
    tgp.fit(X, yn, orders=orders)
    return tgp, X, yn, orders


def test_truncation_posterior_predictive_matches_class_per_draw():
    """Each (theta, q) draw's band must equal the class predict of a
    truncation model refitted at that fixed kernel and ratio, and the
    mixture must obey the law of total variance over the draws."""
    tgp, X, yn, orders = _fit_tgp_lam()
    Xnew = np.linspace(0.1, 0.9, 11)[:, None]
    order = 3
    draws = np.array([[np.log(0.3), 0.8], [np.log(0.5), 1.4]])
    mean, std, means_d, stds_d = gm.truncation_posterior_predictive(
        tgp, Xnew, order, draws, ratio_param='lam', return_draws=True)

    parts = []
    for th, lam in draws:
        tgp_i = gm.TruncationGP(
            kernel=gm.RBF(float(np.exp(th)), (0.1, 2.0)), ref=2.5,
            ratio=lambda X_, lam=lam: jnp.full(X_.shape[0], 0.5 / lam),
            disp=0, df=3, scale=1, nugget=1e-8, optimizer=None)
        tgp_i.fit(X, yn, orders=orders)
        m_i, s_i = tgp_i.predict(Xnew, order=order, kind='trunc',
                                 return_std=True)
        parts.append((np.asarray(m_i), np.asarray(s_i)))
    for i, (m_i, s_i) in enumerate(parts):
        np.testing.assert_allclose(np.asarray(means_d[i]), m_i, rtol=1e-8,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(stds_d[i]), s_i, rtol=1e-8)

    m_mix = 0.5 * (parts[0][0] + parts[1][0])
    var_mix = 0.5 * sum(s ** 2 + m ** 2 for m, s in parts) - m_mix ** 2
    np.testing.assert_allclose(np.asarray(mean), m_mix, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(std), np.sqrt(var_mix), rtol=1e-7)


def test_truncation_posterior_predictive_chunking_and_shapes():
    tgp, X, yn, orders = _fit_tgp_lam()
    Xnew = np.linspace(0.1, 0.9, 7)[:, None]
    rng = np.random.RandomState(0)
    # chains-shaped draws (2, 3, 2)
    draws = np.stack([np.column_stack([np.log(0.3 + 0.1 * rng.rand(3)),
                                       0.8 + 0.4 * rng.rand(3)])
                      for _ in range(2)])
    a = gm.truncation_posterior_predictive(tgp, Xnew, 3, draws, 'lam',
                                           chunk=2)
    b = gm.truncation_posterior_predictive(tgp, Xnew, 3, draws, 'lam',
                                           chunk=None)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                               rtol=1e-12)
    assert np.asarray(a[0]).shape == (7,)


def test_truncation_posterior_predictive_validation():
    tgp, X, yn, orders = _fit_tgp_lam()
    with pytest.raises(ValueError, match='theta columns'):
        gm.truncation_posterior_predictive(tgp, X, 3, np.zeros((2, 3)),
                                           'lam')
    un = gm.TruncationGP(kernel=gm.RBF(0.4, (0.1, 2.0)), optimizer=None)
    with pytest.raises(ValueError, match='fit'):
        gm.truncation_posterior_predictive(un, X, 3, np.zeros((2, 2)), 'lam')
