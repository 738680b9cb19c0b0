"""ConjugateGaussianProcess vs the reference: interpolation property,
posterior parity, lml + gradient parity, MAP-optimized fits."""
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

fixed_kernel = gm.RBF(length_scale=1.0, length_scale_bounds="fixed")
kernels = [
    gm.RBF(length_scale=1.0),
    fixed_kernel,
    gm.RBF(length_scale=1.0, length_scale_bounds=(1e-3, 1e3)),
    gm.ConstantKernel(1.0, (1e-2, 1e2))
    * gm.RBF(length_scale=1.0, length_scale_bounds=(1e-3, 1e3)),
    gm.ConstantKernel(1.0, (1e-2, 1e2))
    * gm.RBF(length_scale=1.0, length_scale_bounds=(1e-3, 1e3))
    + gm.ConstantKernel(1e-5, (1e-5, 1e2)),
]
kernel_ids = ['rbf', 'rbf_fixed', 'rbf_bounds', 'c_rbf', 'c_rbf_plus_c']

ref_kernels = [
    sk.RBF(length_scale=1.0),
    sk.RBF(length_scale=1.0, length_scale_bounds="fixed"),
    sk.RBF(length_scale=1.0, length_scale_bounds=(1e-3, 1e3)),
    sk.ConstantKernel(1.0, (1e-2, 1e2))
    * sk.RBF(length_scale=1.0, length_scale_bounds=(1e-3, 1e3)),
    sk.ConstantKernel(1.0, (1e-2, 1e2))
    * sk.RBF(length_scale=1.0, length_scale_bounds=(1e-3, 1e3))
    + sk.ConstantKernel(1e-5, (1e-5, 1e2)),
]


@pytest.mark.parametrize('kernel', kernels, ids=kernel_ids)
@pytest.mark.parametrize('decomposition', ['cholesky', 'eig'])
def test_cgp_interpolation(kernel, decomposition):
    """The reference's main unit test (tests/test.py:63-72)."""
    gpr = gm.ConjugateGaussianProcess(
        kernel=kernel, nugget=0, decomposition=decomposition).fit(X, y)
    y_pred, y_cov = gpr.predict(X, return_cov=True)
    np.testing.assert_almost_equal(np.asarray(y_pred), y, decimal=7)
    np.testing.assert_almost_equal(np.asarray(np.diag(np.asarray(y_cov))), 0.,
                                   decimal=10)


@pytest.mark.parametrize('decomposition', ['cholesky', 'eig'])
def test_fixed_kernel_posterior_parity(decomposition):
    ko = gm.RBF(1.0, 'fixed')
    kr = sk.RBF(1.0, 'fixed')
    gp_o = gm.ConjugateGaussianProcess(kernel=ko, nugget=0,
                                       decomposition=decomposition).fit(X, y)
    gp_r = gref.ConjugateGaussianProcess(kernel=kr, nugget=0,
                                         decomposition=decomposition).fit(X, y)
    for attr in ['center_', 'disp_', 'df_', 'scale_', 'cov_factor_']:
        np.testing.assert_allclose(np.asarray(getattr(gp_o, attr)),
                                   np.asarray(getattr(gp_r, attr)),
                                   atol=1e-9, err_msg=attr)
    # accessors recompute the same values
    np.testing.assert_allclose(np.asarray(gp_o.center()), np.asarray(gp_r.center()),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(gp_o.scale()), np.asarray(gp_r.scale()),
                               atol=1e-9)

    lml_o = float(np.asarray(gp_o.log_marginal_likelihood(np.array([]))))
    lml_r = float(gp_r.log_marginal_likelihood(np.array([])))
    np.testing.assert_allclose(lml_o, lml_r, rtol=1e-10)

    m_o, c_o = gp_o.predict(X2, return_cov=True)
    m_r, c_r = gp_r.predict(X2, return_cov=True)
    np.testing.assert_allclose(np.asarray(m_o), m_r, atol=1e-9)
    np.testing.assert_allclose(np.asarray(c_o), c_r, atol=1e-9)

    m_o, s_o = gp_o.predict(X2, return_std=True)
    m_r, s_r = gp_r.predict(X2, return_std=True)
    np.testing.assert_allclose(np.asarray(s_o), s_r, atol=1e-9)


def test_lml_and_gradient_parity():
    """lml values match the reference; our jax.grad matches *finite
    differences* of the reference's own lml.

    Notably the reference's hand-derived analytic gradient
    (models.py:1041-1056) does NOT match finite differences of its own
    value function (off by ~1e-2–1e-1 when the conjugate updates are
    active), so autodiff is checked against the ground truth instead.
    """
    ko = gm.ConstantKernel(1.5) * gm.RBF(0.9)
    kr = sk.ConstantKernel(1.5) * sk.RBF(0.9)
    gp_o = gm.ConjugateGaussianProcess(kernel=ko, optimizer=None, df=3,
                                       scale=1.3, disp=0.7, center=0.2)
    gp_r = gref.ConjugateGaussianProcess(kernel=kr, optimizer=None, df=3,
                                         scale=1.3, disp=0.7, center=0.2)
    gp_o.fit(X, y)
    gp_r.fit(X, y)
    eps = 1e-6
    for theta in [np.array([0.0, 0.0]), np.array([0.4, -0.6]),
                  np.array([-1.0, 1.0])]:
        lo, go = gp_o.log_marginal_likelihood(theta, eval_gradient=True)
        lr = gp_r.log_marginal_likelihood(theta)
        np.testing.assert_allclose(float(np.asarray(lo)), lr, rtol=1e-9)
        fd = np.zeros_like(theta)
        for i in range(len(theta)):
            tp, tm = theta.copy(), theta.copy()
            tp[i] += eps
            tm[i] -= eps
            fd[i] = (gp_r.log_marginal_likelihood(tp)
                     - gp_r.log_marginal_likelihood(tm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(go), fd, atol=1e-5)


def test_lml_failed_cholesky_is_neg_inf():
    # An absurdly long length scale makes R numerically non-PSD at nugget=0
    ko = gm.RBF(1e8)
    gp = gm.ConjugateGaussianProcess(kernel=ko, nugget=0, optimizer=None)
    gp.fit(X, y)
    val, grad = gp.log_marginal_likelihood(np.array([np.log(1e8)]),
                                           eval_gradient=True)
    assert np.isneginf(float(np.asarray(val)))
    assert np.all(np.isfinite(np.asarray(grad)) | (np.asarray(grad) == 0.0))


def test_optimized_fit_matches_reference():
    ko = gm.ConstantKernel(1.0, (1e-2, 1e2)) * gm.RBF(1.0, (1e-3, 1e3))
    kr = sk.ConstantKernel(1.0, (1e-2, 1e2)) * sk.RBF(1.0, (1e-3, 1e3))
    gp_o = gm.ConjugateGaussianProcess(kernel=ko).fit(X, y)
    gp_r = gref.ConjugateGaussianProcess(kernel=kr).fit(X, y)
    np.testing.assert_allclose(gp_o.kernel_.theta, gp_r.kernel_.theta,
                               atol=1e-5)
    np.testing.assert_allclose(float(gp_o.log_marginal_likelihood_value_),
                               gp_r.log_marginal_likelihood_value_, rtol=1e-8)


def test_multicurve_fit_parity():
    rng = np.random.RandomState(1)
    Y = np.stack([f(X).ravel() + 0.05 * rng.randn(len(X)) for _ in range(3)],
                 axis=1)
    ko = gm.RBF(1.0, 'fixed')
    kr = sk.RBF(1.0, 'fixed')
    gp_o = gm.ConjugateGaussianProcess(kernel=ko, disp=1.0, df=2, scale=1.0).fit(X, Y)
    gp_r = gref.ConjugateGaussianProcess(kernel=kr, disp=1.0, df=2, scale=1.0).fit(X, Y)
    for attr in ['center_', 'disp_', 'df_', 'scale_', 'cov_factor_']:
        np.testing.assert_allclose(np.asarray(getattr(gp_o, attr)),
                                   np.asarray(getattr(gp_r, attr)),
                                   atol=1e-9, err_msg=attr)
    m_o = gp_o.predict(X2)
    m_r = gp_r.predict(X2)
    np.testing.assert_allclose(np.asarray(m_o), m_r, atol=1e-9)


def test_predict_with_conditioning_override():
    ko = gm.RBF(1.0, 'fixed')
    kr = sk.RBF(1.0, 'fixed')
    gp_o = gm.ConjugateGaussianProcess(kernel=ko).fit(X, y)
    gp_r = gref.ConjugateGaussianProcess(kernel=kr).fit(X, y)
    Xc = X[:4]
    yc = y[:4]
    m_o, c_o = gp_o.predict(X2, return_cov=True, Xc=Xc, y=yc)
    m_r, c_r = gp_r.predict(X2, return_cov=True, Xc=Xc, y=yc)
    np.testing.assert_allclose(np.asarray(m_o), m_r, atol=1e-9)
    np.testing.assert_allclose(np.asarray(c_o), c_r, atol=1e-9)
    # pred_noise adds the nugget
    _, c_o2 = gp_o.predict(X2, return_cov=True, Xc=Xc, y=yc, pred_noise=True)
    _, c_r2 = gp_r.predict(X2, return_cov=True, Xc=Xc, y=yc, pred_noise=True)
    np.testing.assert_allclose(np.asarray(c_o2), c_r2, atol=1e-9)


def test_unfitted_predict_uses_prior():
    ko = gm.RBF(1.0, 'fixed')
    kr = sk.RBF(1.0, 'fixed')
    gp_o = gm.ConjugateGaussianProcess(kernel=ko, df=5, scale=1.4)
    gp_r = gref.ConjugateGaussianProcess(kernel=kr, df=5, scale=1.4)
    m_o, c_o = gp_o.predict(X2, return_cov=True)
    m_r, c_r = gp_r.predict(X2, return_cov=True)
    np.testing.assert_allclose(np.asarray(m_o), m_r, atol=1e-12)
    np.testing.assert_allclose(np.asarray(c_o), c_r, atol=1e-12)


def test_cov_requires_df_gt_2():
    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(1.0, 'fixed'), df=1)
    with pytest.raises(ValueError):
        gp.cov(X)


def test_sample_y_shapes_and_stats():
    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(1.0, 'fixed'), nugget=1e-8)
    gp.fit(X, y)
    s = np.asarray(gp.sample_y(X2, n_samples=2000, random_state=0))
    assert s.shape == (len(X2), 2000)
    m_pred, sd_pred = gp.predict(X2, return_std=True)
    np.testing.assert_allclose(s.mean(axis=1), np.asarray(m_pred), atol=0.1)


def test_custom_basis_supported():
    """The reference drops a user basis (models.py:149-151); we honor it."""
    def basis(Xa):
        import jax.numpy as jnp
        return jnp.hstack([jnp.ones((Xa.shape[0], 1)), Xa])

    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(1.0, 'fixed'),
                                     basis=basis, disp=np.eye(2),
                                     center=np.zeros(2)).fit(X, y)
    assert np.asarray(gp.center_).shape == (2,)
    m = gp.predict(X2)
    assert np.all(np.isfinite(np.asarray(m)))


def test_likelihood_method_works():
    """The reference's `likelihood` is broken (models.py:1059-1087); ours works."""
    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(1.0)).fit(X, y)
    ll = float(np.asarray(gp.likelihood(theta=np.array([0.0]))))
    assert np.isfinite(ll)


def test_prior_mutation_invalidates_jit_closures():
    """The jitted lml/fit/predict closures bake the concrete priors and
    nugget as constants; their cache keys on the VALUES, so sklearn-style
    post-construction mutation must retrace instead of silently reusing
    the stale closure."""
    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(1.0), df=3, scale=1,
                                     nugget=1e-8, optimizer=None)
    gp.fit(X, y)
    l_before = float(np.asarray(gp.log_marginal_likelihood(np.array([0.0]))))

    gp._df_0 = 10.0
    gp.nugget = 1e-2
    gp.fit(X, y)
    l_after = float(np.asarray(gp.log_marginal_likelihood(np.array([0.0]))))

    want = gm.ConjugateGaussianProcess(kernel=gm.RBF(1.0), df=10, scale=1,
                                       nugget=1e-2, optimizer=None)
    want.fit(X, y)
    l_want = float(np.asarray(want.log_marginal_likelihood(np.array([0.0]))))
    assert l_after != l_before
    np.testing.assert_allclose(l_after, l_want, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gp.df_), np.asarray(want.df_))
    np.testing.assert_allclose(np.asarray(gp.scale_), np.asarray(want.scale_),
                               rtol=1e-12)


def test_chol_engine_blocked_threads_through_model(monkeypatch):
    """chol_engine='blocked' routes fit/lml/predict factorizations through
    the GEMM-dominated blocked engine (ops.blockchol) and reproduces the
    XLA-engine results — the r2 verdict's 'fast engines unreachable from
    the user-facing models' wiring (gsum_tpu/models.py:_resolve_chol_fn)."""
    import gsum_tpu.ops.blockchol as bc

    calls = []
    real = bc.batched_blocked_cholesky

    def spy(K, *a, **kw):
        calls.append(tuple(K.shape))
        return real(K, *a, **kw)

    monkeypatch.setattr(bc, 'batched_blocked_cholesky', spy)

    rng = np.random.RandomState(3)
    Xl = np.linspace(0.0, 1.0, 40)[:, None]
    yl = np.stack([np.sin(3 * Xl[:, 0]) + 0.1 * rng.randn(40)
                   for _ in range(2)], axis=-1)
    kernel = gm.RBF(0.5, (1e-2, 1e2))

    gp_b = gm.ConjugateGaussianProcess(
        kernel=kernel, df=3, scale=1, nugget=1e-8,
        chol_engine='blocked').fit(Xl, yl)
    assert calls, 'blocked engine was never invoked'
    gp_x = gm.ConjugateGaussianProcess(
        kernel=kernel, df=3, scale=1, nugget=1e-8,
        chol_engine='xla').fit(Xl, yl)

    # rtol: the two engines run the SAME optimizer on objectives that
    # differ only in summation order (blocked custom-VJP adjoint vs XLA's
    # native Cholesky adjoint, ~1e-15 gradient round-off), but L-BFGS
    # stopping points amplify that through the objective's flat top —
    # observed 4e-7 relative theta spread at this seed after the round-4
    # fused solve+logdet adjoint.  The lml/posterior agreement below is
    # the meaningful equivalence; theta gets 2.5x margin over the
    # observed spread (rtol 1e-6) so a real engine regression still trips.
    np.testing.assert_allclose(np.asarray(gp_b.kernel_.theta),
                               np.asarray(gp_x.kernel_.theta), rtol=1e-6)
    # rtol: the recursive blocked factorization sums in a different order
    # than XLA's (observed ~8e-9 relative on this lml) — roundoff, not model
    np.testing.assert_allclose(
        float(np.asarray(gp_b.log_marginal_likelihood_value_)),
        float(np.asarray(gp_x.log_marginal_likelihood_value_)), rtol=1e-6)
    # predictions are evaluated at each engine's OWN fitted theta, so the
    # flatness-bounded theta spread above propagates (observed 2e-7 rel on
    # the means at this seed) — same 2.5x-margin rtol as the theta check
    mb, sb = gp_b.predict(X2, return_std=True)
    mx, sx = gp_x.predict(X2, return_std=True)
    np.testing.assert_allclose(np.asarray(mb), np.asarray(mx), rtol=1e-6,
                               atol=1e-10)
    # the stds amplify the theta spread more than the means: X2
    # extrapolates far outside the [0, 1] training window, where the
    # predictive variance is steeply lengthscale-sensitive (measured
    # 2.8e-6 rel at this seed vs 2e-7 on the means) — 3.5x margin over
    # that observation
    np.testing.assert_allclose(np.asarray(sb), np.asarray(sx), rtol=1e-5,
                               atol=1e-10)


def test_chol_engine_auto_routes_large_f32_on_tpu():
    """The 'auto' engine's routing rule (docs/perf.md round 3): blocked
    only for BATCHED (B>=2) N>512 float32 on a TPU backend; single
    matrices stay on XLA (measured 11.9 TF/s at B=1 N=4096 — the blocked
    engine's win is a batched phenomenon), as does f64 of any size
    (emulated-f64 bounds every engine)."""
    import jax.numpy as jnp
    from unittest import mock

    from gsum_tpu import models as M

    with mock.patch.object(M.jax, 'default_backend', lambda: 'tpu'):
        with mock.patch.object(M, '_blocked_chol',
                               side_effect=lambda R: ('blocked', R)) as mb:
            big32_b = jnp.zeros((2, 600, 600), jnp.float32)
            assert M._auto_chol(big32_b)[0] == 'blocked'
            assert mb.call_count == 1
            # single matrix, small f32, and f64 of any size stay on XLA
            big32_single = jnp.eye(600, dtype=jnp.float32)
            np.testing.assert_allclose(np.asarray(M._auto_chol(big32_single)),
                                       np.eye(600))
            small = jnp.eye(64, dtype=jnp.float32)
            np.testing.assert_allclose(np.asarray(M._auto_chol(small)),
                                       np.eye(64))
            big64 = jnp.eye(600, dtype=jnp.float64)
            np.testing.assert_allclose(np.asarray(M._auto_chol(big64)),
                                       np.eye(600))
            assert mb.call_count == 1


def test_chol_engine_validated_eagerly():
    with pytest.raises(ValueError):
        gm.ConjugateGaussianProcess(chol_engine='nope')
