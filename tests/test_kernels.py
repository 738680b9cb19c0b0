"""Kernel protocol and value parity against scikit-learn."""
import jax.numpy as jnp
import numpy as np
import pytest

import gsum_tpu.kernels as gk

sk = pytest.importorskip('sklearn.gaussian_process.kernels')

X = np.random.RandomState(0).randn(7, 2)
Y = X[:4] + 0.3


def pairs():
    return [
        (gk.RBF(1.3), sk.RBF(1.3)),
        (gk.RBF([1.3, 0.7]), sk.RBF([1.3, 0.7])),
        (gk.ConstantKernel(2.0) * gk.RBF(1.5) + gk.WhiteKernel(0.1),
         sk.ConstantKernel(2.0) * sk.RBF(1.5) + sk.WhiteKernel(0.1)),
        (gk.Matern(0.8, nu=2.5), sk.Matern(0.8, nu=2.5)),
        (gk.Matern(0.8, nu=1.5), sk.Matern(0.8, nu=1.5)),
        (gk.Matern(0.8, nu=0.5), sk.Matern(0.8, nu=0.5)),
        (gk.RationalQuadratic(0.9, 1.4), sk.RationalQuadratic(0.9, 1.4)),
        (gk.ExpSineSquared(0.9, 1.4), sk.ExpSineSquared(0.9, 1.4)),
        (gk.DotProduct(0.5), sk.DotProduct(0.5)),
        (gk.ConstantKernel(1.0, 'fixed') * gk.RBF(1.0, 'fixed'),
         sk.ConstantKernel(1.0, 'fixed') * sk.RBF(1.0, 'fixed')),
    ]


@pytest.mark.parametrize('ours,theirs', pairs(),
                         ids=[str(p[1]) for p in pairs()])
def test_kernel_parity(ours, theirs):
    assert np.allclose(ours.theta, theirs.theta)
    assert np.allclose(ours.bounds, theirs.bounds)
    assert ours.n_dims == theirs.n_dims

    K_o, dK_o = ours(X, eval_gradient=True)
    K_t, dK_t = theirs(X, eval_gradient=True)
    np.testing.assert_allclose(np.asarray(K_o), K_t, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dK_o), dK_t, atol=1e-10)

    np.testing.assert_allclose(np.asarray(ours(X, Y)), theirs(X, Y), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.diag(X)), theirs.diag(X), atol=1e-12)


@pytest.mark.parametrize('ours,theirs', pairs()[:3],
                         ids=[str(p[1]) for p in pairs()[:3]])
def test_clone_with_theta(ours, theirs):
    o2 = ours.clone_with_theta(ours.theta + 0.1)
    t2 = theirs.clone_with_theta(theirs.theta + 0.1)
    np.testing.assert_allclose(np.asarray(o2(X)), t2(X), atol=1e-12)
    # the original is untouched
    np.testing.assert_allclose(np.asarray(ours(X)), theirs(X), atol=1e-12)


def test_theta_setter_roundtrip():
    k = gk.ConstantKernel(2.0) * gk.RBF(1.5) + gk.WhiteKernel(0.1)
    theta = k.theta.copy()
    k.theta = theta + 0.25
    np.testing.assert_allclose(k.theta, theta + 0.25)


def test_fixed_excluded_from_theta():
    k = gk.ConstantKernel(2.0, 'fixed') * gk.RBF(1.5)
    assert k.n_dims == 1
    ks = sk.ConstantKernel(2.0, 'fixed') * sk.RBF(1.5)
    assert np.allclose(k.theta, ks.theta)


def test_operators_with_scalars():
    k = 2.0 * gk.RBF(1.0) + 0.5
    ks = 2.0 * sk.RBF(1.0) + 0.5
    np.testing.assert_allclose(np.asarray(k(X)), ks(X), atol=1e-12)


def test_exponentiation():
    k = gk.RBF(1.0) ** 2
    ks = sk.RBF(1.0) ** 2
    np.testing.assert_allclose(np.asarray(k(X)), ks(X), atol=1e-12)
    assert np.allclose(k.theta, ks.theta)


def test_kernel_equality():
    assert gk.RBF(1.0) == gk.RBF(1.0)
    assert gk.RBF(1.0) != gk.RBF(1.0, 'fixed')
    assert gk.RBF(1.0) * gk.WhiteKernel(1.0) == gk.WhiteKernel(1.0) * gk.RBF(1.0)


def test_white_kernel_cross_is_zero():
    k = gk.WhiteKernel(0.7)
    assert np.allclose(np.asarray(k(X, X)), 0.0)
    assert np.allclose(np.asarray(k(X)), 0.7 * np.eye(len(X)))


# ---------------------------------------------------------------------------
# general real-nu Matern (Temme-series K_nu; reference accepts any sklearn
# Matern, reference models.py:12)
# ---------------------------------------------------------------------------

def test_kv_real_order_vs_scipy():
    from scipy.special import kv as scipy_kv

    from gsum_tpu.kernels import _kv_real_order

    x = np.concatenate([np.geomspace(1e-6, 1.999, 25),
                        np.linspace(2.0, 30.0, 25)])
    for nu in [0.05, 0.49, 0.75, 0.999, 1.3, 3.7, 9.99, 20.0]:
        ours = np.asarray(_kv_real_order(nu, jnp.asarray(x)))
        ref = scipy_kv(nu, x)
        np.testing.assert_allclose(ours, ref, rtol=5e-12)


@pytest.mark.parametrize('nu', [0.75, 1.0, 3.7])
@pytest.mark.parametrize('ls', [0.3, [0.5, 1.2]])
def test_matern_general_nu_vs_sklearn(nu, ls):
    Xg = np.random.default_rng(3).uniform(0, 2, (12, 2))
    ours = gk.Matern(length_scale=ls, nu=nu)
    theirs = sk.Matern(length_scale=ls, nu=nu)
    np.testing.assert_allclose(np.asarray(ours(Xg)), theirs(Xg), atol=1e-13)
    # cross-covariance path too
    np.testing.assert_allclose(np.asarray(ours(Xg[:5], Xg[5:])),
                               theirs(Xg[:5], Xg[5:]), atol=1e-13)


def test_matern_general_nu_grad_matches_fd():
    import jax

    Xg = np.random.default_rng(4).uniform(0, 1.5, (10, 1))
    k = gk.Matern(0.4, nu=0.75)

    def f(theta):
        return jnp.sum(jnp.sin(k.value_fn(theta, jnp.asarray(Xg), None)))

    th = jnp.asarray(np.log([0.4]))
    g = float(jax.grad(f)(th)[0])
    eps = 1e-6
    fd = float((f(th + eps) - f(th - eps)) / (2 * eps))
    np.testing.assert_allclose(g, fd, rtol=1e-6)


def test_matern_general_nu_fit_runs():
    """A CGP with Matern(nu=0.75) must MAP-fit end-to-end (the sklearn
    portability case VERDICT r3 flagged)."""
    import gsum_tpu as gm

    Xg = np.linspace(0, 1, 12)[:, None]
    y = np.column_stack([np.sin(3 * Xg[:, 0]), np.cos(2 * Xg[:, 0]) - 1])
    gp = gm.ConjugateGaussianProcess(
        kernel=gk.Matern(0.3, (0.05, 2.0), nu=0.75), center=0, disp=0,
        df=3, scale=1, nugget=1e-8)
    gp.fit(Xg, y)
    assert np.isfinite(float(np.asarray(gp.likelihood())))
    m, s = gp.predict(Xg, return_std=True)
    assert np.all(np.isfinite(np.asarray(m))) and np.all(
        np.isfinite(np.asarray(s)))


def test_matern_general_nu_validation_and_derivs_gate():
    from gsum_tpu.derivs import max_kernel_deriv_order

    with pytest.raises(ValueError, match='nu > 0'):
        gk.Matern(nu=-1.0)
    with pytest.raises(ValueError, match='nu=inf'):
        gk.Matern(nu=200.0)
    assert max_kernel_deriv_order(gk.Matern(nu=0.75)) == 0
    assert max_kernel_deriv_order(gk.Matern(nu=2.5)) == 2
