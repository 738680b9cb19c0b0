"""Kernel protocol and value parity against scikit-learn."""
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
