"""Checkpoint / resume of fitted models."""
import numpy as np
import pytest

import gsum_tpu as gm
from gsum_tpu import checkpoint


def f(x):
    return x * np.sin(x)


X = np.atleast_2d([1., 3., 5., 6., 7., 8.]).T
X2 = np.atleast_2d([2., 4., 5.5]).T
y = f(X).ravel()


def test_save_load_roundtrip(tmp_path):
    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(1.0), df=3, scale=1.2)
    gp.fit(X, y)
    m0, c0 = gp.predict(X2, return_cov=True)

    path = str(tmp_path / 'model')
    checkpoint.save(path, gp)

    gp2 = gm.ConjugateGaussianProcess(kernel=gm.RBF(1.0), df=3, scale=1.2)
    checkpoint.load(path, gp2)
    assert gp2._fit
    np.testing.assert_allclose(gp2.kernel_.theta, gp.kernel_.theta)
    m1, c1 = gp2.predict(X2, return_cov=True)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-12)
    # posterior accessors recompute identically
    np.testing.assert_allclose(np.asarray(gp2.scale()), np.asarray(gp.scale()),
                               atol=1e-12)


def test_save_requires_fit(tmp_path):
    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(1.0))
    with pytest.raises(ValueError):
        checkpoint.save(str(tmp_path / 'model'), gp)


def test_eig_decomposition_roundtrip(tmp_path):
    gp = gm.ConjugateStudentProcess(kernel=gm.RBF(1.0, 'fixed'), df=3,
                                    scale=1.2, disp=1.0,
                                    decomposition='eig')
    gp.fit(X, y)
    m0, s0 = gp.predict(X2, return_std=True)
    path = str(tmp_path / 'm2')
    checkpoint.save(path, gp)
    gp2 = gm.ConjugateStudentProcess(kernel=gm.RBF(1.0, 'fixed'), df=3,
                                     scale=1.2, disp=1.0,
                                     decomposition='eig')
    checkpoint.load(path, gp2)
    m1, s1 = gp2.predict(X2, return_std=True)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-12)


def test_restore_rejects_mismatched_priors(tmp_path):
    """Restoring into a model built with different priors/nugget/
    decomposition must raise, not silently yield inconsistent state
    (ADVICE r1)."""
    import pytest as _pytest

    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(1.0, 'fixed'),
                                     center=0, disp=0, df=3, scale=1.0)
    gp.fit(X, y)
    path = str(tmp_path / 'ck')
    gm.checkpoint.save(path, gp)

    bad_prior = gm.ConjugateGaussianProcess(kernel=gm.RBF(1.0, 'fixed'),
                                            center=0, disp=0, df=7, scale=1.0)
    with _pytest.raises(ValueError, match='df0'):
        gm.checkpoint.load(path, bad_prior)

    bad_nugget = gm.ConjugateGaussianProcess(kernel=gm.RBF(1.0, 'fixed'),
                                             nugget=1e-4, center=0, disp=0,
                                             df=3, scale=1.0)
    with _pytest.raises(ValueError, match='nugget'):
        gm.checkpoint.load(path, bad_nugget)

    ok = gm.ConjugateGaussianProcess(kernel=gm.RBF(1.0, 'fixed'),
                                     center=0, disp=0, df=3, scale=1.0)
    gm.checkpoint.load(path, ok)   # same config restores fine
    np.testing.assert_allclose(np.asarray(ok.center_), np.asarray(gp.center_))


def test_truncation_gp_roundtrip(tmp_path):
    """TruncationGP persists as coeffs-process state + coefficients +
    constraints; predictions match after restore into a fresh instance."""
    import gsum_tpu.checkpoint as ck

    X = np.linspace(0, 1, 15)[:, None]
    orders = np.arange(4)
    y = np.asarray(gm.toy_data(X, orders, ratio=0.5, ref=5, ls=0.4, sd=1.0,
                               rng=3))
    dX = np.array([[0.0]])
    dy = np.zeros(1)

    def make():
        return gm.TruncationGP(kernel=gm.RBF(0.4, 'fixed'), ratio=0.5, ref=5,
                               df=3, scale=1, nugget=1e-8, optimizer=None)

    t1 = make().fit(X, y, orders=orders, dX=dX, dy=dy)
    path = str(tmp_path / 'tgp.npz')
    ck.save(path, t1)

    t2 = ck.load(path, make())
    for kind in ['interp', 'trunc']:
        m1, s1 = t1.predict(X, order=2, return_std=True, kind=kind)
        m2, s2 = t2.predict(X, order=2, return_std=True, kind=kind)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-12)

    # mismatched excluded orders are rejected
    bad = gm.TruncationGP(kernel=gm.RBF(0.4, 'fixed'), ratio=0.5, ref=5,
                          df=3, scale=1, nugget=1e-8, optimizer=None,
                          excluded=[0])
    with pytest.raises(ValueError):
        ck.load(path, bad)


def test_restore_rejects_mismatched_kernel(tmp_path):
    """A checkpoint restored into an instance with a different kernel
    STRUCTURE (class, composition, fixed shape params, or a different
    fixed length-scale) must raise, not silently mis-predict; a free
    kernel with a different initial theta restores exactly."""
    X = np.linspace(0, 1, 8)[:, None]
    y = np.sin(3 * X).ravel()
    gp = gm.ConjugateGaussianProcess(kernel=gm.RBF(0.4, (1e-2, 1e2)),
                                     optimizer=None, df=3, scale=1).fit(X, y)
    arrays, meta = checkpoint.state_dict(gp)

    ok = gm.ConjugateGaussianProcess(kernel=gm.RBF(0.9, (1e-2, 1e2)),
                                     optimizer=None, df=3, scale=1)
    checkpoint.restore_state(ok, arrays, meta)
    np.testing.assert_allclose(np.asarray(ok.predict(X)),
                               np.asarray(gp.predict(X)), rtol=1e-12)

    for bad_kernel in (gm.Matern(0.9, (1e-2, 1e2), nu=1.5),
                       gm.RBF(0.4, 'fixed'),
                       gm.ConstantKernel(1.0, (1e-3, 1e3))
                       * gm.RBF(0.4, (1e-2, 1e2))):
        bad = gm.ConjugateGaussianProcess(kernel=bad_kernel, optimizer=None,
                                          df=3, scale=1)
        with pytest.raises(ValueError, match='kernel'):
            checkpoint.restore_state(bad, arrays, meta)
