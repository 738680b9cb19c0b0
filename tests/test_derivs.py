R"""Derivative observations / constraints (gsum_tpu.derivs).

The reference prototypes this capability in examples/Constraints.ipynb
(hand-derived RBF derivative kernels + Hermite factors) but never ships it
in the library API.  Here the autodiff-built derivative cross-covariances
are validated against (a) independently-implemented closed-form RBF
derivative formulas (the same math as the reference prototype's
d_rbf/d2_rbf, Constraints.ipynb cell 2), (b) central finite differences
for composite kernels, and (c) conditioning invariants on constrained
truncation processes: pinning the slope of the truncation error must pin
the slope of every posterior draw.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import gsum_tpu as gm
from gsum_tpu.derivs import (deriv_basis, deriv_cov, deriv_mean,
                             kernel_deriv_cov, normalize_orders)


# ----------------------------------------------------------------------
# Closed-form RBF oracle (numpy, independent of the library)
# ----------------------------------------------------------------------
def _rbf_np(x, xp, ls):
    tau = x[:, None] - xp[None, :]
    return np.exp(-0.5 * tau ** 2 / ls ** 2), tau


def rbf_d0_d1(x, xp, ls):
    """cov[f(x), f'(xp)] = d/dxp k = +tau/ls^2 * k  (tau = x - xp)."""
    k, tau = _rbf_np(x, xp, ls)
    return tau / ls ** 2 * k


def rbf_d1_d1(x, xp, ls):
    """cov[f'(x), f'(xp)] = (1/ls^2 - tau^2/ls^4) k."""
    k, tau = _rbf_np(x, xp, ls)
    return (1.0 / ls ** 2 - tau ** 2 / ls ** 4) * k


def rbf_d2_d0(x, xp, ls):
    """cov[f''(x), f(xp)] = (tau^2/ls^4 - 1/ls^2) k."""
    k, tau = _rbf_np(x, xp, ls)
    return (tau ** 2 / ls ** 4 - 1.0 / ls ** 2) * k


def rbf_d2_d2(x, xp, ls):
    """cov[f''(x), f''(xp)] = (3/ls^4 - 6 tau^2/ls^6 + tau^4/ls^8) k."""
    k, tau = _rbf_np(x, xp, ls)
    return (3.0 / ls ** 4 - 6.0 * tau ** 2 / ls ** 6
            + tau ** 4 / ls ** 8) * k


def test_normalize_orders_shapes_and_validation():
    assert normalize_orders(None, 3, 2).shape == (3, 2)
    np.testing.assert_array_equal(normalize_orders([0, 1, 2], 3, 1),
                                  [[0], [1], [2]])
    with pytest.raises(ValueError):
        normalize_orders([0, 1], 2, 2)          # ambiguous 1d for 2 features
    with pytest.raises(ValueError):
        normalize_orders([-1], 1, 1)            # negative order
    with pytest.raises(ValueError):
        normalize_orders([0.5], 1, 1)           # non-integer order


def test_rbf_deriv_cov_matches_closed_form():
    ls = 0.7
    x = np.linspace(0.0, 1.0, 5)
    xp = np.linspace(0.1, 0.9, 4)
    kern = gm.RBF(ls, (1e-2, 1e2))
    X, Xp = x[:, None], xp[:, None]

    for orders, oracle in [
        ((0, 1), rbf_d0_d1),
        ((1, 1), rbf_d1_d1),
        ((2, 0), rbf_d2_d0),
        ((2, 2), rbf_d2_d2),
    ]:
        a, b = orders
        got = np.asarray(kernel_deriv_cov(
            kern, X, np.full(len(x), a), Xp, np.full(len(xp), b)))
        np.testing.assert_allclose(got, oracle(x, xp, ls), rtol=1e-12,
                                   atol=1e-14, err_msg=str(orders))


def test_zero_orders_reproduce_kernel_values():
    kern = gm.ConstantKernel(2.5, (1e-2, 1e2)) * gm.RBF(0.4, (1e-2, 1e2))
    X = np.random.RandomState(0).rand(6, 2)
    got = np.asarray(kernel_deriv_cov(kern, X, None))
    np.testing.assert_allclose(got, np.asarray(kern(X)), rtol=1e-13)


def test_mixed_orders_single_matrix():
    """One call with per-point mixed orders equals the blockwise oracle."""
    ls = 0.5
    x = np.array([0.0, 0.3, 0.8])
    d = np.array([0, 1, 0])
    kern = gm.RBF(ls, (1e-2, 1e2))
    got = np.asarray(kernel_deriv_cov(kern, x[:, None], d))

    k, _ = _rbf_np(x, x, ls)
    want = k.copy()
    # row/col 1 is a slope observation; d/dx k = -tau/ls^2 k = -(d/dxp k)
    want[1, :] = -rbf_d0_d1(x, x, ls)[1, :]
    want[:, 1] = rbf_d0_d1(x, x, ls)[:, 1]
    want[1, 1] = rbf_d1_d1(x, x, ls)[1, 1]
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_composite_kernel_first_deriv_finite_difference():
    """Autodiff first-derivative cross-covariances vs central differences
    for a composite kernel in 2 features (per-dimension orders)."""
    kern = gm.ConstantKernel(1.7, (1e-2, 1e2)) * gm.RBF([0.6, 0.9]) \
        + gm.RationalQuadratic(0.8, alpha=1.3)
    rng = np.random.RandomState(1)
    X1 = rng.rand(4, 2)
    X2 = rng.rand(3, 2)
    theta = jnp.asarray(kern.theta)
    frozen = kern.clone()

    def k_pair(x, xp):
        return float(np.asarray(frozen.value_fn(
            jnp.asarray(theta), jnp.asarray(x)[None], jnp.asarray(xp)[None])[0, 0]))

    h = 1e-5
    for dim in (0, 1):
        d1 = np.zeros((4, 2), dtype=int)
        d1[:, dim] = 1
        got = np.asarray(kernel_deriv_cov(kern, X1, d1, X2, None))
        want = np.empty((4, 3))
        for i in range(4):
            for j in range(3):
                xp_ = X1[i].copy()
                xm_ = X1[i].copy()
                xp_[dim] += h
                xm_[dim] -= h
                want[i, j] = (k_pair(xp_, X2[j]) - k_pair(xm_, X2[j])) / (2 * h)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_matern_and_periodic_coincident_derivative_limits():
    """Var[f'(x)] etc. at COINCIDENT points: the kernels' sqrt-guard
    branches carry Taylor polynomials so nested autodiff reads the true
    finite limits (a constant guard silently returns 0 — regression for
    that bug).  Closed forms: Matern(1.5) 3/ls^2, Matern(2.5) 5/(3 ls^2),
    RBF 1/ls^2; periodic and second-order checked by continuity against
    the near-coincident value."""
    ls = 0.7
    X = np.array([[0.3]])
    Xe = np.array([[0.3 + 1e-6]])
    d1 = np.array([[1]])

    for name, kern, want in [
        ('matern15', gm.Matern(ls, (1e-2, 1e2), nu=1.5), 3 / ls ** 2),
        ('matern25', gm.Matern(ls, (1e-2, 1e2), nu=2.5), 5 / (3 * ls ** 2)),
        ('rbf', gm.RBF(ls, (1e-2, 1e2)), 1 / ls ** 2),
        ('expsine', gm.ExpSineSquared(1.1, 0.9), None),
    ]:
        c0 = float(np.asarray(kernel_deriv_cov(kern, X, d1))[0, 0])
        c1 = float(np.asarray(kernel_deriv_cov(kern, X, d1, Xe, d1))[0, 0])
        assert abs(c0 - c1) < 1e-4 * abs(c1), (name, c0, c1)
        assert c0 > 0, name
        if want is not None:
            np.testing.assert_allclose(c0, want, rtol=1e-12, err_msg=name)

    # Matern 2.5 supports second-order observations: continuity check
    k25 = gm.Matern(ls, (1e-2, 1e2), nu=2.5)
    d2 = np.array([[2]])
    v0 = float(np.asarray(kernel_deriv_cov(k25, X, d2))[0, 0])
    v1 = float(np.asarray(kernel_deriv_cov(k25, X, d2, Xe, d2))[0, 0])
    assert abs(v0 - v1) < 1e-3 * abs(v1), (v0, v1)


def test_unsupported_orders_are_rejected():
    """Orders beyond a kernel's differentiability must raise, not silently
    return a zero coincident variance (review finding)."""
    from gsum_tpu.derivs import max_kernel_deriv_order

    X = np.array([[0.3]])
    with pytest.raises(ValueError):
        kernel_deriv_cov(gm.Matern(0.5, nu=0.5), X, np.array([[1]]))
    with pytest.raises(ValueError):
        kernel_deriv_cov(gm.Matern(0.5, nu=1.5), X, np.array([[2]]))
    with pytest.raises(ValueError):
        kernel_deriv_cov(gm.Matern(0.5, nu=2.5), X, np.array([[3]]))
    with pytest.raises(ValueError):
        kernel_deriv_cov(gm.ExpSineSquared(1.0, 1.0), X, np.array([[4]]))
    # composition takes the most restrictive operand
    assert max_kernel_deriv_order(
        gm.ConstantKernel(1.0) * gm.Matern(0.5, nu=1.5)) == 1
    assert max_kernel_deriv_order(
        gm.RBF(0.5) + gm.WhiteKernel(1e-6, 'fixed')) == np.inf

    # the model path validates at fit time with a clear error
    tp, X_, y_, orders = _toy_truncation()
    tp_m = gm.TruncationGP(kernel=gm.Matern(0.3, (1e-2, 10), nu=1.5),
                           ratio=0.45, ref=5.0, df=6, scale=1.0,
                           optimizer=None)
    with pytest.raises(ValueError, match='order'):
        tp_m.fit(X_, y_, orders=orders, dX=np.array([[0.5]]),
                 dy=np.array([0.0]), dderivs=np.array([[2]]))


def test_integer_constraint_points_work():
    """The documented idiom dX=[[0]] arrives as int64; the derivative path
    must float-cast instead of crashing in jax.grad (review finding)."""
    tp, X, y, orders = _toy_truncation()
    tp.fit(X, y, orders=orders, dX=np.array([[0]]), dy=np.array([0.0]),
           dderivs=np.array([[1]]))
    m, std = tp.predict(X[:5], order=3, return_std=True, kind='trunc')
    assert np.isfinite(np.asarray(m)).all()
    assert np.isfinite(np.asarray(std)).all()
    # functional API too
    got = kernel_deriv_cov(gm.RBF(0.5), np.array([[0], [1]]),
                           np.array([0, 1]))
    assert np.isfinite(np.asarray(got)).all()


def test_deriv_cov_honors_d2_with_shared_points():
    """deriv_cov(f, X, d1, d2=other) must compute d1-vs-d2, not silently
    reuse d1 (review finding)."""
    kern = gm.RBF(0.6)
    frozen = kern.clone()
    th = jnp.asarray(frozen.theta)

    def cov_fn(x, xp):
        return frozen.value_fn(th, x[None, :], xp[None, :])[0, 0]

    x = np.array([[0.1], [0.7]])
    d0 = np.zeros((2, 1), dtype=int)
    d1 = np.ones((2, 1), dtype=int)
    got = np.asarray(deriv_cov(cov_fn, x, d0, d2=d1))
    want = np.asarray(deriv_cov(cov_fn, x, d0, x, d1))
    np.testing.assert_allclose(got, want, rtol=1e-13)
    # and it differs from the d1-vs-d1 matrix it used to return
    assert not np.allclose(got, np.asarray(deriv_cov(cov_fn, x, d0)))


def test_expsine_high_order_coincident_continuity():
    """Order-3 observations of the (analytic) periodic kernel: the sq^3
    Taylor term makes the coincident limit continuous (review finding —
    the sq^2 truncation had a ~3.5%% discontinuity at (3,3))."""
    kern = gm.ExpSineSquared(1.1, 0.9)
    X = np.array([[0.3]])
    # offset 1e-3: close enough to probe the limit, far enough that the
    # exact branch's 6th-order autodiff through sqrt hasn't lost all its
    # digits to cancellation (at tau=1e-5 the EXACT branch is off by ~1e2;
    # the Taylor-guard coincident value is the accurate one there)
    Xe = np.array([[0.3 + 1e-3]])
    d3 = np.array([[3]])
    v0 = float(np.asarray(kernel_deriv_cov(kern, X, d3))[0, 0])
    v1 = float(np.asarray(kernel_deriv_cov(kern, X, d3, Xe, d3))[0, 0])
    assert abs(v0 - v1) < 1e-3 * abs(v1), (v0, v1)


def test_matern_periodic_values_match_sklearn_after_guard_change():
    """The Taylor guard branches must not change kernel VALUES anywhere."""
    sk = pytest.importorskip('sklearn.gaussian_process.kernels')
    Xg = np.random.RandomState(0).rand(8, 2)
    Xg = np.vstack([Xg, Xg[:2]])  # duplicated rows exercise the sq==0 branch
    for ko, kr in [(gm.Matern(0.5, nu=1.5), sk.Matern(0.5, nu=1.5)),
                   (gm.Matern(0.5, nu=2.5), sk.Matern(0.5, nu=2.5)),
                   (gm.Matern(0.5, nu=0.5), sk.Matern(0.5, nu=0.5)),
                   (gm.ExpSineSquared(1.1, 0.9),
                    sk.ExpSineSquared(1.1, 0.9))]:
        np.testing.assert_allclose(np.asarray(ko(Xg)), kr(Xg), rtol=1e-12,
                                   atol=1e-14)


def test_extended_deriv_matrix_is_psd():
    """[values; slopes] joint covariance must be PSD (it is the covariance
    of the vector (f(X), f'(X)) under the GP)."""
    kern = gm.RBF(0.5, (1e-2, 1e2))
    x = np.linspace(0, 1, 7)[:, None]
    X_ext = np.vstack([x, x])
    d_ext = np.concatenate([np.zeros(7, dtype=int), np.ones(7, dtype=int)])
    K = np.asarray(kernel_deriv_cov(kern, X_ext, d_ext))
    np.testing.assert_allclose(K, K.T, atol=1e-14)
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-10


# ----------------------------------------------------------------------
# Truncation-process scalarization + derivative constraints
# ----------------------------------------------------------------------
def _toy_truncation(proc_cls=gm.TruncationGP, ratio=0.45, **kws):
    X = np.linspace(0.05, 1.0, 20)[:, None]
    orders = np.arange(4)
    ratio_data = (np.asarray(ratio(jnp.asarray(X))) if callable(ratio)
                  else ratio)
    y = np.asarray(gm.toy_data(X, orders, ratio=ratio_data, ref=5.0, ls=0.3,
                               sd=1.0, rng=3))
    kern = gm.ConstantKernel(1.0, (1e-3, 1e3)) * gm.RBF(0.3, (1e-2, 10))
    tp = proc_cls(kernel=kern, ratio=ratio, ref=5.0, df=6, scale=1.0,
                  optimizer=None, **kws)
    return tp, X, y, orders


def test_trunc_scalar_fns_match_matrix_forms():
    """The scalarized mean/cov/basis used for autodiff must reproduce the
    matrix-path mean/cov/basis exactly at zero derivative order."""
    tp, X, y, orders = _toy_truncation()
    tp.fit(X, y, orders=orders)
    cov_fn, mean_fn, basis_fn = tp._trunc_scalar_fns(start=3, end=np.inf)

    Xs = np.linspace(0.1, 0.9, 6)[:, None]
    zeros = np.zeros((6, 1), dtype=int)
    np.testing.assert_allclose(
        np.asarray(deriv_cov(cov_fn, Xs, zeros)),
        np.asarray(tp.cov(Xs, start=3, end=np.inf)), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(deriv_mean(mean_fn, Xs, zeros)),
        np.asarray(tp.mean(Xs, start=3, end=np.inf)), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(deriv_basis(basis_fn, Xs, zeros)),
        np.asarray(tp.basis(Xs, start=3, end=np.inf)), rtol=1e-12)


def test_trunc_deriv_mean_chain_rule_with_x_dependent_ratio():
    """deriv_mean must differentiate through an x-dependent ratio(X)."""
    def ratio(X):
        return 0.3 + 0.2 * jnp.sin(2.0 * X[:, 0])

    tp, X, y, orders = _toy_truncation(ratio=ratio)
    tp.fit(X, y, orders=orders)
    _, mean_fn, _ = tp._trunc_scalar_fns(start=4, end=np.inf)

    x0 = np.array([[0.4]])
    got = float(np.asarray(deriv_mean(mean_fn, x0, np.array([[1]])))[0])
    h = 1e-6
    mp = float(np.asarray(tp.mean(np.array([[0.4 + h]]), start=4))[0])
    mm = float(np.asarray(tp.mean(np.array([[0.4 - h]]), start=4))[0])
    np.testing.assert_allclose(got, (mp - mm) / (2 * h), rtol=1e-6)


def _slope_pinch(tp, X, y, orders, x0, dderivs, proc='gp'):
    """Fits with a slope constraint at x0 and returns the variance of the
    symmetric difference f(x0+e) - f(x0-e) of the truncation error,
    which approximates (2e)^2 Var[f'(x0)]."""
    tp.fit(X, y, orders=orders, dX=np.array([[x0]]), dy=np.array([0.0]),
           dderivs=dderivs)
    e = 1e-3
    Xq = np.array([[x0 - e], [x0 + e]])
    _, K = tp.predict(Xq, order=int(orders[-1]), return_cov=True,
                      kind='trunc')
    K = np.asarray(K)
    return K[0, 0] + K[1, 1] - 2 * K[0, 1]


def test_truncation_gp_slope_constraint_pins_slope():
    tp, X, y, orders = _toy_truncation()
    x0 = 0.55

    # unconstrained slope variance at x0 (scale reference)
    tp_un, *_ = _toy_truncation()
    tp_un.fit(X, y, orders=orders)
    e = 1e-3
    Xq = np.array([[x0 - e], [x0 + e]])
    _, K_un = tp_un.predict(Xq, order=3, return_cov=True, kind='trunc')
    K_un = np.asarray(K_un)
    q_un = K_un[0, 0] + K_un[1, 1] - 2 * K_un[0, 1]

    q = _slope_pinch(tp, X, y, orders, x0, dderivs=np.array([[1]]))
    # the slope-difference variance collapses by orders of magnitude
    assert q < q_un / 100.0, (q, q_un)

    # the posterior *mean* slope of the truncation error is pinned to the
    # constraint value (0) at x0
    m, _ = tp.predict(Xq, order=3, return_std=True, kind='trunc')
    m = np.asarray(m)
    slope = (m[1] - m[0]) / (2 * e)
    assert abs(slope) < 1e-4, slope

    # a VALUE constraint at the same point does NOT pin the slope
    q_val = _slope_pinch(*(_toy_truncation()[0:1]) + (X, y, orders, x0),
                         dderivs=None)
    assert q_val > q * 100.0, (q_val, q)


def test_truncation_gp_value_and_slope_mixed_constraints():
    """Mixed constraints: value pinned at one point, slope at another."""
    tp, X, y, orders = _toy_truncation()
    dX = np.array([[0.2], [0.7]])
    dy = np.array([0.0, 0.0])
    dd = np.array([[0], [1]])
    tp.fit(X, y, orders=orders, dX=dX, dy=dy, dderivs=dd)

    # value pinned at 0.2: mean ~0 and tiny variance there
    m, std = tp.predict(np.array([[0.2]]), order=3, return_std=True,
                        kind='trunc')
    assert abs(float(np.asarray(m)[0])) < 1e-8
    assert float(np.asarray(std)[0]) < 1e-6

    # slope pinned at 0.7
    e = 1e-3
    Xq = np.array([[0.7 - e], [0.7 + e]])
    mq, Kq = tp.predict(Xq, order=3, return_cov=True, kind='trunc')
    mq, Kq = np.asarray(mq), np.asarray(Kq)
    assert abs((mq[1] - mq[0]) / (2 * e)) < 1e-4
    assert Kq[0, 0] + Kq[1, 1] - 2 * Kq[0, 1] < 1e-10


def test_truncation_gp_all_zero_dderivs_is_value_path():
    """dderivs of all zeros must take the exact value-constraint path."""
    tp, X, y, orders = _toy_truncation()
    tp.fit(X, y, orders=orders, dX=np.array([[0.0]]), dy=np.array([0.0]),
           dderivs=np.array([[0]]))
    assert tp.dderivs_ is None  # routed to the reference-parity path

    tp2, *_ = _toy_truncation()
    tp2.fit(X, y, orders=orders, dX=np.array([[0.0]]), dy=np.array([0.0]))
    Xq = np.linspace(0.1, 0.9, 7)[:, None]
    m1, s1 = tp.predict(Xq, order=3, return_std=True)
    m2, s2 = tp2.predict(Xq, order=3, return_std=True)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_truncation_gp_dderivs_without_dx_raises():
    tp, X, y, orders = _toy_truncation()
    with pytest.raises(ValueError):
        tp.fit(X, y, orders=orders, dderivs=np.array([[1]]))


def test_truncation_tp_slope_constraint():
    """Student-t coefficient process: the derivative-aware conditional
    basis correction must keep the slope pinch intact."""
    tp, X, y, orders = _toy_truncation(proc_cls=gm.TruncationTP)
    x0 = 0.55
    q = _slope_pinch(tp, X, y, orders, x0, dderivs=np.array([[1]]))

    tp_un, *_ = _toy_truncation(proc_cls=gm.TruncationTP)
    tp_un.fit(X, y, orders=orders)
    e = 1e-3
    Xq = np.array([[x0 - e], [x0 + e]])
    _, K_un = tp_un.predict(Xq, order=3, return_cov=True, kind='trunc')
    K_un = np.asarray(K_un)
    q_un = K_un[0, 0] + K_un[1, 1] - 2 * K_un[0, 1]
    assert q < q_un / 100.0, (q, q_un)

    m, _ = tp.predict(Xq, order=3, return_std=True, kind='trunc')
    m = np.asarray(m)
    assert abs((m[1] - m[0]) / (2 * e)) < 1e-4
    assert np.isfinite(np.asarray(tp.predict(Xq, order=3))).all()


def test_checkpoint_roundtrip_derivative_constraints(tmp_path):
    from gsum_tpu.checkpoint import load, save

    tp, X, y, orders = _toy_truncation()
    tp.fit(X, y, orders=orders, dX=np.array([[0.55]]), dy=np.array([0.0]),
           dderivs=np.array([[1]]))
    Xq = np.linspace(0.1, 0.9, 5)[:, None]
    m0, s0 = tp.predict(Xq, order=3, return_std=True)

    path = str(tmp_path / 'tgp_deriv.npz')
    save(path, tp)
    tp2, *_ = _toy_truncation()
    load(path, tp2)
    m1, s1 = tp2.predict(Xq, order=3, return_std=True)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-12)


# ----------------------------------------------------------------------
# Derivative TRAINING data: fit(X, y, dorders=...) on the conjugate models
# (beyond-reference: the reference supports value observations only)
# ----------------------------------------------------------------------
def _deriv_training_set():
    """Values of sin(2x) at 7 points + slopes 2cos(2x) at 5 points."""
    Xv = np.linspace(0, 1, 7)[:, None]
    Xd = np.linspace(0.05, 0.95, 5)[:, None]
    X = np.vstack([Xv, Xd])
    y = np.concatenate([np.sin(2 * Xv[:, 0]), 2 * np.cos(2 * Xd[:, 0])])
    dorders = np.concatenate([np.zeros(7, int), np.ones(5, int)])
    return X, y, dorders


def test_fit_dorders_matches_manual_gp_conditioning():
    X, y, dorders = _deriv_training_set()
    kern = gm.RBF(length_scale=0.6, length_scale_bounds='fixed')
    gp = gm.ConjugateGaussianProcess(kernel=kern, center=0, disp=0,
                                     df=np.inf, scale=1, nugget=1e-10,
                                     optimizer=None)
    gp.fit(X, y, dorders=dorders)

    Xs = np.linspace(0, 1, 31)[:, None]
    m, sd = gp.predict(Xs, return_std=True)
    m, sd = np.asarray(m), np.asarray(sd)

    # manual conditioning with independently-assembled deriv cross-covs
    d_all = dorders[:, None]
    K = np.asarray(kernel_deriv_cov(kern, jnp.asarray(X, float), d_all))
    Ks = np.asarray(kernel_deriv_cov(kern, jnp.asarray(X, float), d_all,
                                     jnp.asarray(Xs, float),
                                     np.zeros((31, 1), int)))
    alpha = np.linalg.solve(K + 1e-10 * np.eye(len(y)), y)
    np.testing.assert_allclose(m, Ks.T @ alpha, atol=1e-9)

    # the slope data pins the interpolant to the truth far better than the
    # value-only fit between nodes
    truth = np.sin(2 * Xs[:, 0])
    assert np.max(np.abs(m - truth)) < 1e-4
    # posterior sd collapses at (and between) the dense observations
    assert np.max(sd) < 1e-3


def test_fit_dorders_eager_and_fused_paths_agree():
    X, y, dorders = _deriv_training_set()
    kern = gm.RBF(length_scale=0.6, length_scale_bounds='fixed')
    Xs = np.linspace(0, 1, 13)[:, None]
    for cls, kw in [(gm.ConjugateGaussianProcess,
                     dict(center=0, disp=0, df=np.inf, scale=1)),
                    (gm.ConjugateStudentProcess,
                     dict(center=0, disp=1, df=3, scale=1))]:
        gp = cls(kernel=kern, nugget=1e-10, optimizer=None, **kw)
        gp.fit(X, y, dorders=dorders)
        m_fused, s_fused = gp.predict(Xs, return_std=True)
        # passing y explicitly routes through the eager path
        m_eager = gp.predict(Xs, y=y)
        np.testing.assert_allclose(np.asarray(m_eager),
                                   np.asarray(m_fused), atol=1e-9)
        assert np.all(np.isfinite(np.asarray(s_fused)))


def test_fit_dorders_zero_orders_reduce_to_value_path():
    Xv = np.linspace(0, 1, 7)[:, None]
    yv = np.sin(2 * Xv[:, 0])
    kern = gm.RBF(length_scale=0.6, length_scale_bounds='fixed')
    kw = dict(center=0, disp=0, df=np.inf, scale=1, nugget=1e-10,
              optimizer=None)
    gp0 = gm.ConjugateGaussianProcess(kernel=kern, **kw)
    gp0.fit(Xv, yv, dorders=np.zeros(7, int))
    assert gp0.dorders_ is None
    gp1 = gm.ConjugateGaussianProcess(kernel=kern, **kw)
    gp1.fit(Xv, yv)
    Xs = np.linspace(0, 1, 11)[:, None]
    np.testing.assert_allclose(np.asarray(gp0.predict(Xs)),
                               np.asarray(gp1.predict(Xs)), rtol=1e-12)


def test_fit_dorders_lml_gradient_matches_finite_difference():
    X, y, dorders = _deriv_training_set()
    gp = gm.ConjugateGaussianProcess(
        kernel=gm.RBF(length_scale=0.7), center=0, disp=0, df=np.inf,
        scale=1, nugget=1e-8, optimizer=None)
    gp.fit(X, y, dorders=dorders)
    theta = np.log([0.7])
    lml, grad = gp.log_marginal_likelihood(theta, eval_gradient=True)
    # h must stay well above the lml's own evaluation noise (~1e-8 from the
    # nested-autodiff covariance assembly feeding a solve): at h=1e-6 the
    # FD quotient drifts by ~3e-4 relative, while h=1e-4 agrees to ~5e-6
    h = 1e-4
    fd = (float(gp.log_marginal_likelihood(theta + h))
          - float(gp.log_marginal_likelihood(theta - h))) / (2 * h)
    np.testing.assert_allclose(np.asarray(grad)[0], fd, rtol=1e-4)


def test_fit_dorders_map_optimization_recovers_length_scale():
    X, y, dorders = _deriv_training_set()
    gp = gm.ConjugateGaussianProcess(
        kernel=gm.RBF(length_scale=1.0, length_scale_bounds=(0.05, 5.0)),
        center=0, disp=0, df=np.inf, scale=1, nugget=1e-10)
    gp.fit(X, y, dorders=dorders)
    ls = float(np.exp(gp.kernel_.theta)[0])
    assert 0.3 < ls < 3.0
    assert np.isfinite(gp.log_marginal_likelihood_value_)


def test_fit_dorders_validation_errors():
    X, y, dorders = _deriv_training_set()
    # WhiteKernel terms are rejected (their noise would silently vanish)
    gp = gm.ConjugateGaussianProcess(
        kernel=gm.RBF(0.6) + gm.WhiteKernel(0.1), optimizer=None)
    with pytest.raises(ValueError, match='WhiteKernel'):
        gp.fit(X, y, dorders=dorders)
    # kernel differentiability limits are enforced
    gp = gm.ConjugateGaussianProcess(kernel=gm.Matern(0.6, nu=1.5),
                                     optimizer=None)
    with pytest.raises(ValueError, match='order 2'):
        gp.fit(X, y, dorders=2 * dorders)
    # the limit bounds each observation's TOTAL order: a mixed d2/dx0dx1
    # observation needs the same 4th coincident kernel derivative as
    # d2/dx0^2, so per-dimension maxima of 1 must not slip through
    gp = gm.ConjugateGaussianProcess(kernel=gm.Matern([0.6, 0.6], nu=1.5),
                                     optimizer=None)
    X2 = np.random.RandomState(0).rand(4, 2)
    with pytest.raises(ValueError, match='total order 2'):
        gp.fit(X2, np.zeros(4), dorders=np.array([[0, 0], [1, 1],
                                                  [0, 0], [0, 0]]))
    # lml at foreign X with mismatched rows is rejected
    kern = gm.RBF(length_scale=0.6, length_scale_bounds='fixed')
    gp = gm.ConjugateGaussianProcess(kernel=kern, center=0, disp=0,
                                     df=np.inf, scale=1, nugget=1e-10,
                                     optimizer=None)
    gp.fit(X, y, dorders=dorders)
    with pytest.raises(ValueError, match='rows'):
        gp.log_marginal_likelihood(np.log([0.6]), X=X[:3], y=y[:3])


def test_fit_dorders_checkpoint_roundtrip(tmp_path):
    from gsum_tpu.checkpoint import load, save

    X, y, dorders = _deriv_training_set()
    kern = gm.RBF(length_scale=0.6, length_scale_bounds='fixed')
    kw = dict(center=0, disp=0, df=np.inf, scale=1, nugget=1e-10,
              optimizer=None)
    gp = gm.ConjugateGaussianProcess(kernel=kern, **kw)
    gp.fit(X, y, dorders=dorders)
    Xs = np.linspace(0, 1, 9)[:, None]
    m0, s0 = gp.predict(Xs, return_std=True)

    path = str(tmp_path / 'gp_dorders.npz')
    save(path, gp)
    gp2 = gm.ConjugateGaussianProcess(kernel=kern, **kw)
    load(path, gp2)
    np.testing.assert_array_equal(np.asarray(gp2.dorders_), dorders[:, None])
    m1, s1 = gp2.predict(Xs, return_std=True)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-12)


def test_fit_dorders_two_features_mixed_partials():
    """2-feature training set mixing values, d/dx0, and d/dx1 observations
    of a separable RBF draw surrogate f(x) = sin(2 x0) * cos(x1)."""
    f = lambda X: np.sin(2 * X[:, 0]) * np.cos(X[:, 1])  # noqa: E731
    fx0 = lambda X: 2 * np.cos(2 * X[:, 0]) * np.cos(X[:, 1])  # noqa: E731
    fx1 = lambda X: -np.sin(2 * X[:, 0]) * np.sin(X[:, 1])  # noqa: E731

    rng = np.random.RandomState(3)
    Xv = rng.rand(12, 2)
    Xd0 = rng.rand(6, 2)
    Xd1 = rng.rand(6, 2)
    X = np.vstack([Xv, Xd0, Xd1])
    y = np.concatenate([f(Xv), fx0(Xd0), fx1(Xd1)])
    dorders = np.vstack([np.zeros((12, 2), int),
                         np.tile([1, 0], (6, 1)),
                         np.tile([0, 1], (6, 1))])

    kern = gm.RBF(length_scale=0.8, length_scale_bounds='fixed')
    gp = gm.ConjugateGaussianProcess(kernel=kern, center=0, disp=0,
                                     df=np.inf, scale=1, nugget=1e-10,
                                     optimizer=None)
    gp.fit(X, y, dorders=dorders)

    Xs = rng.rand(40, 2)
    m = np.asarray(gp.predict(Xs))

    # manual conditioning oracle with independently-assembled matrices
    K = np.asarray(kernel_deriv_cov(kern, jnp.asarray(X, float), dorders))
    Ks = np.asarray(kernel_deriv_cov(kern, jnp.asarray(X, float), dorders,
                                     jnp.asarray(Xs, float),
                                     np.zeros((40, 2), int)))
    alpha = np.linalg.solve(K + 1e-10 * np.eye(len(y)), y)
    np.testing.assert_allclose(m, Ks.T @ alpha, atol=1e-9)

    # the mixed-partial fit should track the surface reasonably well
    assert np.max(np.abs(m - f(Xs))) < 0.15


def test_fit_dorders_sample_y_distribution():
    """sample_y draws from the derivative-data posterior: sample mean and
    pointwise spread track predict()'s mean/std."""
    X, y, dorders = _deriv_training_set()
    kern = gm.RBF(length_scale=0.6, length_scale_bounds='fixed')
    gp = gm.ConjugateGaussianProcess(kernel=kern, center=0, disp=0,
                                     df=np.inf, scale=1, nugget=1e-8,
                                     optimizer=None)
    gp.fit(X, y, dorders=dorders)
    Xs = np.linspace(-0.2, 1.2, 9)[:, None]  # extrapolate so std > 0
    m, sd = (np.asarray(a) for a in gp.predict(Xs, return_std=True))
    draws = np.asarray(gp.sample_y(Xs, n_samples=4000, random_state=11))
    assert draws.shape == (9, 4000)
    np.testing.assert_allclose(draws.mean(axis=1), m,
                               atol=4 * np.max(sd) / np.sqrt(4000) + 1e-9)
    big = sd > 1e-4
    np.testing.assert_allclose(draws.std(axis=1)[big], sd[big], rtol=0.12)


# ----------------------------------------------------------------------
# Derivative PREDICTIONS: predict(X, dorders=...) (beyond-reference)
# ----------------------------------------------------------------------
def test_predict_dorders_matches_finite_difference_of_mean():
    """The posterior slope process equals d/dx of the posterior value mean
    (exchange of conditioning and differentiation), for CGP and CSP."""
    X = np.linspace(0, 1, 15)[:, None]
    y = np.sin(2 * X[:, 0])
    kern = gm.RBF(length_scale=0.4, length_scale_bounds='fixed')
    Xs = np.linspace(0.1, 0.9, 9)[:, None]
    h = 1e-5
    for cls, kw in [(gm.ConjugateGaussianProcess,
                     dict(center=0, disp=0, df=np.inf, scale=1)),
                    (gm.ConjugateStudentProcess,
                     dict(center=0, disp=1, df=5, scale=1))]:
        gp = cls(kernel=kern, nugget=1e-10, optimizer=None, **kw)
        gp.fit(X, y)
        md, sd = (np.asarray(a) for a in
                  gp.predict(Xs, return_std=True, dorders=np.ones(9, int)))
        fd = (np.asarray(gp.predict(Xs + h))
              - np.asarray(gp.predict(Xs - h))) / (2 * h)
        np.testing.assert_allclose(md, fd, atol=1e-6)
        assert np.all(np.isfinite(sd)) and np.all(sd >= 0)
        # tracks the true slope away from the nodes
        assert np.max(np.abs(md - 2 * np.cos(2 * Xs[:, 0]))) < 1e-3


def test_predict_dorders_mixed_rows_cov_psd_and_consistent():
    """One predict call mixing value and slope rows: the value block must
    equal the plain predict covariance, the slope block the dorders-only
    covariance, and the joint matrix must be PSD."""
    X = np.linspace(0, 1, 10)[:, None]
    y = np.sin(2 * X[:, 0])
    kern = gm.RBF(length_scale=0.4, length_scale_bounds='fixed')
    gp = gm.ConjugateGaussianProcess(kernel=kern, center=0, disp=0,
                                     df=np.inf, scale=1, nugget=1e-10,
                                     optimizer=None)
    gp.fit(X, y)
    Xs = np.linspace(0.15, 0.85, 4)[:, None]
    Xq = np.vstack([Xs, Xs])
    d_mixed = np.concatenate([np.zeros(4, int), np.ones(4, int)])
    m, K = (np.asarray(a) for a in
            gp.predict(Xq, return_cov=True, dorders=d_mixed))
    m_v, K_v = (np.asarray(a) for a in gp.predict(Xs, return_cov=True))
    m_d, K_d = (np.asarray(a) for a in
                gp.predict(Xs, return_cov=True, dorders=np.ones(4, int)))
    # rtol reflects summation-order differences between the fused jitted
    # value path and the eager deriv-block assembly (observed ~2e-12)
    np.testing.assert_allclose(m[:4], m_v, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(m[4:], m_d, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(K[:4, :4], K_v, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(K[4:, 4:], K_d, rtol=1e-10, atol=1e-14)
    assert np.min(np.linalg.eigvalsh(K + K.T) / 2) > -1e-10


def test_predict_dorders_composes_with_derivative_training():
    """Slope predictions from a (values + slopes)-trained fit: at slope-
    observation points the posterior slope must interpolate the observed
    slopes with collapsed uncertainty."""
    X, y, dorders = _deriv_training_set()
    kern = gm.RBF(length_scale=0.6, length_scale_bounds='fixed')
    gp = gm.ConjugateGaussianProcess(kernel=kern, center=0, disp=0,
                                     df=np.inf, scale=1, nugget=1e-12,
                                     optimizer=None)
    gp.fit(X, y, dorders=dorders)
    Xd = X[7:]  # the slope-observation points
    md, sd = (np.asarray(a) for a in
              gp.predict(Xd, return_std=True, dorders=np.ones(5, int)))
    np.testing.assert_allclose(md, y[7:], atol=1e-5)
    assert np.max(sd) < 1e-4


def test_predict_dorders_validation():
    X = np.linspace(0, 1, 8)[:, None]
    y = np.sin(X[:, 0])
    gp = gm.ConjugateGaussianProcess(
        kernel=gm.Matern(0.5, (1e-2, 1e2), nu=1.5), center=0, disp=0,
        df=np.inf, scale=1, nugget=1e-10, optimizer=None)
    gp.fit(X, y)
    # slope predictions are fine at nu=1.5, curvature is not
    m = np.asarray(gp.predict(X, dorders=np.ones(8, int)))
    assert np.all(np.isfinite(m))
    with pytest.raises(ValueError, match='order 2'):
        gp.predict(X, dorders=2 * np.ones(8, int))
    # unfitted + White rejections
    with pytest.raises(ValueError, match='fitted'):
        gm.ConjugateGaussianProcess(kernel=gm.RBF(0.5), optimizer=None) \
            .predict(X, dorders=1)
    gpw = gm.ConjugateGaussianProcess(
        kernel=gm.RBF(0.5, (1e-2, 1e2)) + gm.WhiteKernel(0.1, 'fixed'),
        optimizer=None)
    gpw.fit(X, y)
    with pytest.raises(ValueError, match='WhiteKernel'):
        gpw.predict(X, dorders=1)
    # all-zero prediction orders reduce to the plain path
    gp2 = gm.ConjugateGaussianProcess(
        kernel=gm.RBF(0.5, (1e-2, 1e2)), center=0, disp=0, df=np.inf,
        scale=1, nugget=1e-10, optimizer=None)
    gp2.fit(X, y)
    np.testing.assert_allclose(
        np.asarray(gp2.predict(X, dorders=np.zeros(8, int))),
        np.asarray(gp2.predict(X)), rtol=1e-14)


# ----------------------------------------------------------------------
# Derivative predictions of TRUNCATION bands: predict(X, order, dorders=)
# ----------------------------------------------------------------------
def _trunc_setup(cls):
    ratio = 0.5
    orders = np.arange(4)
    x = np.linspace(0, 1, 30)
    X = x[:, None]
    kern = gm.RBF(0.3, (1e-2, 1e2))
    sampler = gm.ConjugateGaussianProcess(kernel=kern, optimizer=None)
    sampler.fit(np.array([[0.0], [1.0]]), np.zeros(2))
    cn = np.asarray(sampler.sample_y(X, n_samples=4, random_state=5))
    yn = np.asarray(gm.partials(cn, ratio=ratio))
    kw = (dict(disp=0, df=np.inf) if cls is gm.TruncationGP
          else dict(disp=1, df=10))
    tgp = cls(kernel=kern, ref=1, ratio=ratio, scale=1, optimizer=None,
              **kw)
    tgp.fit(X[::5], yn[::5], orders=orders)
    return tgp, X, yn, orders


@pytest.mark.parametrize('cls', ['gp', 'tp'])
def test_truncation_predict_dorders_matches_fd(cls):
    """The slope posterior of every band kind equals d/dx of the value
    posterior: mean vs central differences of predict's mean, and the
    derivative covariance diagonal vs the 2-point FD quadratic form of the
    value covariance (which is exact for a linear functional)."""
    cls = gm.TruncationGP if cls == 'gp' else gm.TruncationTP
    tgp, X, yn, orders = _trunc_setup(cls)
    Xs = np.linspace(0.1, 0.9, 7)[:, None]
    h = 1e-5
    n = len(Xs)
    for kind in ['both', 'interp', 'trunc']:
        md = np.asarray(tgp.predict(Xs, order=2, kind=kind,
                                    dorders=np.ones(n, int)))
        fd = (np.asarray(tgp.predict(Xs + h, order=2, kind=kind))
              - np.asarray(tgp.predict(Xs - h, order=2, kind=kind))) / (2 * h)
        np.testing.assert_allclose(md, fd, atol=1e-5, err_msg=kind)

        _, Kd = tgp.predict(Xs, order=2, kind=kind, return_cov=True,
                            dorders=np.ones(n, int))
        _, K = tgp.predict(np.vstack([Xs - h, Xs + h]), order=2, kind=kind,
                           return_cov=True)
        Kd, K = np.asarray(Kd), np.asarray(K)
        di = np.diag_indices(n)
        var_fd = (K[n:, n:][di] + K[:n, :n][di] - 2 * K[n:, :n][di]) \
            / (2 * h) ** 2
        scale = np.max(np.abs(np.diag(Kd))) + 1e-12
        np.testing.assert_allclose(np.diag(Kd) / scale, var_fd / scale,
                                   atol=2e-3, err_msg=kind)


def test_truncation_predict_dorders_with_slope_constraint():
    """Composing a slope CONSTRAINT with slope PREDICTIONS: at the pinned
    point the predicted slope of the truncation error must be the pinned
    value with (near-)zero uncertainty."""
    tgp0, X, yn, orders = _trunc_setup(gm.TruncationGP)
    kern = gm.RBF(0.3, (1e-2, 1e2))
    tgp = gm.TruncationGP(kernel=kern, ref=1, ratio=0.5, disp=0, df=np.inf,
                          scale=1, optimizer=None)
    tgp.fit(X[::5], yn[::5], orders=orders, dX=np.array([[0.5]]),
            dy=np.array([0.0]), dderivs=np.array([[1]]))
    md, sd = (np.asarray(a) for a in
              tgp.predict(np.array([[0.5]]), order=2, return_std=True,
                          kind='trunc', dorders=np.array([1])))
    assert abs(float(np.squeeze(md))) < 1e-8
    assert float(sd[0]) < 1e-7
    # away from the pin the slope is uncertain
    md2, sd2 = (np.asarray(a) for a in
                tgp.predict(np.array([[0.15]]), order=2, return_std=True,
                            kind='trunc', dorders=np.array([1])))
    assert float(sd2[0]) > 1e-3


def test_truncation_predict_dorders_validation_and_zero_reduction():
    tgp, X, yn, orders = _trunc_setup(gm.TruncationGP)
    Xs = np.linspace(0.1, 0.9, 5)[:, None]
    # all-zero orders reduce to the plain path
    np.testing.assert_allclose(
        np.asarray(tgp.predict(Xs, order=2, dorders=np.zeros(5, int))),
        np.asarray(tgp.predict(Xs, order=2)), rtol=1e-13)
    # unfitted rejection
    t2 = gm.TruncationGP(kernel=gm.RBF(0.3, (1e-2, 1e2)), ref=1, ratio=0.5,
                         optimizer=None)
    with pytest.raises(ValueError, match='fitted'):
        t2.predict(Xs, order=2, dorders=np.ones(5, int))
