R"""Derivative observations and constraints for GP models, via autodiff.

The reference prototypes derivative-constrained GPs in
``examples/Constraints.ipynb`` (reference: Constraints.ipynb cells 2-7):
hand-derived RBF derivative kernels ``d_rbf``/``d2_rbf`` and a general
Hermite-polynomial factor formula for :math:`\partial^a_x \partial^b_{x'}
k_{\mathrm{RBF}}(x, x')`.  That algebra never made it into the library API
(the notebook is scratch work — cell 3 even references an undefined
``K_all``).

This module is the finished, TPU-native version of that capability, and it
is *kernel-generic*: because every kernel in :mod:`gsum_tpu.kernels` (and
every mean/covariance assembled from them by the models) is a pure JAX
function, the cross-covariances between derivative observations

.. math::

    \mathrm{cov}\!\left[\partial^{a} f(x),\, \partial^{b} f(x')\right]
        = \partial^{a}_{x} \partial^{b}_{x'} k(x, x')

are computed with nested ``jax.grad`` instead of per-kernel Hermite
algebra — any differentiable kernel (RBF, Matern nu>=1.5 first order,
RationalQuadratic, products/sums, and the models' full truncation-error
covariance including the x-dependence of ``ratio``/``ref``) gets exact
derivative cross-covariances for free, at any per-dimension multi-order.

Derivative orders are *concrete* (numpy) inputs: points are grouped by
their multi-order on the host and each block is evaluated with a
statically-nested gradient under ``vmap``, so everything stays
jit-compatible with static shapes.

Used by :class:`gsum_tpu.models.TruncationProcess` to support derivative
constraints on the truncation error (``fit(..., dX=, dy=, dderivs=)``),
e.g. enforcing a symmetry slope :math:`\partial_x (y_\infty - y_k) = 0` at
:math:`x = 0` — a strict superset of the reference's value-only
constraint mechanism (reference: models.py:1464-1473).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import _config  # noqa: F401

__all__ = ['normalize_orders', 'deriv_cov', 'deriv_mean', 'deriv_basis',
           'kernel_deriv_cov', 'max_kernel_deriv_order']


def _as_float(X):
    """Promotes integer observation points to the default float dtype:
    nested ``jax.grad``/``jacfwd`` require real-valued inputs, and the
    documented constraint idiom ``dX=[[0]]`` arrives as int64."""
    X = jnp.atleast_2d(jnp.asarray(X))
    if not jnp.issubdtype(X.dtype, jnp.floating):
        X = X.astype(jnp.result_type(float))
    return X


def normalize_orders(d, n_points, n_features):
    """Validates and broadcasts derivative orders to an (N, n_features)
    integer array.

    ``d`` may be None (all zeros: plain value observations), a scalar, an
    (N,) vector (n_features must be 1), or an (N, n_features) array of
    non-negative per-dimension derivative orders.
    """
    if d is None:
        return np.zeros((n_points, n_features), dtype=int)
    d = np.asarray(d)
    if not np.issubdtype(d.dtype, np.integer):
        if not np.all(d == np.round(d)):
            raise ValueError('derivative orders must be integers')
        d = d.astype(int)
    if np.any(d < 0):
        raise ValueError('derivative orders must be >= 0')
    if d.ndim == 0:
        d = np.full((n_points, n_features), int(d))
    elif d.ndim == 1:
        if n_features != 1:
            raise ValueError(
                'a 1d derivative-order array is ambiguous for %d features; '
                'pass shape (n_points, n_features)' % n_features)
        d = d[:, None]
    if d.shape != (n_points, n_features):
        raise ValueError('derivative orders have shape %s, expected %s'
                         % (d.shape, (n_points, n_features)))
    return d


def _group_by_order(d):
    """Groups row indices by their derivative multi-order.

    Returns a list of ``(multi_order_tuple, index_array)`` with concrete
    host-side indices, so each group's block keeps a static gradient
    structure.
    """
    groups = {}
    for i, row in enumerate(np.asarray(d)):
        groups.setdefault(tuple(int(v) for v in row), []).append(i)
    return [(order, np.asarray(idx)) for order, idx in groups.items()]


def _derivatize_pair(f, multi_order, argnum):
    """Applies ``multi_order[dim]`` nested d/dx_dim to a scalar pair
    function ``f(x, xp)`` in its ``argnum``-th argument."""
    for dim, times in enumerate(multi_order):
        for _ in range(int(times)):
            # bind loop variables via defaults: late binding would make
            # every level differentiate the same (last) function
            def f(x, xp, _f=f, _dim=dim):
                return jax.grad(_f, argnums=argnum)(x, xp)[_dim]
    return f


def _derivatize_single(f, multi_order):
    """Same for a single-argument function ``f(x)`` (scalar or vector
    valued — uses jacfwd so vector-valued bases work too)."""
    for dim, times in enumerate(multi_order):
        for _ in range(int(times)):
            def f(x, _f=f, _dim=dim):
                return jax.jacfwd(_f)(x)[..., _dim]
    return f


def deriv_cov(cov_fn, X1, d1, X2=None, d2=None, value_block_fn=None):
    R"""Cross-covariance matrix between derivative observations.

    Parameters
    ----------
    cov_fn : callable ``(x, xp) -> scalar`` — the covariance function on a
        single pair of points (each of shape ``(n_features,)``), traceable
        by JAX.
    X1 : (N1, n_features) observation points
    d1 : derivative orders for X1 (see :func:`normalize_orders`)
    X2, d2 : optional second set; defaults to ``(X1, d1)``
    value_block_fn : callable ``(Xa, Xb) -> (len(Xa), len(Xb))``, optional —
        a fast matrix evaluator for the zero-order × zero-order block
        (e.g. the kernel's native ``value_fn``).  When most observations
        are plain values, this avoids the vmapped per-pair scalar
        evaluation for the dominant block; it must agree with ``cov_fn``.

    Returns
    -------
    (N1, N2) matrix with entry ``[i, j]`` equal to
    :math:`\partial^{d1_i}_{x} \partial^{d2_j}_{x'}\, k(x, x')`
    evaluated at ``(X1[i], X2[j])``.
    """
    X1 = _as_float(X1)
    if X2 is None:
        X2 = X1
        if d2 is None:
            d2 = d1
    else:
        X2 = _as_float(X2)
    n1, nf = X1.shape
    n2 = X2.shape[0]
    d1 = normalize_orders(d1, n1, nf)
    d2 = normalize_orders(d2, n2, nf)

    out = jnp.zeros((n1, n2), dtype=jnp.result_type(X1.dtype, X2.dtype,
                                                    float))
    zero_order = (0,) * nf
    for o1, i1 in _group_by_order(d1):
        f1 = _derivatize_pair(cov_fn, o1, argnum=0)
        for o2, i2 in _group_by_order(d2):
            if (value_block_fn is not None and o1 == zero_order
                    and o2 == zero_order):
                block = value_block_fn(X1[i1], X2[i2])
            else:
                f12 = _derivatize_pair(f1, o2, argnum=1)
                block = jax.vmap(
                    lambda x: jax.vmap(lambda xp: f12(x, xp))(X2[i2]))(X1[i1])
            out = out.at[jnp.ix_(jnp.asarray(i1), jnp.asarray(i2))].set(block)
    return out


def deriv_mean(mean_fn, X, d):
    """Vector of derivative observations of a scalar mean function.

    ``mean_fn(x) -> scalar`` on a single ``(n_features,)`` point; returns
    the (N,) vector of per-point derivatives of the requested orders.
    """
    X = _as_float(X)
    n, nf = X.shape
    d = normalize_orders(d, n, nf)
    out = jnp.zeros((n,), dtype=jnp.result_type(X.dtype, float))
    for o, idx in _group_by_order(d):
        f = _derivatize_single(mean_fn, o)
        vals = jax.vmap(f)(X[idx])
        out = out.at[jnp.asarray(idx)].set(vals)
    return out


def deriv_basis(basis_fn, X, d):
    """Matrix of derivative observations of a vector-valued basis.

    ``basis_fn(x) -> (p,)`` on a single point; returns (N, p) with row i
    the ``d[i]``-derivative of the basis at ``X[i]``.  Used by the
    Student-t mean-uncertainty correction, whose conditional bases must be
    differentiated consistently with the covariance
    (reference: models.py:1527-1570 conditions value bases only).
    """
    X = _as_float(X)
    n, nf = X.shape
    d = normalize_orders(d, n, nf)
    p = basis_fn(X[0]).shape[0]
    out = jnp.zeros((n, p), dtype=jnp.result_type(X.dtype, float))
    for o, idx in _group_by_order(d):
        f = _derivatize_single(basis_fn, o)
        vals = jax.vmap(f)(X[idx])
        out = out.at[jnp.asarray(idx)].set(vals)
    return out


def wrap_value_fn_with_orders(value_fn, d_train):
    R"""Wraps a kernel ``value_fn`` so its FIRST argument's rows carry the
    given (concrete) per-point derivative orders.

    The returned function has the kernel ``value_fn(theta, X, Y)``
    signature the conjugate-model closures program against
    (``gsum_tpu.models``):

    - ``Y is None`` → the full derivative self-covariance of the training
      set (``d_train`` × ``d_train``) — the correlation matrix the
      conjugate updates and the lml consume;
    - ``Y`` given → the (train × new) cross-covariance, new points being
      plain value observations (order 0).

    This is what makes derivative *training data* a drop-in for the
    conjugacy machinery: the normal-scaled-inv-χ² updates only ever see
    an (R, basis) pair, differentiation is linear, and a GP's derivative
    observations are jointly Gaussian with exactly these cross-covariances
    — so the posterior algebra applies verbatim.
    """
    d_train = np.asarray(d_train)

    def wrapped(theta, X, Y=None):
        def cov_fn(x, xp):
            return value_fn(theta, x[None, :], xp[None, :])[0, 0]

        def value_block(Xa, Xb):
            return value_fn(theta, Xa, Xb)

        if Y is None:
            return deriv_cov(cov_fn, X, d_train,
                             value_block_fn=value_block)
        zeros = np.zeros((Y.shape[0], d_train.shape[1]), dtype=int)
        return deriv_cov(cov_fn, X, d_train, Y, zeros,
                         value_block_fn=value_block)

    return wrapped


def max_kernel_deriv_order(kernel):
    R"""Largest per-observation derivative order the kernel supports.

    Observations of :math:`f^{(a)}` need the mixed derivative
    :math:`\partial^a_x \partial^a_{x'} k` to exist at coincident points
    (the diagonal of every constraint covariance).  Per kernel:

    - RBF / RationalQuadratic / DotProduct / Constant: analytic — no limit
      (``inf``);
    - WhiteKernel: no limit *in cross-covariance use* — the two-argument
      form this module evaluates is identically zero, so a ``+ WhiteKernel``
      nugget term simply does not propagate to derivative observations;
    - Matern: ``nu=0.5`` → 0 (the process is not differentiable),
      ``nu=1.5`` → 1, ``nu=2.5`` → 2, ``nu=inf`` → no limit; any other
      ``nu`` → 0 (the general-``nu`` Bessel path's coincident-point
      guard carries only the constant term, so derivative observations
      would silently read wrong limits — value observations only);
    - ExpSineSquared: 3 (analytic, but the coincident-point Taylor guard
      in ``value_fn`` carries terms to sq³ — exact through total order 6);
    - Sum/Product/Exponentiation: the minimum over operands.

    Beyond these orders the guard branches silently return a WRONG (often
    zero) coincident limit, so callers must validate — see
    :func:`kernel_deriv_cov` and ``TruncationProcess.fit(dderivs=)``.
    """
    from . import kernels as _k

    if isinstance(kernel, _k.Matern):
        return {0.5: 0, 1.5: 1, 2.5: 2, np.inf: np.inf}.get(kernel.nu, 0)
    if isinstance(kernel, _k.ExpSineSquared):
        return 3
    if isinstance(kernel, _k.Exponentiation):
        return max_kernel_deriv_order(kernel.kernel)
    if isinstance(kernel, (_k.Sum, _k.Product)):
        return min(max_kernel_deriv_order(kernel.k1),
                   max_kernel_deriv_order(kernel.k2))
    return np.inf


def _check_kernel_orders(kernel, *order_arrays):
    """Each OBSERVATION's total order (summed over features) must stay
    within the kernel's differentiability: an observation of
    d^2 f/dx0 dx1 needs the coincident 4th kernel derivative just like
    d^2 f/dx0^2 does, so per-dimension maxima are not the right bound."""
    limit = max_kernel_deriv_order(kernel)
    worst = 0
    for d in order_arrays:
        d = np.asarray(d)
        if d.size:
            totals = d.sum(axis=-1) if d.ndim > 1 else d
            worst = max(worst, int(np.max(totals)))
    if worst > limit:
        raise ValueError(
            'derivative observations of total order %d requested but '
            'kernel %r only supports order %s observations (beyond it, '
            'coincident-point limits do not exist or are not carried by '
            'the Taylor guards — see derivs.max_kernel_deriv_order)'
            % (worst, kernel, limit))


def kernel_deriv_cov(kernel, X1, d1, X2=None, d2=None, theta=None):
    R"""Derivative cross-covariances of a :mod:`gsum_tpu.kernels` kernel.

    Convenience wrapper: scalarizes ``kernel.value_fn`` onto single point
    pairs and dispatches to :func:`deriv_cov`.  ``theta`` defaults to the
    kernel's current log-parameters.

    Requested orders are validated against the kernel's differentiability
    (:func:`max_kernel_deriv_order`) — e.g. ``Matern(nu=0.5)`` (kinked at
    zero distance) rejects any derivative observation rather than
    silently returning a zero coincident variance.
    """
    X1a = _as_float(X1)
    n1, nf = X1a.shape
    d1n = normalize_orders(d1, n1, nf)
    d2n = d1n if (X2 is None and d2 is None) else normalize_orders(
        d2, _as_float(X2 if X2 is not None else X1).shape[0], nf)
    _check_kernel_orders(kernel, d1n, d2n)

    frozen = kernel.clone()
    th = jnp.asarray(frozen.theta if theta is None else theta)

    def cov_fn(x, xp):
        return frozen.value_fn(th, x[None, :], xp[None, :])[0, 0]

    return deriv_cov(cov_fn, X1a, d1n, X2, d2n)
