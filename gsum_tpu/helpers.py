R"""Series algebra and statistics utilities (TPU-native, JAX).

This module provides the capabilities of the reference ``gsum/helpers.py``
(see /root/reference/gsum/helpers.py) rebuilt on jax.numpy so everything is
jit/vmap/grad-compatible.  Host-side-only conveniences (decorators, the HPD
interval search) remain plain Python since they orchestrate, rather than
perform, numerical work.

Reference parity notes are given per-function as ``reference: file:line``.
"""
from __future__ import annotations

import inspect
from functools import wraps
from math import gamma as _gamma_fn

import jax
import jax.numpy as jnp
import numpy as np

from . import _config  # noqa: F401  (enables x64)
from .linalg import cholesky_errors, mahalanobis, pivoted_cholesky, spd_logdet, stabilize  # noqa: F401

__all__ = [
    'cartesian', 'toy_data', 'coefficients', 'partials', 'stabilize', 'geometric_sum',
    'predictions', 'gaussian', 'hpd', 'kl_gauss', 'rbf', 'default_attributes',
    'cholesky_errors', 'mahalanobis', 'VariogramFourthRoot', 'median_pdf', 'hpd_pdf',
    'pivoted_cholesky', 'generate_coefficients', 'lazy_property', 'lazy',
]


def cartesian(*arrays):
    """Makes the Cartesian product of 1d arrays.

    Earlier arrays loop more slowly than later ones; result has shape
    ``(N_1 * ... * N_p, p)``.  reference: helpers.py:19-33.
    """
    N = len(arrays)
    arrays = [jnp.asarray(a) for a in arrays]
    return jnp.stack(jnp.meshgrid(*arrays, indexing='ij'), -1).reshape(-1, N)


def coefficients(y, ratio, ref=1, orders=None):
    """Extracts power-series coefficients from partial sums.

    ``c_n = (y_n - y_{n-1}) / (ref * ratio**n)`` with the leading term kept.
    reference: helpers.py:71-101.

    Parameters
    ----------
    y : array, shape = (n_samples, n_curves)
    ratio : scalar or (n_samples,) array
    ref : scalar or (n_samples,) array
    orders : 1d array, optional. Defaults to ``0..n_curves-1``.
    """
    y = jnp.asarray(y)
    if y.ndim != 2:
        raise ValueError('y must be 2d')
    if orders is None:
        orders = jnp.arange(y.shape[-1])
    orders = jnp.atleast_1d(jnp.asarray(orders))
    if orders.shape[0] != y.shape[-1]:
        raise ValueError('partials and orders must have the same length')

    ref = jnp.atleast_1d(jnp.asarray(ref))[:, None]
    ratio = jnp.atleast_1d(jnp.asarray(ratio))[:, None]

    coeffs = jnp.diff(y, axis=-1)
    coeffs = jnp.concatenate([y[..., :1], coeffs], axis=-1)
    return coeffs / (ref * ratio ** orders)


def partials(coeffs, ratio, ref=1, orders=None):
    R"""Partial sums :math:`y_k = y_{ref} \sum_{n=0}^k c_n Q^n` from coefficients.

    Inverse of :func:`coefficients`.  reference: helpers.py:104-146.
    """
    coeffs = jnp.asarray(coeffs)
    if orders is None:
        orders = jnp.arange(coeffs.shape[-1])
    orders = jnp.asarray(orders)

    ratio = jnp.atleast_1d(jnp.asarray(ratio))
    if ratio.ndim == 1:
        ratio = ratio[:, None]
    ref = jnp.atleast_1d(jnp.asarray(ref))
    if ref.ndim == 1:
        ref = ref[:, None]

    terms = ref * coeffs * ratio ** orders
    return jnp.cumsum(terms, axis=-1)


def geometric_sum(x, start, end, excluded=None):
    R"""Geometric sum :math:`S = \sum_{i=start}^{end} x^i` with optional excluded orders.

    ``end`` may be ``np.inf`` (requires |x| < 1 for convergence).
    reference: helpers.py:149-182.

    ``start``/``end``/``excluded`` are static Python ints so the result stays
    jit-traceable in ``x``.
    """
    if end < start:
        raise ValueError('end must be greater than or equal to start')
    x = jnp.asarray(x)
    if np.isinf(end):
        s = x ** start / (1 - x)
    else:
        s = (x ** start - x ** (end + 1)) / (1 - x)
    if excluded is not None:
        for n in np.atleast_1d(excluded):
            if (n >= start) and (n <= end):
                s = s - x ** n
    return s


def predictions(dist, dob=None):
    """Mean and optional degree-of-belief intervals of a distribution object.

    reference: helpers.py:206-230.
    """
    mean = dist.mean()
    if dob is not None:
        dob = jnp.atleast_2d(jnp.asarray(dob)).T
        interval = jnp.asarray(dist.interval(dob))
        interval = interval.transpose((1, 0, 2))
        return mean, jnp.squeeze(interval)
    return mean


def gaussian(X, Xp=None, ls=1):
    """Gaussian (squared-exponential) correlation function.

    reference: helpers.py:233-251.
    """
    X = jnp.asarray(X) * (1.0 / ls)
    X2 = jnp.sum(X ** 2, axis=1)
    if Xp is None:
        Xp = X
    else:
        Xp = jnp.asarray(Xp) * (1.0 / ls)
    Xp2 = jnp.sum(Xp ** 2, axis=1)
    sqd = -2.0 * X @ Xp.T + (X2[:, None] + Xp2[None, :])
    sqd = jnp.clip(sqd, 0.0, jnp.inf)
    return jnp.exp(-0.5 * sqd)


def rbf(X, Xp=None, ls=1):
    """RBF correlation from pairwise Euclidean distances.  reference: helpers.py:254-261."""
    X = jnp.asarray(X)
    if Xp is None:
        Xp = X
    else:
        Xp = jnp.asarray(Xp)
    diff = X[:, None, ...] - Xp[None, ...]
    dist = jnp.linalg.norm(diff, axis=-1)
    if ls == 0:
        return jnp.where(dist == 0, 1., 0.)
    return jnp.exp(-0.5 * dist ** 2 / ls ** 2)


def hpd(dist, alpha, *args):
    R"""Highest-probability-density interval of a distribution via its ppf.

    Minimizes the interval length over the CDF start point (host-side
    golden-section refinement of a Nelder-Mead-style search, matching the
    reference's use of ``scipy.optimize.fmin``).  reference: helpers.py:264-278.
    """
    from scipy.optimize import fmin

    if args:
        dist = dist(*args)

    def interval_length(start_):
        start_ = float(np.asarray(start_).reshape(())) if np.ndim(start_) else float(start_)
        return float(dist.ppf(start_ + alpha) - dist.ppf(start_))

    def interval_length_arr(start_):
        s = float(np.asarray(start_).ravel()[0])
        return interval_length(s)

    start = fmin(interval_length_arr, 1 - alpha, ftol=1e-8, disp=False)[0]
    return np.asarray(dist.ppf(np.array([start, alpha + start])))


def hpd_pdf(pdf, alpha, x):
    R"""HPD interval from a tabulated pdf.  reference: helpers.py:281-295.

    Host-side numpy (plotting-path utility): the reference integrates the
    *compressed* above-threshold samples with the trapezoid rule, which is
    shape-dynamic and so stays off the jit path.
    """
    pdf = np.asarray(pdf)
    x = np.asarray(x)

    def err_fn(p):
        prob = np.trapezoid(pdf[pdf >= p], x=x[pdf >= p])
        return (prob - alpha) ** 2

    heights = np.unique(pdf)
    errs = np.array([err_fn(h) for h in heights])
    horizontal = heights[np.argmin(errs)]
    interval = x[pdf > horizontal]
    return jnp.array([np.min(interval), np.max(interval)])


def median_pdf(pdf, x):
    R"""Median from a tabulated pdf.  reference: helpers.py:298-307.

    Returns the first grid point where the cumulative trapezoid integral
    exceeds one half.
    """
    pdf = jnp.asarray(pdf)
    x = jnp.asarray(x)
    dx = jnp.diff(x)
    cum = jnp.concatenate([
        jnp.zeros((1,), pdf.dtype),
        jnp.cumsum(0.5 * (pdf[1:] + pdf[:-1]) * dx),
    ])
    idx = jnp.argmax(cum > 0.5)
    # If it never exceeds 0.5 the reference returns the last point.
    idx = jnp.where(jnp.any(cum > 0.5), idx, x.shape[0] - 1)
    return x[idx]


def kl_gauss(mu0, cov0, mu1, cov1=None, chol1=None):
    R"""KL divergence between two multivariate Gaussians.

    :math:`D_{KL}(N_0 \| N_1)`; exactly one of ``cov1``/``chol1`` must be
    given.  reference: helpers.py:310-368.
    """
    mu0, mu1 = jnp.atleast_1d(jnp.asarray(mu0)), jnp.atleast_1d(jnp.asarray(mu1))
    cov0 = jnp.atleast_2d(jnp.asarray(cov0))
    if chol1 is not None and cov1 is None:
        chol1 = jnp.atleast_2d(jnp.asarray(chol1))
    elif cov1 is not None and chol1 is None:
        cov1 = jnp.atleast_2d(jnp.asarray(cov1))
        chol1 = jnp.linalg.cholesky(stabilize(cov1))
    else:
        raise ValueError('Exactly one of cov1 or chol1 must be given.')

    k = cov0.shape[0]
    logdet0 = spd_logdet(cov0)
    logdet1 = 2 * jnp.sum(jnp.log(jnp.diag(chol1)))

    right_quad = jax.scipy.linalg.solve_triangular(chol1, mu1 - mu0, lower=True)
    quad = right_quad @ right_quad

    tr_mat = jnp.trace(jax.scipy.linalg.cho_solve((chol1, True), cov0))
    return 0.5 * (tr_mat + quad - k + logdet1 - logdet0)


def general_sqrt_errors(y, mean, sqrt_mat):
    """Whitened residuals for a general (non-triangular) matrix square root.

    The reference version (helpers.py:508-509) is broken — it passes
    ``lower=`` to ``np.linalg.solve``.  This is the corrected behavior,
    via :func:`linalg.general_solve` (no f64 LU lowering on this TPU).
    """
    from .linalg import general_solve

    y = jnp.asarray(y)
    return general_solve(jnp.asarray(sqrt_mat), (y - mean).T).T


def toy_data(X, orders, basis=None, corr=None, beta=0, sd=1, ratio=0.5,
             ref=1, noise=1e-5, rng=None, **corr_kwargs):
    """Sample toy partial-sum curves from a GP over coefficients.

    reference: helpers.py:36-52 — which passes its (n_orders, n_samples)
    draws to ``partials`` untransposed and therefore only works when
    ``len(orders) == len(X)``; here the orientation is corrected so any
    combination works.  ``rng`` may be a jax PRNG key or int seed
    (defaults to 0).
    """
    coeffs = generate_coefficients(
        X, size=len(orders), basis=basis, corr=corr, beta=beta, sd=sd,
        noise=noise, rng=rng, **corr_kwargs)
    return partials(coeffs=coeffs.T, ratio=ratio, ref=ref, orders=orders)


def generate_coefficients(X, size=1, basis=None, corr=None, beta=0, sd=1,
                          noise=1e-5, rng=None, **corr_kwargs):
    """Sample GP coefficient curves.  reference: helpers.py:55-68."""
    X = jnp.asarray(X)
    if corr is None:
        corr = gaussian
    K = sd ** 2 * corr(X, **corr_kwargs)
    K = K + noise ** 2 * jnp.eye(K.shape[0], dtype=K.dtype)

    if basis is None:
        basis_mat = jnp.ones((X.shape[0], 1), dtype=K.dtype)
    else:
        basis_mat = basis(X)
    mean = basis_mat @ jnp.atleast_1d(jnp.asarray(beta, dtype=K.dtype))

    if rng is None:
        rng = 0
    if isinstance(rng, (int, np.integer)):
        rng = jax.random.PRNGKey(rng)
    L = jnp.linalg.cholesky(K)
    z = jax.random.normal(rng, (size, K.shape[0]), dtype=K.dtype)
    return mean + z @ L.T


_LAZY_UNSET = object()


def lazy_property(method):
    R"""Compute-once read-only property (API parity: reference helpers.py:371-386).

    The first access runs ``method`` and stashes its result on the
    instance; every later access returns the stash without re-running.
    """
    slot = f'_lazy_{method.__name__}'

    @property
    @wraps(method)
    def getter(self):
        value = getattr(self, slot, _LAZY_UNSET)
        if value is _LAZY_UNSET:
            value = method(self)
            setattr(self, slot, value)
        return value

    return getter


def lazy(method):
    R"""Legacy method memoizer keyed on ``y``/``corr_chol`` arguments
    (API parity: reference helpers.py:389-413; superseded there and here
    by :func:`lazy_property`, kept for completeness).

    The wrapped method's result is cached on the instance.  ``y=`` and
    ``corr_chol=`` keyword arguments fall back to ``self.y`` /
    ``self._corr_chol`` when omitted; explicitly passing values that
    differ from those attributes bypasses and refreshes the cache.
    """
    slot = f'_lazy_call_{method.__name__}'

    @wraps(method)
    def cached(self, *args, **kwargs):
        refresh = False
        fills = {}
        for name, attr in (('y', 'y'), ('corr_chol', '_corr_chol')):
            given = kwargs.pop(name, None)
            default = getattr(self, attr)
            if given is not None and not np.allclose(given, default):
                refresh = True
                fills[name] = given
            else:
                fills[name] = default
        if refresh or not hasattr(self, slot):
            setattr(self, slot, method(self, *args, **fills, **kwargs))
        return getattr(self, slot)

    return cached


def default_attributes(**attr_map):
    R"""Substitute instance attributes for omitted method arguments.

    ``@default_attributes(x='x_', y='_y')`` wraps a method so that any
    mapped parameter left at its "empty" value — ``None`` for ordinary
    and keyword-only parameters, ``()``/``{}`` for ``*args``/``**kwargs``
    — is replaced by ``getattr(self, <mapped attribute>)`` at call time.
    Array-valued arguments are never treated as empty.

    API parity with the reference decorator (helpers.py:416-501); the
    implementation precomputes each mapped parameter's empty marker at
    decoration time instead of re-inspecting kinds per call.
    """
    def wrap(method):
        sig = inspect.signature(method)
        empties = {}
        for name, attr in attr_map.items():
            kind = sig.parameters[name].kind
            if kind is inspect.Parameter.VAR_POSITIONAL:
                empties[name] = (attr, ())
            elif kind is inspect.Parameter.VAR_KEYWORD:
                empties[name] = (attr, {})
            else:
                empties[name] = (attr, None)

        @wraps(method)
        def filled(self, *args, **kwargs):
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            for name, (attr, empty) in empties.items():
                current = bound.arguments.get(name)
                if isinstance(current, (np.ndarray, jnp.ndarray)):
                    continue
                is_empty = current is None if empty is None else current == empty
                if is_empty:
                    bound.arguments[name] = getattr(self, attr)
            return method(*bound.args, **bound.kwargs)

        return filled
    return wrap


def _fourth_root_corr(rho, corr_factor):
    R"""Correlation of 4th-root differences given the underlying rho:
    ``corr_factor * ((1 - rho²) · ₂F₁(¾, ¾; ½; rho²) - 1)``, clamped at ±1.

    The hypergeometric factor is this library's own restricted-domain
    series (:func:`gsum_tpu._accmath.hyp2f1_variogram`, 1.8e-15 vs scipy
    across [0, 1)) — pure elementwise polynomial arithmetic, so it is
    full-f64 on every backend including TPU, where jax.scipy's f64
    ``hyp2f1`` cannot lower (its signbit uses a 64-bit bitcast with no
    TPU lowering).
    """
    from ._accmath import hyp2f1_variogram

    rho_sq = rho ** 2
    # hyp2f1 diverges for |rho| >= 1; clamp the argument and overwrite below
    safe = jnp.clip(rho_sq, 0.0, 1.0 - 1e-12)
    h = hyp2f1_variogram(safe)
    corr = ((1 - rho_sq) * h - 1) * corr_factor
    corr = jnp.where(rho >= 1., 1., corr)
    corr = jnp.where(rho <= -1., -1., corr)
    return corr


@jax.jit
def _bin_var_batched(gam_grid, pi, pj, msk, corr_factor, var_factor):
    R"""Per-bin variance of the binned 4th-root variogram in one call.

    Parameters
    ----------
    gam_grid : (N, N, n_curves) gamma-tilde lookup grid
    pi, pj : (Nb, M) padded point indices of each bin's pairs
    msk : (Nb, M) validity mask
    Returns (Nb, n_curves) masked pair-of-pairs covariance means.
    """
    i, j = pi[:, :, None], pj[:, :, None]           # (Nb, M, 1)
    k, l = pi[:, None, :], pj[:, None, :]           # (Nb, 1, M)
    gam = gam_grid
    rho = (gam[j, k] + gam[i, l] - gam[i, k] - gam[j, l]) \
        / (2 * jnp.sqrt(gam[i, j] * gam[k, l]))     # (Nb, M, M, C)
    corr = _fourth_root_corr(rho, corr_factor)
    same = ((i == k) & (j == l))[..., None]
    corr = jnp.where(same, 1.0, corr)
    var_i = var_factor * jnp.sqrt(gam[i, j])
    var_k = var_factor * jnp.sqrt(gam[k, l])
    cov = corr * jnp.sqrt(var_i * var_k)
    w = (msk[:, :, None] & msk[:, None, :])[..., None]
    cov = jnp.where(w, cov, 0.0)
    counts = jnp.sum(msk, axis=1).astype(cov.dtype)  # (Nb,)
    denom = (counts * counts)[:, None]
    return jnp.where(denom > 0, jnp.sum(cov, axis=(1, 2)) / denom, 0.0)


class VariogramFourthRoot:
    R"""Empirical semivariogram with 4th-root-transform uncertainty bands.

    Bowman & Crujeiras (2013) / Cressie & Hawkins (1980) estimator.
    reference: helpers.py:525-730.  The reference's recarray bookkeeping
    and per-bin host loops are replaced by vectorized ``bincount``
    segment means; the O(sum_b n_b^2) pair-of-pairs covariance is
    evaluated as padded, masked batches on device with the library's own
    f64-safe hypergeometric series (``_accmath.hyp2f1_variogram``).

    Parameters
    ----------
    X : array, shape = (n_samples, n_features)
    z : array, shape = (n_samples, [n_curves])
    bin_bounds : array, shape = (n_bins-1,)
    """

    mean_factor = np.sqrt(2 / np.pi) * _gamma_fn(0.75)
    var_factor = 2. / np.pi * (np.sqrt(np.pi) - _gamma_fn(0.75) ** 2)
    corr_factor = _gamma_fn(0.75) ** 2 / (np.sqrt(np.pi) - _gamma_fn(0.75) ** 2)

    def __init__(self, X, z, bin_bounds):
        X = np.asarray(X)
        z = np.atleast_2d(np.asarray(z))
        bin_bounds = np.asarray(bin_bounds, dtype=float)
        self.N = N = len(X)
        self.Ncurves = z.shape[0]
        self.Nb = n_bins = bin_bounds.size + 1
        self.bin_labels = np.arange(n_bins)

        # One unordered pair per (i > j) lower-triangle entry; everything
        # downstream works on these flat pair arrays.
        hij = np.linalg.norm(X[:, None, :] - X[None, :, :], axis=-1)
        self.pair_i, self.pair_j = tri = np.tril_indices(N, -1)
        self.pair_h = hij[tri]                                # (n_pairs,)
        self.pair_d = np.sqrt(np.abs(z.T[tri[0]] - z.T[tri[1]]))

        # Vectorized binning: counts and segment sums via bincount — no
        # per-bin host loop.  (bin_mask stays available for the pairwise
        # covariance methods, which gather each bin's pair indices.)
        self.bin_idx = np.digitize(self.pair_h, bin_bounds)
        self.bin_mask = self.bin_labels[:, None] == self.bin_idx
        self.bin_counts = counts = np.bincount(self.bin_idx,
                                               minlength=n_bins)
        occupied = counts > 0
        denom = np.maximum(counts, 1).astype(float)

        sums_d = np.zeros((n_bins, self.Ncurves))
        np.add.at(sums_d, self.bin_idx, self.pair_d)
        gamma_star_hat = np.where(occupied[:, None], sums_d / denom[:, None],
                                  np.nan)

        # Bin abscissa: the mean pair distance where a bin is occupied,
        # else the boundary midpoint (overflow bins get a midpoint
        # extrapolated one half-width beyond the outermost boundary).
        mids = np.empty(n_bins)
        mids[1:-1] = 0.5 * (bin_bounds[:-1] + bin_bounds[1:])
        mids[0] = 2.0 * bin_bounds[0] - mids[1]
        mids[-1] = 2.0 * bin_bounds[-1] - mids[-2]
        sums_h = np.bincount(self.bin_idx, weights=self.pair_h,
                             minlength=n_bins)
        self.bin_locations = np.where(occupied, sums_h / denom, mids)

        self.gamma_star_hat = gamma_star_hat
        self.gamma_star_mean = self.mean_factor * gamma_star_hat
        self.gamma_tilde = self.variogram_scale(gamma_star_hat)
        # [i, j]-indexable binned gamma-tilde lookup for the correlation
        # estimates, resident on device for the batched covariance pass
        self.gamma_tilde_grid = jnp.asarray(
            self.gamma_tilde[np.digitize(hij, bin_bounds)])

    def rho_ijkl(self, i, j, k, l):
        R"""Correlation between (Z_i - Z_j) and (Z_k - Z_l) via gamma tilde.

        reference: helpers.py:623-633.
        """
        gam = self.gamma_tilde_grid
        i, j, k, l = (jnp.asarray(a) for a in (i, j, k, l))
        rho = (gam[j, k] + gam[i, l] - gam[i, k] - gam[j, l]) \
            / (2 * jnp.sqrt(gam[i, j] * gam[k, l]))
        return rho

    def corr_ijkl(self, i, j, k, l):
        R"""Correlation of the 4th-root-transformed differences.  reference: helpers.py:635-652."""
        rho = self.rho_ijkl(i, j, k, l)
        return _fourth_root_corr(rho, self.corr_factor)

    def var_ij(self, i, j):
        R"""Variance of sqrt|Z_i - Z_j| estimated by gamma tilde.  reference: helpers.py:667-669."""
        i, j = jnp.asarray(i), jnp.asarray(j)
        return self.var_factor * jnp.sqrt(self.gamma_tilde_grid[i, j])

    def cov_ijkl(self, i, j, k, l):
        R"""Covariance of 4th-root differences; correlation 1 when (i,j)==(k,l).

        Shape-polymorphic: i, j, k, l may be any broadcastable integer
        arrays (a trailing curve axis is appended when n_curves > 1).
        reference: helpers.py:654-665.
        """
        i, j, k, l = jnp.broadcast_arrays(*(jnp.asarray(a)
                                            for a in (i, j, k, l)))
        corr = self.corr_ijkl(i, j, k, l)
        same = (i == k) & (j == l)
        if corr.ndim == same.ndim + 1:   # trailing curve axis
            same = same[..., None]
        corr = jnp.where(same, 1.0, corr)
        return corr * jnp.sqrt(self.var_ij(i, j) * self.var_ij(k, l))

    def _bin_pair_indices(self):
        """Padded (Nb, M) pair-index / mask arrays, M = max pairs per bin."""
        M = max(int(self.bin_counts.max()), 1)
        idx = np.zeros((self.Nb, M), dtype=int)
        msk = np.zeros((self.Nb, M), dtype=bool)
        for b in range(self.Nb):
            ii = np.nonzero(self.bin_mask[b])[0]
            idx[b, :len(ii)] = ii
            msk[b, :len(ii)] = True
        return idx, msk

    def cov(self, bin1, bin2=None):
        R"""Average pair-of-pairs covariance between two bins — one device
        call (the pair-of-pairs grid is evaluated as a single batched
        tensor op).  reference: helpers.py:671-695."""
        idx1 = np.nonzero(self.bin_mask[bin1])[0]
        nb1 = self.bin_counts[bin1]
        if bin2 is None or bin2 == bin1:
            nb2, idx2 = nb1, idx1
        else:
            nb2 = self.bin_counts[bin2]
            idx2 = np.nonzero(self.bin_mask[bin2])[0]
        if (nb1 * nb2) == 0:
            return 0.
        i = self.pair_i[idx1][:, None]
        j = self.pair_j[idx1][:, None]
        k = self.pair_i[idx2][None, :]
        l = self.pair_j[idx2][None, :]
        cov = jnp.sum(self.cov_ijkl(i, j, k, l), axis=(0, 1))
        return np.asarray(cov) / (nb1 * nb2)

    def variogram_scale(self, x):
        return (x / self.mean_factor) ** 4

    def fourth_root_scale(self, x):
        return self.mean_factor * x ** 0.25

    def compute(self, rt_scale=False):
        R"""Mean semivariogram and approximate 68% bands.

        reference: helpers.py:703-730 — but where the reference loops bins
        on the host, the per-bin variances here are one jitted device call
        over a padded (Nb, M, M) pair-of-pairs grid (falling back to
        per-bin device calls if that grid would exceed ~3e7 elements).
        """
        gam = self.gamma_star_mean if rt_scale else self.gamma_tilde
        idx, msk = self._bin_pair_indices()
        M = idx.shape[1]
        if self.Nb * M * M * self.Ncurves <= 3e7:
            var = _bin_var_batched(
                self.gamma_tilde_grid, jnp.asarray(self.pair_i[idx]),
                jnp.asarray(self.pair_j[idx]), jnp.asarray(msk),
                self.corr_factor, self.var_factor)
            sd = np.sqrt(np.asarray(var))
        else:
            sd = np.zeros((self.Nb, self.Ncurves))
            for b in range(self.Nb):
                sd[b] = np.sqrt(self.cov(b))
        lower = self.gamma_star_mean - sd
        upper = self.gamma_star_mean + sd
        if not rt_scale:
            lower = self.variogram_scale(lower)
            upper = self.variogram_scale(upper)
        return gam, lower, upper
