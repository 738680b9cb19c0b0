R"""Scipy-like frozen distributions built on jax.numpy — jit/vmap-compatible.

The reference leans on ``scipy.stats`` frozen distributions and
statsmodels' MVT (reference: models.py:1686-1687,1827-1833,
diagnostics.py:44-55,258-262).  This module provides the TPU-native
equivalents with the same calling conventions:

    >>> from gsum_tpu import stats
    >>> d = stats.t(df=5, loc=0., scale=2.)
    >>> d.interval(0.68)

Families: ``norm``, ``t``, ``chi2``, ``f``, ``beta``, ``binom``,
``multivariate_normal``, ``multivariate_t``.  Quantiles use the native
``betaincinv``/``gammaincinv`` from ``gsum_tpu.stats._special``; all methods
accept broadcastable array parameters, which is what lets e.g. the
pointwise truncation model hold an (n_points, n_orders) family of t
distributions as a single object.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import betainc, betaln, gammainc, gammaln, ndtr, ndtri
from scipy.special import betaln as _betaln_host, gammaln as _gammaln_host

from .. import _config  # noqa: F401
from ._special import betaincinv, gammaincinv

# Host-side f64 constants (jnp scalar transcendentals fold at f32 precision)
_LOG_2PI = float(np.log(2 * np.pi))
_SQRT_2PI = float(np.sqrt(2 * np.pi))

__all__ = [
    'norm', 't', 'chi2', 'f', 'beta', 'binom',
    'multivariate_normal', 'multivariate_t', 'MVT',
    'betaincinv', 'gammaincinv',
]


def _as_key(random_state):
    if random_state is None:
        return jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
    if isinstance(random_state, (int, np.integer)):
        return jax.random.PRNGKey(int(random_state))
    return random_state


def _host_scalar(v):
    """The Python float of a concrete scalar, else None (traced or
    array-valued).  Parameter-only normalizers are evaluated on the HOST
    at f64 when possible: a 0-d device transcendental constant-folds at
    f32 precision on this TPU, capping an otherwise-f64 log-density at
    ~1e-7 accuracy.  Frozen distributions built outside jit hold
    concrete 0-d arrays, so their normalizers stay exact; tracer or
    array-valued parameters fall back to device ops."""
    if isinstance(v, (int, float, np.floating, np.integer)):
        return float(v)
    if isinstance(v, jax.core.Tracer):
        return None
    if np.ndim(v) == 0:
        return float(np.asarray(v))
    return None


def _log_c(v):
    """``log(v)`` — on the host when v is a concrete scalar (see
    :func:`_host_scalar`), as a device op otherwise."""
    vh = _host_scalar(v)
    return float(np.log(vh)) if vh is not None else jnp.log(v)


class _Frozen:
    """Base frozen distribution: interval/median/rvs in terms of ppf/cdf."""

    random_state = 0

    def interval(self, confidence):
        confidence = jnp.asarray(confidence)
        q = (1.0 - confidence) / 2.0
        return self.ppf(q), self.ppf(1.0 - q)

    def median(self):
        return self.ppf(0.5)

    def support(self):
        return self.ppf(0.0), self.ppf(1.0)

    def logpdf(self, x):
        return jnp.log(self.pdf(x))

    def sf(self, x):
        return 1.0 - self.cdf(x)

    def var(self):
        return self.std() ** 2


# ----------------------------------------------------------------------
# Normal
# ----------------------------------------------------------------------
class _FrozenNorm(_Frozen):
    def __init__(self, loc=0.0, scale=1.0):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    def _z(self, x):
        return (jnp.asarray(x) - self.loc) / self.scale

    def pdf(self, x):
        z = self._z(x)
        return jnp.exp(-0.5 * z * z) / (_SQRT_2PI * self.scale)

    def logpdf(self, x):
        z = self._z(x)
        return -0.5 * z * z - jnp.log(_SQRT_2PI * self.scale)

    def cdf(self, x):
        return ndtr(self._z(x))

    def ppf(self, q):
        return self.loc + self.scale * ndtri(jnp.asarray(q))

    def mean(self):
        return jnp.broadcast_to(self.loc, jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.scale)))

    def std(self):
        return jnp.broadcast_to(self.scale, jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.scale)))

    def rvs(self, size=1, random_state=None):
        key = _as_key(self.random_state if random_state is None else random_state)
        shape = (size,) if np.isscalar(size) else tuple(size)
        base = jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))
        z = jax.random.normal(key, shape + base, dtype=jnp.result_type(float))
        return jnp.squeeze(self.loc + self.scale * z) if size == 1 else self.loc + self.scale * z


class _NormFamily:
    def __call__(self, loc=0.0, scale=1.0):
        return _FrozenNorm(loc, scale)

    def pdf(self, x, loc=0.0, scale=1.0):
        return _FrozenNorm(loc, scale).pdf(x)

    def logpdf(self, x, loc=0.0, scale=1.0):
        return _FrozenNorm(loc, scale).logpdf(x)

    def cdf(self, x, loc=0.0, scale=1.0):
        return _FrozenNorm(loc, scale).cdf(x)

    def ppf(self, q, loc=0.0, scale=1.0):
        return _FrozenNorm(loc, scale).ppf(q)


norm = _NormFamily()


# ----------------------------------------------------------------------
# Student-t
# ----------------------------------------------------------------------
class _FrozenT(_Frozen):
    def __init__(self, df, loc=0.0, scale=1.0):
        self.df = jnp.asarray(df)
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    def _z(self, x):
        return (jnp.asarray(x) - self.loc) / self.scale

    def logpdf(self, x):
        z = self._z(x)
        df = self.df
        dfh = _host_scalar(df)
        if dfh is not None:
            const = float(_gammaln_host((dfh + 1) / 2.)
                          - _gammaln_host(dfh / 2.)
                          - 0.5 * np.log(dfh * np.pi))
        else:
            const = gammaln((df + 1) / 2) - gammaln(df / 2) \
                - 0.5 * jnp.log(df * jnp.pi)
        lognorm = const - _log_c(self.scale)
        return lognorm - (df + 1) / 2 * jnp.log1p(z * z / df)

    def pdf(self, x):
        return jnp.exp(self.logpdf(x))

    def cdf(self, x):
        z = self._z(x)
        df = self.df
        w = df / (df + z * z)
        tail = 0.5 * betainc(df / 2.0, 0.5, w)
        return jnp.where(z > 0, 1.0 - tail, tail)

    def ppf(self, q):
        q = jnp.asarray(q)
        df = self.df
        qq = jnp.where(q < 0.5, q, 1.0 - q)
        w = betaincinv(df / 2.0, 0.5, 2.0 * qq)
        mag = jnp.sqrt(df * (1.0 - w) / jnp.maximum(w, jnp.finfo(w.dtype).tiny))
        z = jnp.where(q < 0.5, -mag, mag)
        z = jnp.where(q == 0.5, 0.0, z)
        return self.loc + self.scale * z

    def mean(self):
        shp = jnp.broadcast_shapes(jnp.shape(self.df), jnp.shape(self.loc),
                                   jnp.shape(self.scale))
        return jnp.broadcast_to(self.loc, shp)

    def std(self):
        df = self.df
        s = jnp.sqrt(df / (df - 2.0))
        s = jnp.where(df > 2, s, jnp.inf)
        shp = jnp.broadcast_shapes(jnp.shape(self.df), jnp.shape(self.loc),
                                   jnp.shape(self.scale))
        return jnp.broadcast_to(self.scale * s, shp)

    def rvs(self, size=1, random_state=None):
        key = _as_key(self.random_state if random_state is None else random_state)
        shape = (size,) if np.isscalar(size) else tuple(size)
        base = jnp.broadcast_shapes(jnp.shape(self.df), jnp.shape(self.loc),
                                    jnp.shape(self.scale))
        z = jax.random.t(key, self.df, shape + base, dtype=jnp.result_type(float))
        out = self.loc + self.scale * z
        return jnp.squeeze(out) if size == 1 else out


class _TFamily:
    def __call__(self, df, loc=0.0, scale=1.0):
        return _FrozenT(df, loc, scale)

    def pdf(self, x, df, loc=0.0, scale=1.0):
        return _FrozenT(df, loc, scale).pdf(x)

    def logpdf(self, x, df, loc=0.0, scale=1.0):
        return _FrozenT(df, loc, scale).logpdf(x)

    def cdf(self, x, df, loc=0.0, scale=1.0):
        return _FrozenT(df, loc, scale).cdf(x)

    def ppf(self, q, df, loc=0.0, scale=1.0):
        return _FrozenT(df, loc, scale).ppf(q)


t = _TFamily()


# ----------------------------------------------------------------------
# Chi-squared
# ----------------------------------------------------------------------
class _FrozenChi2(_Frozen):
    def __init__(self, df, loc=0.0, scale=1.0):
        self.df = jnp.asarray(df)
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    def _z(self, x):
        return (jnp.asarray(x) - self.loc) / self.scale

    def logpdf(self, x):
        z = self._z(x)
        k2 = self.df / 2.0
        k2h = _host_scalar(k2)
        if k2h is not None:
            const = float(_gammaln_host(k2h) + k2h * np.log(2.0))
        else:
            const = gammaln(k2) + k2 * jnp.log(2.0)
        lp = (k2 - 1) * jnp.log(z) - z / 2 - const
        lp = jnp.where(z > 0, lp, -jnp.inf)
        return lp - _log_c(self.scale)

    def pdf(self, x):
        return jnp.exp(self.logpdf(x))

    def cdf(self, x):
        z = self._z(x)
        return jnp.where(z > 0, gammainc(self.df / 2.0, z / 2.0), 0.0)

    def ppf(self, q):
        return self.loc + self.scale * 2.0 * gammaincinv(self.df / 2.0, jnp.asarray(q))

    def mean(self):
        return self.loc + self.scale * self.df

    def std(self):
        return self.scale * jnp.sqrt(2.0 * self.df)

    def rvs(self, size=1, random_state=None):
        key = _as_key(self.random_state if random_state is None else random_state)
        shape = (size,) if np.isscalar(size) else tuple(size)
        base = jnp.broadcast_shapes(jnp.shape(self.df), jnp.shape(self.loc),
                                    jnp.shape(self.scale))
        z = 2.0 * jax.random.gamma(key, self.df / 2.0, shape + base,
                                   dtype=jnp.result_type(float))
        out = self.loc + self.scale * z
        return jnp.squeeze(out) if size == 1 else out


class _Chi2Family:
    def __call__(self, df, loc=0.0, scale=1.0):
        return _FrozenChi2(df, loc, scale)

    def pdf(self, x, df, loc=0.0, scale=1.0):
        return _FrozenChi2(df, loc, scale).pdf(x)

    def cdf(self, x, df, loc=0.0, scale=1.0):
        return _FrozenChi2(df, loc, scale).cdf(x)

    def ppf(self, q, df, loc=0.0, scale=1.0):
        return _FrozenChi2(df, loc, scale).ppf(q)


chi2 = _Chi2Family()


# ----------------------------------------------------------------------
# F distribution
# ----------------------------------------------------------------------
class _FrozenF(_Frozen):
    def __init__(self, dfn, dfd, loc=0.0, scale=1.0):
        self.dfn = jnp.asarray(dfn)
        self.dfd = jnp.asarray(dfd)
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    def _z(self, x):
        return (jnp.asarray(x) - self.loc) / self.scale

    def logpdf(self, x):
        z = self._z(x)
        d1, d2 = self.dfn, self.dfd
        d1h, d2h = _host_scalar(d1), _host_scalar(d2)
        if d1h is not None and d2h is not None:
            const = float((d1h / 2) * np.log(d1h) + (d2h / 2) * np.log(d2h)
                          - _betaln_host(d1h / 2, d2h / 2))
        else:
            const = (d1 / 2) * jnp.log(d1) + (d2 / 2) * jnp.log(d2) \
                - betaln(d1 / 2, d2 / 2)
        lp = const + (d1 / 2 - 1) * jnp.log(z) \
            - ((d1 + d2) / 2) * jnp.log(d2 + d1 * z)
        lp = jnp.where(z > 0, lp, -jnp.inf)
        return lp - _log_c(self.scale)

    def pdf(self, x):
        return jnp.exp(self.logpdf(x))

    def cdf(self, x):
        z = self._z(x)
        d1, d2 = self.dfn, self.dfd
        w = d1 * z / (d1 * z + d2)
        return jnp.where(z > 0, betainc(d1 / 2, d2 / 2, w), 0.0)

    def ppf(self, q):
        d1, d2 = self.dfn, self.dfd
        w = betaincinv(d1 / 2, d2 / 2, jnp.asarray(q))
        z = d2 * w / (d1 * jnp.maximum(1.0 - w, jnp.finfo(w.dtype).tiny))
        return self.loc + self.scale * z

    def mean(self):
        d2 = self.dfd
        m = jnp.where(d2 > 2, d2 / (d2 - 2.0), jnp.inf)
        return self.loc + self.scale * m

    def std(self):
        d1, d2 = self.dfn, self.dfd
        num = 2.0 * d2 ** 2 * (d1 + d2 - 2.0)
        den = d1 * (d2 - 2.0) ** 2 * (d2 - 4.0)
        v = jnp.where(d2 > 4, num / den, jnp.inf)
        return self.scale * jnp.sqrt(v)

    def rvs(self, size=1, random_state=None):
        key = _as_key(self.random_state if random_state is None else random_state)
        k1, k2 = jax.random.split(key)
        shape = (size,) if np.isscalar(size) else tuple(size)
        dt = jnp.result_type(float)
        base = jnp.broadcast_shapes(jnp.shape(self.dfn), jnp.shape(self.dfd),
                                    jnp.shape(self.loc),
                                    jnp.shape(self.scale))
        u1 = 2.0 * jax.random.gamma(k1, self.dfn / 2.0, shape + base, dtype=dt)
        u2 = 2.0 * jax.random.gamma(k2, self.dfd / 2.0, shape + base, dtype=dt)
        z = (u1 / self.dfn) / (u2 / self.dfd)
        out = self.loc + self.scale * z
        return jnp.squeeze(out) if size == 1 else out


class _FFamily:
    def __call__(self, dfn, dfd, loc=0.0, scale=1.0):
        return _FrozenF(dfn, dfd, loc, scale)


f = _FFamily()


# ----------------------------------------------------------------------
# Beta
# ----------------------------------------------------------------------
class _FrozenBeta(_Frozen):
    def __init__(self, a, b):
        self.a = jnp.asarray(a)
        self.b = jnp.asarray(b)

    def logpdf(self, x):
        x = jnp.asarray(x)
        ah, bh = _host_scalar(self.a), _host_scalar(self.b)
        if ah is not None and bh is not None:
            bln = float(_betaln_host(ah, bh))
        else:
            bln = betaln(self.a, self.b)
        lp = (self.a - 1) * jnp.log(x) + (self.b - 1) * jnp.log1p(-x) - bln
        return jnp.where((x >= 0) & (x <= 1), lp, -jnp.inf)

    def pdf(self, x):
        return jnp.exp(self.logpdf(x))

    def cdf(self, x):
        x = jnp.asarray(x)
        return betainc(self.a, self.b, jnp.clip(x, 0.0, 1.0))

    def ppf(self, q):
        return betaincinv(self.a, self.b, jnp.asarray(q))

    def mean(self):
        return self.a / (self.a + self.b)

    def std(self):
        ab = self.a + self.b
        return jnp.sqrt(self.a * self.b / (ab * ab * (ab + 1.0)))

    def rvs(self, size=1, random_state=None):
        key = _as_key(self.random_state if random_state is None else random_state)
        shape = (size,) if np.isscalar(size) else tuple(size)
        base = jnp.broadcast_shapes(jnp.shape(self.a), jnp.shape(self.b))
        out = jax.random.beta(key, self.a, self.b, shape + base,
                              dtype=jnp.result_type(float))
        return jnp.squeeze(out) if size == 1 else out


class _BetaFamily:
    def __call__(self, a, b):
        return _FrozenBeta(a, b)

    def pdf(self, x, a, b):
        return _FrozenBeta(a, b).pdf(x)

    def cdf(self, x, a, b):
        return _FrozenBeta(a, b).cdf(x)

    def ppf(self, q, a, b):
        return _FrozenBeta(a, b).ppf(q)


beta = _BetaFamily()


# ----------------------------------------------------------------------
# Binomial
# ----------------------------------------------------------------------
class _FrozenBinom(_Frozen):
    """Binomial(n, p).  ``n`` must be a concrete (static) integer so the
    quantile search has a fixed shape."""

    def __init__(self, n, p):
        self.n = int(n)
        self.p = jnp.asarray(p)

    def logpmf(self, k):
        k = jnp.asarray(k)
        n = self.n
        ph = _host_scalar(self.p)
        logp = float(np.log(ph)) if ph is not None else jnp.log(self.p)
        log1mp = (float(np.log1p(-ph)) if ph is not None
                  else jnp.log1p(-self.p))
        return (float(_gammaln_host(n + 1.0)) - gammaln(k + 1.0)
                - gammaln(n - k + 1.0) + k * logp + (n - k) * log1mp)

    def pmf(self, k):
        return jnp.exp(self.logpmf(k))

    def cdf(self, k):
        k = jnp.floor(jnp.asarray(k))
        # I_{1-p}(n-k, k+1), the standard regularized-beta identity
        kk = jnp.clip(k, 0, self.n)
        val = betainc(self.n - kk, kk + 1.0, 1.0 - self.p)
        val = jnp.where(kk >= self.n, 1.0, val)
        val = jnp.where(k < 0, 0.0, val)
        return val

    def ppf(self, q):
        """Smallest k with cdf(k) >= q (scipy convention; ppf(0) = -1)."""
        q = jnp.asarray(q)
        p = jnp.asarray(self.p)
        ks = jnp.arange(self.n + 1, dtype=jnp.result_type(float))
        ks_col = ks.reshape((-1,) + (1,) * p.ndim)
        cdf = betainc(self.n - ks_col, ks_col + 1.0, 1.0 - p)
        cdf = cdf.at[-1].set(jnp.ones_like(cdf[-1]))
        out_shape = jnp.broadcast_shapes(q.shape, p.shape)
        qb = jnp.broadcast_to(q, out_shape)
        cdf = cdf.reshape((self.n + 1,) + (1,) * (len(out_shape) - p.ndim) + p.shape)
        # account for float roundoff at the jump points the way scipy does
        meets = cdf >= qb - 1e-12
        idx = jnp.argmax(meets, axis=0).astype(jnp.result_type(float))
        return jnp.where(qb <= 0, -1.0, idx)

    def interval(self, confidence):
        confidence = jnp.asarray(confidence)
        qlo = (1.0 - confidence) / 2.0
        qhi = 1.0 - qlo
        return self.ppf(qlo), self.ppf(qhi)

    def mean(self):
        return self.n * self.p

    def std(self):
        return jnp.sqrt(self.n * self.p * (1.0 - self.p))

    def rvs(self, size=1, random_state=None):
        key = _as_key(self.random_state if random_state is None else random_state)
        shape = (size,) if np.isscalar(size) else tuple(size)
        base = jnp.broadcast_shapes(jnp.shape(self.n), jnp.shape(self.p))
        out = jax.random.binomial(key, self.n, self.p, shape + base)
        return jnp.squeeze(out) if size == 1 else out


class _BinomFamily:
    def __call__(self, n, p):
        return _FrozenBinom(n, p)


binom = _BinomFamily()


# ----------------------------------------------------------------------
# Multivariate normal
# ----------------------------------------------------------------------
class _FrozenMVN:
    def __init__(self, mean, cov, allow_singular=False, jitter=0.0):
        self.mean = jnp.atleast_1d(jnp.asarray(mean))
        self.cov = jnp.atleast_2d(jnp.asarray(cov))
        self.dim = self.mean.shape[0]
        self._jitter = jitter
        self._chol = jnp.linalg.cholesky(
            self.cov + jitter * jnp.eye(self.dim, dtype=self.cov.dtype))
        self.random_state = 0

    def logpdf(self, x):
        from jax.scipy.linalg import solve_triangular

        x = jnp.asarray(x)
        diff = x - self.mean
        w = solve_triangular(self._chol, diff.T, lower=True).T
        maha = jnp.sum(w * w, axis=-1)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(self._chol)))
        return -0.5 * (self.dim * _LOG_2PI + logdet + maha)

    def pdf(self, x):
        return jnp.exp(self.logpdf(x))

    def rvs(self, size=1, random_state=None):
        key = _as_key(self.random_state if random_state is None else random_state)
        shape = (size,) if np.isscalar(size) else tuple(size)
        z = jax.random.normal(key, shape + (self.dim,), dtype=self._chol.dtype)
        out = self.mean + z @ self._chol.T
        return jnp.squeeze(out) if size == 1 else out


class _MVNFamily:
    def __call__(self, mean, cov, allow_singular=False):
        jitter = 1e-12 if allow_singular else 0.0
        return _FrozenMVN(mean, cov, allow_singular, jitter=jitter)

    def logpdf(self, x, mean, cov):
        return _FrozenMVN(mean, cov).logpdf(x)

    def rvs(self, mean, cov, size=1, random_state=None):
        return _FrozenMVN(mean, cov).rvs(size, random_state)


multivariate_normal = _MVNFamily()


# ----------------------------------------------------------------------
# Multivariate t
# ----------------------------------------------------------------------
class _FrozenMVT:
    R"""Multivariate Student-t with scale matrix ``sigma`` and ``df``.

    The covariance is ``sigma * df / (df - 2)`` — the same convention as the
    statsmodels MVT the reference uses (diagnostics.py:52-53).
    """

    def __init__(self, mean, sigma, df):
        self.mean = jnp.atleast_1d(jnp.asarray(mean))
        self.sigma = jnp.atleast_2d(jnp.asarray(sigma))
        self.df = df
        self.dim = self.mean.shape[0]
        self._chol = jnp.linalg.cholesky(self.sigma)
        self.random_state = 0

    def logpdf(self, x):
        from jax.scipy.linalg import solve_triangular

        x = jnp.asarray(x)
        d, df = self.dim, self.df
        diff = x - self.mean
        w = solve_triangular(self._chol, diff.T, lower=True).T
        maha = jnp.sum(w * w, axis=-1)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(self._chol)))
        dfh = _host_scalar(df)
        if dfh is not None:
            const = float(_gammaln_host((dfh + d) / 2.0)
                          - _gammaln_host(dfh / 2.0)
                          - 0.5 * d * np.log(dfh * np.pi))
        else:
            const = (gammaln((df + d) / 2.0) - gammaln(df / 2.0)
                     - 0.5 * d * jnp.log(df * jnp.pi))
        return (const - 0.5 * logdet
                - (df + d) / 2.0 * jnp.log1p(maha / df))

    def pdf(self, x):
        return jnp.exp(self.logpdf(x))

    def cov(self):
        return self.sigma * self.df / (self.df - 2.0)

    def rvs(self, size=1, random_state=None):
        key = _as_key(self.random_state if random_state is None else random_state)
        kz, kg = jax.random.split(key)
        shape = (size,) if np.isscalar(size) else tuple(size)
        dt = self._chol.dtype
        z = jax.random.normal(kz, shape + (self.dim,), dtype=dt)
        g = 2.0 * jax.random.gamma(kg, self.df / 2.0, shape, dtype=dt)  # chi2(df)
        scale = jnp.sqrt(self.df / g)[..., None]
        out = self.mean + scale * (z @ self._chol.T)
        return jnp.squeeze(out) if size == 1 else out


class _MVTFamily:
    def __call__(self, mean, sigma, df):
        return _FrozenMVT(mean, sigma, df)


multivariate_t = _MVTFamily()
MVT = _FrozenMVT
