R"""Inverse incomplete beta/gamma functions for distribution quantiles.

jax.scipy.special provides ``betainc``/``gammainc`` but not their inverses,
which the quantile (ppf) functions of the Student-t, chi-squared, F, and
beta distributions need (SURVEY.md §2b: the reference outsources these to
scipy.stats).  Implemented here as the standard Halley-iteration algorithms
(normal-approximation initial guess + ~10 guarded Halley steps on the
regularized incomplete functions), fully jit/vmap-compatible with
fixed-trip-count loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import betainc, gammainc, gammaln

from .. import _config  # noqa: F401  (enables x64)

__all__ = ['betaincinv', 'gammaincinv']


def _ndtri_approx(p):
    """Rational approximation to the normal quantile used as an initial
    guess (Abramowitz & Stegun 26.2.23); refined by Halley iterations later
    so only ~3 digits are needed here."""
    pp = jnp.where(p < 0.5, p, 1.0 - p)
    pp = jnp.clip(pp, 1e-300, 0.5)
    t = jnp.sqrt(-2.0 * jnp.log(pp))
    x = (2.30753 + t * 0.27061) / (1.0 + t * (0.99229 + t * 0.04481)) - t
    return jnp.where(p < 0.5, -x, x)


def betaincinv(a, b, p):
    R"""Inverse of the regularized incomplete beta function I_x(a, b).

    Solves ``betainc(a, b, x) = p`` for x in [0, 1].
    """
    a, b, p = jnp.broadcast_arrays(*map(jnp.asarray, (a, b, p)))
    dtype = jnp.result_type(a.dtype, b.dtype, p.dtype, float)
    a, b, p = a.astype(dtype), b.astype(dtype), p.astype(dtype)

    a1 = a - 1.0
    b1 = b - 1.0

    # --- Initial guess ---
    # Branch 1 (a, b >= 1): normal approximation (A&S 26.5.22), whose
    # deviate y_p has *upper*-tail probability p: y_p = -ndtri(p).
    y_p = -_ndtri_approx(p)
    al = (y_p ** 2 - 3.0) / 6.0
    h = 2.0 / (1.0 / (2.0 * a - 1.0) + 1.0 / (2.0 * b - 1.0))
    w = (y_p * jnp.sqrt(al + h) / h
         - (1.0 / (2.0 * b - 1.0) - 1.0 / (2.0 * a - 1.0))
         * (al + 5.0 / 6.0 - 2.0 / (3.0 * h)))
    x_big = a / (a + b * jnp.exp(2.0 * w))

    # Branch 2 (small a or b): tail expansion
    lna = jnp.log(a / (a + b))
    lnb = jnp.log(b / (a + b))
    t_ = jnp.exp(a * lna) / a
    u_ = jnp.exp(b * lnb) / b
    w_ = t_ + u_
    x_small = jnp.where(
        p < t_ / w_,
        (a * w_ * p) ** (1.0 / a),
        1.0 - (b * w_ * (1.0 - p)) ** (1.0 / b),
    )

    x0 = jnp.where((a >= 1.0) & (b >= 1.0), x_big, x_small)
    x0 = jnp.clip(x0, jnp.finfo(dtype).tiny, 1.0 - 1e-15)

    afac = -gammaln(a) - gammaln(b) + gammaln(a + b)

    # Bracketed Newton: betainc is monotone increasing in x, so err < 0
    # tightens the lower bracket and err > 0 the upper.  A Newton step that
    # leaves the bracket (bad tail guesses, flat regions) falls back to
    # bisection — guaranteed convergence in ~50 steps at float64.
    def body(_, carry):
        x, lo, hi = carry
        err = betainc(a, b, x) - p
        lo = jnp.where(err < 0.0, jnp.maximum(lo, x), lo)
        hi = jnp.where(err > 0.0, jnp.minimum(hi, x), hi)
        logt = a1 * jnp.log(x) + b1 * jnp.log1p(-x) + afac
        t = jnp.exp(logt)
        newton = x - jnp.where(t > 0, err / t, 0.0)
        good = jnp.isfinite(newton) & (newton > lo) & (newton < hi)
        x_new = jnp.where(good, newton, 0.5 * (lo + hi))
        return x_new, lo, hi

    lo0 = jnp.zeros_like(x0)
    hi0 = jnp.ones_like(x0)
    x, _, _ = jax.lax.fori_loop(0, 50, body, (x0, lo0, hi0))
    x = jnp.where(p == 0.0, 0.0, x)
    x = jnp.where(p == 1.0, 1.0, x)
    # scipy convention: out-of-domain p gives NaN
    x = jnp.where((p < 0.0) | (p > 1.0), jnp.nan, x)
    return x


def gammaincinv(a, p):
    R"""Inverse of the regularized lower incomplete gamma function P(a, x).

    Solves ``gammainc(a, x) = p`` for x >= 0.
    """
    a, p = jnp.broadcast_arrays(jnp.asarray(a), jnp.asarray(p))
    dtype = jnp.result_type(a.dtype, p.dtype, float)
    a, p = a.astype(dtype), p.astype(dtype)

    a1 = a - 1.0
    gln = gammaln(a)

    # --- Initial guess ---
    # a > 1: Wilson–Hilferty with upper-tail deviate y_p = -ndtri(p)
    y_p = -_ndtri_approx(p)
    x_big = jnp.maximum(
        1e-3,
        a * (1.0 - 1.0 / (9.0 * a) - y_p / (3.0 * jnp.sqrt(a))) ** 3)
    # a <= 1: series-based guess
    t_ = 1.0 - a * (0.253 + a * 0.12)
    x_small = jnp.where(
        p < t_,
        (p / jnp.maximum(t_, 1e-30)) ** (1.0 / a),
        1.0 - jnp.log1p(-(p - t_) / jnp.maximum(1.0 - t_, 1e-30)),
    )
    x0 = jnp.where(a > 1.0, x_big, x_small)
    x0 = jnp.maximum(x0, jnp.finfo(dtype).tiny)

    # Bracketed Newton on the monotone gammainc(a, .).  The upper bracket
    # is discovered on the fly: while no x with err > 0 has been seen, an
    # out-of-bracket Newton step grows x geometrically instead of bisecting.
    def body(_, carry):
        x, lo, hi = carry
        err = gammainc(a, x) - p
        lo = jnp.where(err < 0.0, jnp.maximum(lo, x), lo)
        hi = jnp.where(err > 0.0, jnp.minimum(hi, x), hi)
        t = jnp.exp(-x + a1 * jnp.log(x) - gln)  # pdf of Gamma(a, 1)
        newton = x - jnp.where(t > 0, err / t, 0.0)
        has_hi = jnp.isfinite(hi)
        good = jnp.isfinite(newton) & (newton > lo) & (newton < hi)
        fallback = jnp.where(has_hi, 0.5 * (lo + hi), 2.0 * x + 1.0)
        x_new = jnp.where(good, newton, fallback)
        return x_new, lo, hi

    lo0 = jnp.zeros_like(x0)
    hi0 = jnp.full_like(x0, jnp.inf)
    x, _, _ = jax.lax.fori_loop(0, 60, body, (x0, lo0, hi0))
    x = jnp.where(p == 0.0, 0.0, x)
    x = jnp.where(p == 1.0, jnp.inf, x)
    # scipy convention: out-of-domain p gives NaN
    x = jnp.where((p < 0.0) | (p > 1.0), jnp.nan, x)
    return x
