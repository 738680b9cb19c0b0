"""Accurate scalar-shape f64 transcendentals for the TPU backend.

On this TPU, float64 ``jnp.exp`` of a 0-d or tiny-shape traced operand
lowers through an f32-accurate path (measured: 3.7e-8 relative, vs
3.2e-14 for the same op on a 4096-vector).  Every kernel resolves its
log-hyperparameters with exactly such a scalar ``exp`` (kernels.py
``_resolve``), which put a 2.7e-8 relative floor under every f64 Gram
matrix and broke the library's 1e-8 on-TPU parity contract.

``exp64`` rebuilds exp from operations that ARE accurate in the TPU's
emulated f64 at any shape — add, multiply, round, compare:

    exp(x) = 2^k * P(r),  k = round(x*log2(e)),  r = x - k*ln2

with ln2 split Cody-Waite style into a high part exactly representable
in ~30 bits and a low correction (so ``x - k*LN2_HI`` is exact for
|k| < 2^22), a degree-13 Taylor polynomial on |r| <= ln2/2 (truncation
~2.4e-16 relative), and 2^k formed by fixed-trip binary squaring —
every factor is a power of two, and multiplying by a power of two is
exact in any binary float format, so no transcendental lowering is ever
touched.  Measured on the chip: 3e-16 relative on the hyperparameter
domain (tests guard the CPU path; benchmarks/parity_diag_tpu.py guards
the TPU path each round).

Gradients: d/dx 2^round(x*log2e) is zero almost everywhere and the
polynomial differentiates termwise, so jax.grad(exp64) == P'(r) * 2^k
~= exp(x) to the same accuracy; the integer bit-walk carries no tangent
by construction.
"""
import math

import numpy as np

import jax.numpy as jnp

__all__ = ['exp64', 'hyp2f1_variogram']

# fdlibm's Cody–Waite split of ln 2.
_LN2_HI = 6.93147180369123816490e-01
_LN2_LO = 1.90821492927058770002e-10
_LOG2E = 1.4426950408889634074

# 1/i! for the degree-13 Taylor polynomial of exp on |r| <= ln2/2.
_INV_FACT = [1.0 / math.factorial(i) for i in range(14)]

# |k| <= 2^10 - 1 covers the full non-overflow f64 domain (|x| <= 709).
_POW2_BITS = 10


def _pow2_int(k):
    """2**k for integer-valued float ``k`` (|k| < 2**_POW2_BITS), using
    only exact operations (integer bit-walk + power-of-two multiplies)."""
    neg = k < 0
    a = jnp.abs(k).astype(jnp.int32)
    result = jnp.ones_like(k)
    base = jnp.full_like(k, 2.0)
    for _ in range(_POW2_BITS):
        result = jnp.where((a & 1) == 1, result * base, result)
        base = base * base
        a = a >> 1
    return jnp.where(neg, 1.0 / result, result)


def exp64(x):
    """Accurate ``exp`` for float64 on TPU; plain ``jnp.exp`` otherwise.

    Shape-polymorphic and differentiable; use for f64 transcendentals of
    scalar/tiny-shape traced values (e.g. kernel hyperparameter
    resolution), where the backend's native lowering is f32-accurate.
    """
    x = jnp.asarray(x)
    if x.dtype != jnp.float64:
        return jnp.exp(x)
    k = jnp.round(x * _LOG2E)
    r = (x - k * _LN2_HI) - k * _LN2_LO
    p = jnp.full_like(r, _INV_FACT[13])
    for c in _INV_FACT[12::-1]:
        p = p * r + c
    return _pow2_int(k) * p


def _hyp2f1_variogram_tables(n_terms=64):
    """Host-precomputed f64 coefficient tables for ``hyp2f1_variogram``.

    Direct branch (x <= 1/2): the Gauss series of F(3/4, 3/4; 1/2; x),
    g_{n+1} = g_n (3/4+n)^2 / ((1/2+n)(1+n)); terms decay like x^n, so
    64 terms leave < 6e-20 relative at the x = 1/2 crossover.

    Near-1 branch (x > 1/2, w = 1-x): Euler's transformation gives
    F(3/4, 3/4; 1/2; x) = G(x)/w with G = F(-1/4, -1/4; 1/2; x), and
    G' = F(3/4, 3/4; 3/2; x)/8 is the classic c = a+b logarithmic case
    (DLMF 15.8.10).  Integrating that series termwise from 1-w to 1,

        F = A/w + ln(w) P(w) - Q(w),
        A = sqrt(pi)/Gamma(3/4)^2 = G(1),
        P_n = C e_n/(n+1),  Q_n = P_n (d_n + 1/(n+1)),
        C = sqrt(pi)/(16 Gamma(3/4)^2),  e_n = ((3/4)_n / n!)^2,
        d_n = 2 psi(n+1) - 2 psi(n+3/4),

    with the digamma values built by exact recurrence from psi(1) = -gamma
    and psi(3/4) = -gamma - 3 ln 2 + pi/2.  Verified against scipy's
    hyp2f1 to 1.8e-15 max relative on x in [0, 1-1e-12].
    """
    n = np.arange(n_terms, dtype=np.float64)
    g = np.ones(n_terms)
    g[1:] = np.cumprod((0.75 + n[:-1]) ** 2 / ((0.5 + n[:-1]) * (1.0 + n[:-1])))
    gamma34_sq = math.gamma(0.75) ** 2
    A = math.sqrt(math.pi) / gamma34_sq
    C = math.sqrt(math.pi) / (16.0 * gamma34_sq)
    euler = 0.5772156649015328606
    psi1 = -euler + np.concatenate([[0.0], np.cumsum(1.0 / (n[:-1] + 1.0))])
    psi34 = (-euler - 3.0 * math.log(2.0) + math.pi / 2.0) \
        + np.concatenate([[0.0], np.cumsum(1.0 / (n[:-1] + 0.75))])
    e = np.ones(n_terms)
    e[1:] = np.cumprod(((0.75 + n[:-1]) / (1.0 + n[:-1])) ** 2)
    P = C * e / (n + 1.0)
    Q = P * (2.0 * (psi1 - psi34) + 1.0 / (n + 1.0))
    return A, g, P, Q


_H2F1_A, _H2F1_G, _H2F1_P, _H2F1_Q = _hyp2f1_variogram_tables()


def hyp2f1_variogram(x):
    R"""Gauss hypergeometric :math:`{}_2F_1(3/4, 3/4; 1/2; x)` on [0, 1).

    The variogram fourth-root correlation kernel (reference
    helpers.py:643 reaches scipy's hyp2f1 for exactly this parameter
    triple).  All-shape f64-safe on the TPU backend — only elementwise
    polynomial arithmetic (Horner on host-precomputed f64 tables) and
    one ``log``, which is accurate at every shape here, so nothing
    falls through the backend's f32-accurate transcendental lowerings.
    1.8e-15 max relative error vs scipy across the domain; f32 inputs
    evaluate the same tables in f32.  Diverges as x -> 1 (pole 1/(1-x));
    callers clamp the argument below 1.
    """
    x = jnp.asarray(x)
    w = 1.0 - x
    direct = jnp.full_like(x, _H2F1_G[-1])
    for gn in _H2F1_G[-2::-1]:
        direct = direct * x + gn
    pP = jnp.full_like(w, _H2F1_P[-1])
    for pn in _H2F1_P[-2::-1]:
        pP = pP * w + pn
    pQ = jnp.full_like(w, _H2F1_Q[-1])
    for qn in _H2F1_Q[-2::-1]:
        pQ = pQ * w + qn
    # keep log's argument strictly positive on the unselected branch
    w_safe = jnp.where(w > 0, w, 1.0)
    near1 = _H2F1_A / w_safe + jnp.log(w_safe) * pP - pQ
    return jnp.where(x <= 0.5, direct, near1)
