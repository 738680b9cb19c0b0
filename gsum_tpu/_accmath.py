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

import jax.numpy as jnp

__all__ = ['exp64']

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
