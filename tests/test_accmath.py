"""Accurate scalar-shape f64 transcendentals (gsum_tpu._accmath).

exp64 exists because the TPU backend's native f64 exp is only
f32-accurate (~3.7e-8 relative) on 0-d/tiny-shape operands — the shape
every kernel's log-hyperparameter resolution uses — which floored every
f64 Gram matrix at ~2.7e-8 relative error.  These tests pin the CPU
behavior (exactness vs numpy across the full domain, gradients, kernel
round-trip); benchmarks/parity_diag_tpu.py guards the on-chip path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsum_tpu._accmath import exp64, hyp2f1_variogram


def test_exp64_matches_numpy_across_domain():
    x = np.concatenate([np.linspace(-700.0, 700.0, 4001),
                        [0.0, -0.5, 0.5, 1.0, -1e-12, 1e-12]])
    got = np.asarray(jax.jit(exp64)(jnp.asarray(x)))
    ref = np.exp(x)
    ok = ref > 0
    assert np.max(np.abs(got[ok] - ref[ok]) / ref[ok]) < 5e-16


def test_exp64_scalar_and_0d():
    for v in (-4.61, -0.51, 0.0, 0.731, 11.5):
        got = float(jax.jit(exp64)(jnp.float64(v)))
        assert got == pytest.approx(np.exp(v), rel=5e-16)


def test_exp64_grad_is_exp():
    for v in (-3.0, -0.2, 0.0, 0.4, 2.5):
        g = float(jax.grad(lambda t: exp64(t))(jnp.float64(v)))
        assert g == pytest.approx(np.exp(v), rel=1e-14)
    # vector-valued, summed
    g2 = float(jax.grad(lambda t: jnp.sum(exp64(jnp.stack([t, 2 * t]))))(
        jnp.float64(0.3)))
    assert g2 == pytest.approx(np.exp(0.3) + 2 * np.exp(0.6), rel=1e-14)


def test_exp64_f32_passthrough():
    x = jnp.asarray(np.float32(-1.25))
    got = float(exp64(x))
    assert got == pytest.approx(float(np.exp(np.float32(-1.25))), rel=1e-6)


def test_hyp2f1_variogram_vs_scipy():
    """The restricted-domain 2F1(3/4, 3/4; 1/2; x) series must match
    scipy to ~1e-13 across [0, 1) including deep into the x -> 1 pole
    (SURVEY §2b last row; VERDICT r4 #5 asked for exactly this)."""
    from scipy.special import hyp2f1 as scipy_hyp2f1

    x = np.concatenate([np.linspace(0.0, 0.999, 2001),
                        1.0 - np.logspace(-12, -3, 200),
                        [0.5, np.nextafter(0.5, 1.0), 0.25, 0.75]])
    got = np.asarray(jax.jit(hyp2f1_variogram)(jnp.asarray(x)))
    ref = scipy_hyp2f1(0.75, 0.75, 0.5, x)
    assert np.max(np.abs(got - ref) / np.abs(ref)) < 1e-13


def test_hyp2f1_variogram_scalar_f32_and_grad():
    from scipy.special import hyp2f1 as scipy_hyp2f1

    # 0-d f64
    assert float(hyp2f1_variogram(jnp.float64(0.8))) == pytest.approx(
        float(scipy_hyp2f1(0.75, 0.75, 0.5, 0.8)), rel=1e-13)
    # f32 evaluates the same tables at f32 accuracy
    got32 = float(hyp2f1_variogram(jnp.float32(0.3)))
    assert got32 == pytest.approx(
        float(scipy_hyp2f1(0.75, 0.75, 0.5, 0.3)), rel=1e-5)
    # differentiable on both branches (finite, matches central FD)
    for v in (0.2, 0.8):
        g = float(jax.grad(lambda t: hyp2f1_variogram(t))(jnp.float64(v)))
        h = 1e-7
        fd = (scipy_hyp2f1(0.75, 0.75, 0.5, v + h)
              - scipy_hyp2f1(0.75, 0.75, 0.5, v - h)) / (2 * h)
        assert g == pytest.approx(fd, rel=1e-6)


def test_kernel_resolve_uses_accurate_exp():
    """RBF Gram built through theta must match the host-exp Gram exactly
    at the f64 level (the kernel path goes through _resolve -> exp64)."""
    from gsum_tpu.kernels import RBF

    k = RBF(0.6, (1e-2, 1e2))
    X = np.linspace(0.0, 1.0, 9)[:, None]
    theta = np.log(np.array([0.6]))
    R = np.asarray(jax.jit(lambda t, Xa: k.value_fn(t, Xa, None))(
        jnp.asarray(theta), jnp.asarray(X)))
    d2 = np.sum((X[:, None, :] - X[None, :, :]) ** 2, axis=-1)
    ref = np.exp(-0.5 * d2 / 0.6 ** 2)
    assert np.max(np.abs(R - ref)) < 1e-14
