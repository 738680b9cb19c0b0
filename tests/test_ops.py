"""Performance-core ops validated against the correctness path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsum_tpu.ops import (
    batched_chol_logpdf,
    batched_grid_lml,
    batched_small_cholesky,
    batched_small_solve_triangular,
    rbf_covariance,
)

rng = np.random.RandomState(0)


def _spd_batch(G, N, dtype=np.float64):
    A = rng.randn(G, N, N).astype(dtype)
    return np.einsum('gij,gkj->gik', A, A) / N + 2 * np.eye(N, dtype=dtype)


def test_rbf_covariance_matches_kernels():
    import gsum_tpu as gm

    X = rng.rand(20, 2)
    K_ops = np.asarray(rbf_covariance(jnp.asarray(X), 0.7, 2.0, 0.1))
    kernel = 2.0 * gm.RBF(0.7) + gm.WhiteKernel(0.1)
    K_ref = np.asarray(kernel(X))
    np.testing.assert_allclose(K_ops, K_ref, atol=1e-10)


@pytest.mark.parametrize('N', [8, 24, 64, 130])
def test_batched_small_cholesky(N):
    K = _spd_batch(7, N)
    L = np.asarray(batched_small_cholesky(jnp.asarray(K)))
    L_ref = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, L_ref, atol=1e-9)


@pytest.mark.parametrize('N', [8, 24, 64])
def test_batched_small_solve(N):
    K = _spd_batch(5, N)
    L = np.linalg.cholesky(K)
    B = rng.randn(5, N, 3)
    X = np.asarray(batched_small_solve_triangular(jnp.asarray(L),
                                                  jnp.asarray(B)))
    X_ref = np.stack([np.linalg.solve(np.tril(Li), Bi)
                      for Li, Bi in zip(L, B)])
    np.testing.assert_allclose(X, X_ref, atol=1e-9)


def test_batched_grid_lml_matches_scipy():
    import scipy.stats as st

    G, N, m = 6, 30, 2
    K = _spd_batch(G, N)
    y = rng.randn(N, m)
    ours = np.asarray(batched_grid_lml(jnp.asarray(K), jnp.asarray(y)))
    ref = np.array([
        sum(st.multivariate_normal(mean=np.zeros(N), cov=K[g]).logpdf(y[:, j])
            for j in range(m))
        for g in range(G)])
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_batched_chol_logpdf_matches_scipy():
    import scipy.stats as st

    B, N, d, m = 3, 16, 2, 2
    X = rng.rand(B, N, d)
    y = rng.randn(B, N, m)
    out = np.asarray(batched_chol_logpdf(jnp.asarray(X), jnp.asarray(y),
                                         0.5, 1.0, 0.1))
    for b in range(B):
        K = np.asarray(rbf_covariance(jnp.asarray(X[b]), 0.5, 1.0, 0.1))
        for j in range(m):
            ref = st.multivariate_normal(mean=np.zeros(N), cov=K).logpdf(y[b, :, j])
            np.testing.assert_allclose(out[b, j], ref, rtol=1e-8)


def test_grid_lml_fast_path_matches_model():
    """parallel.batched_lml_grid (batch-vectorized Cholesky path) agrees
    with the per-theta model evaluation."""
    import gsum_tpu as gm
    from gsum_tpu.parallel import batched_lml_grid

    X = np.linspace(0, 1, 20)[:, None]
    y = np.sin(3 * X[:, 0])
    kernel = gm.RBF(0.5)
    thetas = np.log(np.linspace(0.2, 1.5, 9))[:, None]
    grid = np.asarray(batched_lml_grid(kernel, X, y, thetas, df=3, scale=1.0))

    gp = gm.ConjugateGaussianProcess(kernel=kernel, optimizer=None, df=3,
                                     scale=1.0)
    gp.fit(X, y)
    loop = np.array([float(np.asarray(gp.log_marginal_likelihood(th)))
                     for th in thetas])
    # long-length-scale grid points are ill-conditioned; recursive vs
    # builtin factorization order differs at the cond(R)*eps level
    np.testing.assert_allclose(grid, loop, rtol=1e-6)
