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


def test_cgp_lml_grid_general_priors():
    """The explicitly-batched lml handles multi-curve y, nonzero disp0,
    and a 2-column basis identically to the per-theta model path."""
    import gsum_tpu as gm
    from gsum_tpu.ops.gridlml import cgp_lml_grid

    X = np.linspace(0, 1, 14)[:, None]
    Y = np.stack([np.sin(3 * X[:, 0]), np.cos(2 * X[:, 0])], axis=1)
    basis = np.hstack([np.ones((14, 1)), X])
    center0 = np.array([0.1, -0.2])
    disp0 = np.array([[1.5, 0.2], [0.2, 0.8]])
    df0, scale0, nugget = 3.0, 1.1, 1e-8

    kernel = gm.RBF(0.5)
    thetas = np.log(np.linspace(0.25, 1.0, 5))[:, None]

    frozen = kernel.clone()
    Rs = jax.vmap(lambda th: frozen.value_fn(th, jnp.asarray(X), None))(
        jnp.asarray(thetas))
    Rs = Rs + nugget * jnp.eye(14)
    grid = np.asarray(cgp_lml_grid(Rs, jnp.asarray(Y), jnp.asarray(basis),
                                   center0, disp0, df0, scale0))

    gp = gm.ConjugateGaussianProcess(
        kernel=kernel, optimizer=None, center=center0, disp=disp0, df=df0,
        scale=scale0, nugget=nugget,
        basis=lambda Xa: jnp.hstack([jnp.ones((Xa.shape[0], 1)), Xa]))
    gp.fit(X, Y)
    loop = np.array([float(np.asarray(gp.log_marginal_likelihood(th)))
                     for th in thetas])
    np.testing.assert_allclose(grid, loop, rtol=1e-8)


def test_cgp_lml_grid_failed_cholesky_neg_inf():
    from gsum_tpu.ops.gridlml import cgp_lml_grid

    K = _spd_batch(3, 10)
    K[1] = -np.eye(10)  # not PSD
    y = rng.randn(10, 2)
    basis = np.ones((10, 1))
    out = np.asarray(cgp_lml_grid(jnp.asarray(K), jnp.asarray(y),
                                  jnp.asarray(basis), np.zeros(1),
                                  np.zeros((1, 1)), 3.0, 1.0))
    assert np.isfinite(out[0]) and np.isfinite(out[2])
    assert np.isneginf(out[1])


def test_batched_small_tri_inv():
    from gsum_tpu.ops.smallchol import batched_small_tri_inv

    for N in [8, 24, 80]:
        K = _spd_batch(4, N)
        L = np.linalg.cholesky(K)
        M = np.asarray(batched_small_tri_inv(jnp.asarray(L)))
        for g in range(4):
            np.testing.assert_allclose(M[g] @ L[g], np.eye(N), atol=1e-8)


def test_csp_lml_grid_matches_model():
    import gsum_tpu as gm
    from gsum_tpu.ops.gridlml import csp_lml_grid

    X = np.linspace(0, 1, 16)[:, None]
    Y = np.stack([np.sin(3 * X[:, 0]), np.cos(2 * X[:, 0])], axis=1)
    nugget = 1e-8

    for disp0 in [0.0, 1.3]:
        kernel = gm.RBF(0.5)
        thetas = np.log(np.linspace(0.25, 0.9, 5))[:, None]
        frozen = kernel.clone()
        Rs = jax.vmap(lambda th: frozen.value_fn(th, jnp.asarray(X), None))(
            jnp.asarray(thetas))
        Rs = Rs + nugget * jnp.eye(16)
        grid = np.asarray(csp_lml_grid(Rs, jnp.asarray(Y),
                                       jnp.ones((16, 1)), np.zeros(1),
                                       np.atleast_2d(disp0), 3.0, 1.2))

        gp = gm.ConjugateStudentProcess(kernel=kernel, optimizer=None,
                                        center=0, disp=disp0, df=3.0,
                                        scale=1.2, nugget=nugget)
        gp.fit(X, Y)
        loop = np.array([float(np.asarray(gp.log_marginal_likelihood(th)))
                         for th in thetas])
        np.testing.assert_allclose(grid, loop, rtol=1e-8,
                                   err_msg=f'disp0={disp0}')


def test_rbf_covariance_pallas_fallback():
    """On the CPU test backend the pallas wrapper falls back to the XLA
    implementation; values match the kernel-object path."""
    from gsum_tpu.ops import rbf_covariance_pallas

    X = rng.rand(24, 2)
    K = np.asarray(rbf_covariance_pallas(jnp.asarray(X), 0.5, 2.0, 0.1))
    K_ref = np.asarray(rbf_covariance(jnp.asarray(X), 0.5, 2.0, 0.1))
    np.testing.assert_allclose(K, K_ref, atol=1e-12)
    # batched
    Xb = rng.rand(3, 24, 2)
    Kb = np.asarray(rbf_covariance_pallas(jnp.asarray(Xb), 0.5, 2.0, 0.1))
    assert Kb.shape == (3, 24, 24)


def test_smallchol_custom_vjp_matches_builtin_grad():
    """Analytic Cholesky/tri-inv adjoints match autodiff through
    jnp.linalg.cholesky."""
    K = _spd_batch(3, 24)

    def f_ours(K):
        L = batched_small_cholesky(jnp.asarray(K))
        return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1))) \
            + jnp.sum(L ** 2) * 1e-3

    def f_ref(K):
        L = jnp.linalg.cholesky(jnp.asarray(K))
        return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1))) \
            + jnp.sum(L ** 2) * 1e-3

    g_ours = np.asarray(jax.grad(f_ours)(jnp.asarray(K)))
    g_ref = np.asarray(jax.grad(f_ref)(jnp.asarray(K)))
    np.testing.assert_allclose(g_ours, g_ref, atol=1e-9)

    from gsum_tpu.ops.smallchol import batched_small_tri_inv

    L0 = np.linalg.cholesky(K)

    def h_ours(L):
        return jnp.sum(batched_small_tri_inv(jnp.tril(L)) ** 2)

    def h_ref(L):
        n = L.shape[-1]
        eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
        from jax.lax.linalg import triangular_solve
        M = triangular_solve(jnp.tril(L), eye, left_side=True, lower=True)
        return jnp.sum(M ** 2)

    g_ours = np.asarray(jax.grad(h_ours)(jnp.asarray(L0)))
    g_ref = np.asarray(jax.grad(h_ref)(jnp.asarray(L0)))
    np.testing.assert_allclose(g_ours, g_ref, atol=1e-8)


def test_batched_grid_lml_failed_cholesky_neg_inf():
    """Non-PD K → -inf (library-wide convention), not NaN (ADVICE r1)."""
    import scipy.stats as st
    from gsum_tpu.ops.smallchol import batched_grid_lml

    K = _spd_batch(3, 12)
    K[1] = -np.eye(12)  # not PSD
    y = rng.randn(12, 2)
    out = np.asarray(batched_grid_lml(jnp.asarray(K), jnp.asarray(y)))
    assert np.isneginf(out[1])
    for g in (0, 2):
        want = sum(st.multivariate_normal(np.zeros(12), K[g]).logpdf(y[:, j])
                   for j in range(2))
        np.testing.assert_allclose(out[g], want, rtol=1e-8)
