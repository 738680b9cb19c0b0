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


def test_blocked_cholesky_matches_dense():
    """Left-looking blocked factorization == jnp.linalg.cholesky to
    round-off, including non-multiple-of-block sizes (identity padding)."""
    from gsum_tpu.ops.blockchol import batched_blocked_cholesky

    for B, N, blk in [(3, 300, 128), (2, 512, 128), (1, 700, 256)]:
        A = rng.randn(B, N, N)
        K = A @ np.swapaxes(A, -1, -2) + N * np.eye(N)
        L = np.asarray(batched_blocked_cholesky(jnp.asarray(K), block=blk))
        Lref = np.linalg.cholesky(K)
        np.testing.assert_allclose(L, Lref, atol=1e-8 * np.abs(Lref).max())


def test_blocked_cholesky_hier_diag():
    """The hierarchical diagonal engine (recursive 2x2 split to 128-wide
    base factorizations with the [[M1,0],[-M2 L21 M1, M2]] composed
    inverse) is exact vs dense on the factor AND on the solve path that
    consumes the composed inverses — including a non-power-of-two block
    and identity padding."""
    from gsum_tpu.ops.blockchol import (batched_blocked_cholesky,
                                        blocked_chol_solve_logdet)

    for B, N, blk in [(2, 512, 256), (2, 700, 384), (1, 1024, 512)]:
        A = rng.randn(B, N, N)
        K = A @ np.swapaxes(A, -1, -2) + N * np.eye(N)
        L = np.asarray(batched_blocked_cholesky(jnp.asarray(K), block=blk,
                                                diag='hier'))
        Lref = np.linalg.cholesky(K)
        np.testing.assert_allclose(L, Lref, atol=1e-8 * np.abs(Lref).max())

        Y = rng.randn(B, N, 3)
        w, logdet = blocked_chol_solve_logdet(
            jnp.asarray(K), jnp.asarray(Y), block=blk, diag='hier')
        import scipy.linalg as sla

        for b in range(B):
            want = sla.solve_triangular(Lref[b], Y[b], lower=True)
            np.testing.assert_allclose(np.asarray(w)[b], want, atol=1e-8)
        np.testing.assert_allclose(np.asarray(logdet),
                                   np.linalg.slogdet(K)[1], rtol=1e-10)


def test_blocked_chol_solve_logdet():
    """Fused factor+solve+logdet matches dense linear algebra."""
    from gsum_tpu.ops.blockchol import blocked_chol_solve_logdet

    B, N, m = 2, 384, 5
    A = rng.randn(B, N, N)
    K = A @ np.swapaxes(A, -1, -2) + N * np.eye(N)
    Y = rng.randn(B, N, m)
    w, logdet = blocked_chol_solve_logdet(jnp.asarray(K), jnp.asarray(Y),
                                          block=128)
    Lref = np.linalg.cholesky(K)
    import scipy.linalg as sla

    for b in range(B):
        want = sla.solve_triangular(Lref[b], Y[b], lower=True)
        np.testing.assert_allclose(np.asarray(w)[b], want, atol=1e-8)
    np.testing.assert_allclose(np.asarray(logdet),
                               np.linalg.slogdet(K)[1], rtol=1e-10)


def test_blocked_cholesky_grad():
    """Custom VJP (analytic Cholesky adjoint) matches XLA's gradient."""
    from gsum_tpu.ops.blockchol import batched_blocked_cholesky

    B, N = 2, 160
    A = rng.randn(B, N, N)
    K = A @ np.swapaxes(A, -1, -2) + N * np.eye(N)

    def f_blocked(k):
        L = batched_blocked_cholesky(k, 64)
        return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

    def f_dense(k):
        L = jnp.linalg.cholesky(k)
        return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

    import jax

    g1 = np.asarray(jax.grad(f_blocked)(jnp.asarray(K)))
    g2 = np.asarray(jax.grad(f_dense)(jnp.asarray(K)))
    np.testing.assert_allclose(g1, g2, atol=1e-10 * np.abs(g2).max())


def test_pallas_chol_inv_interpret():
    """The Pallas diagonal-block kernel (factor + inverse) in interpreter
    mode: semantics check without TPU hardware."""
    from gsum_tpu.ops.pallas_chol import chol_inv_block

    B, nb = 3, 64
    A = rng.randn(B, nb, nb).astype(np.float32)
    K = (A @ np.swapaxes(A, -1, -2) / nb + np.eye(nb)).astype(np.float32)
    L, M = chol_inv_block(jnp.asarray(K), chunk=2, panel=32, interpret=True)
    L, M = np.asarray(L), np.asarray(M)
    Lref = np.linalg.cholesky(K.astype(np.float64))
    assert np.abs(L - Lref).max() < 1e-5 * np.abs(Lref).max()
    resid = np.einsum('bij,bjk->bik', L.astype(np.float64),
                      M.astype(np.float64)) - np.eye(nb)
    assert np.abs(resid).max() < 1e-5


def test_batched_chol_logpdf_blocked_matches_xla():
    """The fused pipeline's 'blocked' engine equals the 'xla' engine."""
    from gsum_tpu.ops import batched_chol_logpdf

    B, N, d, m = 2, 640, 2, 3
    X = jnp.asarray(rng.rand(B, N, d))
    y = jnp.asarray(rng.randn(B, N, m))
    out_b = np.asarray(batched_chol_logpdf(X, y, 0.25, 1.0, 1e-2,
                                           method='blocked'))
    out_x = np.asarray(batched_chol_logpdf(X, y, 0.25, 1.0, 1e-2,
                                           method='xla'))
    np.testing.assert_allclose(out_b, out_x, rtol=1e-8)


def test_fused_chol_interpret():
    """The single-kernel HBM-resident factorization (ops.fusedchol) in
    interpreter mode: factor, diagonal-block inverses, fused solve+logdet
    all match dense references."""
    import scipy.linalg as sla

    from gsum_tpu.ops.fusedchol import (fused_blocked_cholesky,
                                        fused_chol_solve_logdet)

    rng = np.random.RandomState(11)
    B, N, blk = 3, 256, 64
    A = rng.randn(B, N, N).astype(np.float32)
    K = A @ A.transpose(0, 2, 1) + N * np.eye(N, dtype=np.float32)
    L, minvs = fused_blocked_cholesky(jnp.asarray(K), block=blk, chunk=2,
                                      panel=32, tril=True, interpret=True)
    Lr = np.linalg.cholesky(K)
    assert np.abs(np.asarray(L) - Lr).max() / np.abs(Lr).max() < 1e-5
    # diagonal-block inverses really invert the diagonal blocks
    for k in range(N // blk):
        s = k * blk
        blkL = Lr[:, s:s + blk, s:s + blk]
        prod = np.einsum('bij,bjk->bik', blkL, np.asarray(minvs)[:, k])
        assert np.abs(prod - np.eye(blk)).max() < 1e-5

    Y = rng.randn(B, N, 4).astype(np.float32)
    w, ld = fused_chol_solve_logdet(jnp.asarray(K), jnp.asarray(Y),
                                    block=blk, chunk=2, panel=32,
                                    interpret=True)
    w_r = np.stack([sla.solve_triangular(Lr[i], Y[i], lower=True)
                    for i in range(B)])
    assert np.abs(np.asarray(w) - w_r).max() < 1e-5
    ld_r = 2 * np.sum(np.log(np.diagonal(Lr, axis1=1, axis2=2)), axis=1)
    assert np.abs(np.asarray(ld) - ld_r).max() < 1e-2  # f32 logdet ~1e3


def test_batched_chol_logpdf_forwards_block():
    """An explicit block must reach the selected engine (the fused branch
    used to drop it and fail on N not a multiple of ITS default)."""
    rng = np.random.RandomState(11)
    X = jnp.asarray(rng.rand(2, 192, 2), dtype=jnp.float32)
    y = jnp.asarray(rng.randn(2, 192, 1), dtype=jnp.float32)
    out_b = np.asarray(batched_chol_logpdf(X, y, 0.25, 1.0, 1e-2,
                                           method='blocked', block=96))
    out_x = np.asarray(batched_chol_logpdf(X, y, 0.25, 1.0, 1e-2,
                                           method='xla'))
    np.testing.assert_allclose(out_b, out_x, rtol=2e-4)
