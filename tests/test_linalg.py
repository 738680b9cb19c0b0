"""Linear-algebra primitives: pivoted Cholesky oracle, solves, whitening."""
import numpy as np
import pytest

from gsum_tpu import linalg

# Oracle factors: same values the reference tests use
# (reference tests/test.py:75-115, "taken from Tensorflow-Probability,
# which was taken from GPyTorch")
Ls = [
    np.array([
        [7., 0, 0, 0, 0, 0],
        [9, 13, 0, 0, 0, 0],
        [4, 10, 6, 0, 0, 0],
        [18, 1, 2, 14, 0, 0],
        [5, 11, 20, 3, 17, 0],
        [19, 12, 16, 15, 8, 21]]),
    np.array([[1, 0, 0], [2, 3, 0], [4, 5, 6.]]),
    np.array([[6, 0, 0], [3, 2, 0], [4, 1, 5.]]),
]
pchols = [
    np.array([
        [3.4444, -1.3545, 4.084, 1.7674, -1.1789, 3.7562],
        [8.4685, 1.2821, 3.1179, 12.9197, 0.0000, 0.0000],
        [7.5621, 4.8603, 0.0634, 7.3942, 4.0637, 0.0000],
        [15.435, -4.8864, 16.2137, 0.0000, 0.0000, 0.0000],
        [18.8535, 22.103, 0.0000, 0.0000, 0.0000, 0.0000],
        [38.6135, 0.0000, 0.0000, 0.0000, 0.0000, 0.0000]]),
    np.array([[0.4558, 0.3252, 0.8285],
              [2.6211, 2.4759, 0.0000],
              [8.7750, 0.0000, 0.0000]]),
    np.array([[3.7033, 4.7208, 0.0000],
              [2.1602, 2.1183, 1.9612],
              [6.4807, 0.0000, 0.0000]]),
]


@pytest.mark.parametrize('L,pchol', zip(Ls, pchols), ids=['6x6', '3x3a', '3x3b'])
def test_pivoted_cholesky_oracle(L, pchol):
    mat = L @ L.T
    np.testing.assert_allclose(pchol, np.asarray(linalg.pivoted_cholesky(mat)),
                               atol=1e-4)


def test_pivoted_cholesky_vs_lapack():
    from scipy.linalg.lapack import dpstrf

    rng = np.random.RandomState(3)
    for n in [5, 12, 30]:
        A = rng.randn(n, n)
        M = A @ A.T
        G = np.asarray(linalg.pivoted_cholesky(M))
        np.testing.assert_allclose(G @ G.T, M, atol=1e-10)
        # same factor as LAPACK dpstrf after inverse permutation
        c, piv, rank, info = dpstrf(M, lower=True)
        Lp = np.tril(c)
        G_ref = Lp[np.argsort(piv - 1)]
        np.testing.assert_allclose(G, G_ref, atol=1e-8)


def test_pivoted_cholesky_rank_deficient():
    rng = np.random.RandomState(0)
    A = rng.randn(8, 3)
    M = A @ A.T
    G, piv, rank = linalg.pivoted_cholesky(M, return_pivots=True)
    assert int(rank) == 3
    np.testing.assert_allclose(np.asarray(G) @ np.asarray(G).T, M, atol=1e-10)


def test_safe_cholesky_flags():
    good = np.eye(4) * 2.0
    L, ok = linalg.safe_cholesky(good)
    assert bool(ok)
    bad = np.eye(4)
    bad[0, 0] = -1.0
    L, ok = linalg.safe_cholesky(bad)
    assert not bool(ok)


def test_solve_sqrt_paths():
    rng = np.random.RandomState(1)
    A = rng.randn(6, 6)
    M = A @ A.T + 6 * np.eye(6)
    b = rng.randn(6, 2)
    x_ref = np.linalg.solve(M, b)

    L = np.linalg.cholesky(M)
    np.testing.assert_allclose(
        np.asarray(linalg.solve_sqrt(L, b, 'cholesky')), x_ref, atol=1e-10)

    eig, Q = np.linalg.eigh(M)
    np.testing.assert_allclose(
        np.asarray(linalg.solve_sqrt((eig, Q), b, 'eig')), x_ref, atol=1e-10)

    S = Q @ np.diag(np.sqrt(eig))
    np.testing.assert_allclose(
        np.asarray(linalg.solve_sqrt(S, b, 'eig')), x_ref, atol=1e-10)


def test_logdet_sqrt():
    rng = np.random.RandomState(2)
    A = rng.randn(5, 5)
    M = A @ A.T + 5 * np.eye(5)
    ref = np.linalg.slogdet(M)[1]
    L = np.linalg.cholesky(M)
    np.testing.assert_allclose(float(linalg.logdet_sqrt(L, 'cholesky')), ref,
                               atol=1e-10)
    eig, Q = np.linalg.eigh(M)
    np.testing.assert_allclose(float(linalg.logdet_sqrt((eig, Q), 'eig')), ref,
                               atol=1e-10)


def test_cholesky_errors_and_mahalanobis():
    import scipy.linalg as sla

    rng = np.random.RandomState(4)
    A = rng.randn(5, 5)
    M = A @ A.T + 5 * np.eye(5)
    chol = np.linalg.cholesky(M)
    y = rng.randn(3, 5)
    mean = rng.randn(5)

    ref = sla.solve_triangular(chol, (y - mean).T, lower=True).T
    np.testing.assert_allclose(np.asarray(linalg.cholesky_errors(y, mean, chol)),
                               ref, atol=1e-10)

    md_ref = np.linalg.norm(ref, axis=-1)
    np.testing.assert_allclose(np.asarray(linalg.mahalanobis(y, mean, chol=chol)),
                               md_ref, atol=1e-10)
    inv = np.linalg.inv(M)
    np.testing.assert_allclose(np.asarray(linalg.mahalanobis(y, mean, inv=inv)),
                               md_ref, atol=1e-8)
    with pytest.raises(ValueError):
        linalg.mahalanobis(y, mean, chol=chol, inv=inv)


def test_stabilize():
    M = np.zeros((3, 3))
    out = np.asarray(linalg.stabilize(M))
    np.testing.assert_allclose(out, 1e-5 * np.eye(3))


def test_general_solve_and_sqrt_paths_no_lu():
    """solve_sqrt's dense-S branch, mahalanobis(sqrt_mat=...), and
    helpers.general_sqrt_errors must not go through jnp.linalg.solve —
    it has no f64 LU lowering on the target TPU.  The normal-equations
    route must agree with the dense solve (exact here: CPU has LU)."""
    import gsum_tpu.helpers as gh

    rng = np.random.RandomState(5)
    A = rng.randn(6, 6)
    M = A @ A.T + 6 * np.eye(6)
    # a general (non-triangular) square root of M: S = Q sqrt(L) Q^T
    w, Q = np.linalg.eigh(M)
    S = Q @ np.diag(np.sqrt(w)) @ Q.T
    y = rng.randn(6)
    Y = rng.randn(6, 3)

    np.testing.assert_allclose(np.asarray(linalg.general_solve(S, y)),
                               np.linalg.solve(S, y), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(linalg.general_solve(S, Y)),
                               np.linalg.solve(S, Y), rtol=1e-9)
    # solve_sqrt 'eig' with a dense square root: M x = y
    np.testing.assert_allclose(np.asarray(linalg.solve_sqrt(S, Y, 'eig')),
                               np.linalg.solve(M, Y), rtol=1e-9)
    # mahalanobis via the general sqrt equals the chol route
    mean = rng.randn(6)
    d_chol = np.asarray(linalg.mahalanobis(y, mean,
                                           chol=np.linalg.cholesky(M)))
    d_gen = np.asarray(linalg.mahalanobis(y, mean, sqrt_mat=S))
    np.testing.assert_allclose(d_gen, d_chol, rtol=1e-9)
    # the whitened-residual vector helper
    err = np.asarray(gh.general_sqrt_errors(y, mean, S))
    np.testing.assert_allclose(err, np.linalg.solve(S, y - mean),
                               rtol=1e-9)
